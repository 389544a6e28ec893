"""NN primitive parity vs torch (conv/bn/pool/upsample/adaptive pool)."""

import functools

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from iris_style_transfer_tpu.models import layers as L


def _to_nhwc(t):
    return np.transpose(t, (0, 2, 3, 1))


def _to_nchw(a):
    return np.transpose(a, (0, 3, 1, 2))


@pytest.mark.parametrize("k,stride,pad", [(3, 1, 1), (1, 1, 0), (3, 2, 1), (7, 2, 3)])
def test_conv2d_matches_torch(k, stride, pad):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 16, 5)).astype(np.float32)
    w = rng.standard_normal((k, k, 5, 7)).astype(np.float32) * 0.1
    b = rng.standard_normal(7).astype(np.float32)
    # highest precision isolates layout/padding correctness from the
    # backend's default (TPU-style bf16-pass) matmul precision
    with jax.default_matmul_precision("highest"):
        got = np.asarray(L.conv2d(jnp.asarray(x), {"w": jnp.asarray(w), "b": jnp.asarray(b)}, stride=stride, padding=pad))
    tw = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)))  # HWIO -> OIHW
    want = torch.nn.functional.conv2d(
        torch.from_numpy(_to_nchw(x)), tw, torch.from_numpy(b), stride=stride, padding=pad
    ).numpy()
    np.testing.assert_allclose(got, _to_nhwc(want), rtol=1e-4, atol=1e-4)


def test_batchnorm_eval_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 8, 8, 6)).astype(np.float32)
    p = {
        "scale": rng.standard_normal(6).astype(np.float32),
        "bias": rng.standard_normal(6).astype(np.float32),
        "mean": rng.standard_normal(6).astype(np.float32),
        "var": rng.random(6).astype(np.float32) + 0.5,
    }
    got = np.asarray(L.batchnorm(jnp.asarray(x), jax.tree.map(jnp.asarray, p)))
    bn = torch.nn.BatchNorm2d(6).eval()
    bn.weight.data = torch.from_numpy(p["scale"])
    bn.bias.data = torch.from_numpy(p["bias"])
    bn.running_mean.data = torch.from_numpy(p["mean"])
    bn.running_var.data = torch.from_numpy(p["var"])
    want = bn(torch.from_numpy(_to_nchw(x))).detach().numpy()
    np.testing.assert_allclose(got, _to_nhwc(want), rtol=1e-4, atol=1e-4)


def test_pools_match_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    got = np.asarray(L.max_pool(jnp.asarray(x), 2, 2))
    want = torch.nn.functional.max_pool2d(torch.from_numpy(_to_nchw(x)), 2).numpy()
    np.testing.assert_allclose(got, _to_nhwc(want), atol=1e-6)
    got = np.asarray(L.avg_pool(jnp.asarray(x), 2, 2))
    want = torch.nn.functional.avg_pool2d(torch.from_numpy(_to_nchw(x)), 2).numpy()
    np.testing.assert_allclose(got, _to_nhwc(want), atol=1e-6)


def test_max_pool_relu_composite_grad_matches_torch():
    """grad of pool(relu(x)) must match torch exactly — this is how every
    max_pool on a gradient path is used in the framework (VGG).  The
    custom VJP's full-cotangent-to-ties residual trick is exact here:
    tied-at-zero windows (the common case, relu-dead regions) are killed
    by the upstream relu mask, and nonzero f32 maxima are unique for
    generic inputs."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    ct = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)

    f = lambda a: L.max_pool(jax.nn.relu(a), 2, 2)
    y_got, vjp_got = jax.vjp(f, jnp.asarray(x))
    g_got = vjp_got(jnp.asarray(ct))[0]

    xt = torch.from_numpy(_to_nchw(x)).requires_grad_(True)
    yt = torch.nn.functional.max_pool2d(torch.relu(xt), 2)
    yt.backward(torch.from_numpy(_to_nchw(ct)))
    np.testing.assert_allclose(
        np.asarray(y_got), _to_nhwc(yt.detach().numpy()), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(g_got), _to_nhwc(xt.grad.numpy()), atol=1e-6
    )


def test_max_pool_vjp_bf16_unique_max_matches_torch():
    """bf16 path with engineered unique-per-window values (exact in bf16):
    grad must route the full cotangent to the single argmax, like torch."""
    rng = np.random.default_rng(9)
    vals = rng.permuted(
        np.tile(np.arange(1.0, 37.0, dtype=np.float32), (2, 1)), axis=-1
    ).reshape(2, 6, 6, 1)
    xb = jnp.asarray(vals, jnp.bfloat16)
    ct = rng.standard_normal((2, 3, 3, 1)).astype(np.float32)

    y_got, vjp_got = jax.vjp(lambda a: L.max_pool(a, 2, 2), xb)
    g_got = np.asarray(vjp_got(jnp.asarray(ct, jnp.bfloat16))[0], np.float32)

    xt = torch.from_numpy(_to_nchw(vals)).bfloat16().requires_grad_(True)
    yt = torch.nn.functional.max_pool2d(xt, 2)
    yt.backward(torch.from_numpy(_to_nchw(ct)).bfloat16())
    np.testing.assert_allclose(
        np.asarray(y_got, np.float32), _to_nhwc(yt.detach().float().numpy()), atol=0
    )
    np.testing.assert_allclose(g_got, _to_nhwc(xt.grad.float().numpy()), atol=1e-6)


def test_max_pool_vjp_tie_semantics_documented():
    """At exact nonzero ties the custom VJP sends the FULL cotangent to
    every max-achieving element (documented deviation from torch's one
    winner / jnp.max's even split, layers.py:_max_pool_nonoverlap_fwd;
    measured <1e-6 relative effect on the NST trajectory, BASELINE.md)."""
    x = jnp.asarray(
        np.array([[2.0, 2.0], [1.0, 2.0]], np.float32).reshape(1, 2, 2, 1)
    )
    _, vjp = jax.vjp(lambda a: L.max_pool(a, 2, 2), x)
    g = np.asarray(vjp(jnp.ones((1, 1, 1, 1)))[0]).reshape(2, 2)
    np.testing.assert_allclose(g, np.array([[1.0, 1.0], [0.0, 1.0]]))


def test_max_pool_vjp_under_vmap_and_odd_window():
    rng = np.random.default_rng(8)
    x = rng.standard_normal((3, 2, 12, 12, 2)).astype(np.float32)
    f = lambda a: jnp.sum(L.max_pool(a, 3, 3) ** 2)
    got = jax.vmap(jax.grad(f))(jnp.asarray(x))
    want = np.stack([np.asarray(jax.grad(f)(jnp.asarray(xi))) for xi in x])
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_upsample_nearest_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 5, 7, 2)).astype(np.float32)
    got = np.asarray(L.upsample_nearest(jnp.asarray(x), 2))
    want = torch.nn.functional.interpolate(
        torch.from_numpy(_to_nchw(x)), scale_factor=2, mode="nearest"
    ).numpy()
    np.testing.assert_allclose(got, _to_nhwc(want), atol=1e-6)


@pytest.mark.parametrize("hw", [(14, 14), (7, 7), (10, 13)])
def test_adaptive_avg_pool_matches_torch(hw):
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, *hw, 4)).astype(np.float32)
    with jax.default_matmul_precision("highest"):
        got = np.asarray(L.adaptive_avg_pool(jnp.asarray(x), (7, 7)))
    want = torch.nn.functional.adaptive_avg_pool2d(torch.from_numpy(_to_nchw(x)), (7, 7)).numpy()
    np.testing.assert_allclose(got, _to_nhwc(want), rtol=1e-4, atol=1e-5)


def test_linear_matches_torch():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((4, 10)).astype(np.float32)
    w = rng.standard_normal((10, 6)).astype(np.float32)
    b = rng.standard_normal(6).astype(np.float32)
    with jax.default_matmul_precision("highest"):
        got = np.asarray(L.linear(jnp.asarray(x), {"w": jnp.asarray(w), "b": jnp.asarray(b)}))
    want = torch.nn.functional.linear(
        torch.from_numpy(x), torch.from_numpy(w.T), torch.from_numpy(b)
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_leaky_relu_matches_torch():
    x = np.linspace(-2, 2, 11).astype(np.float32)
    got = np.asarray(L.leaky_relu(jnp.asarray(x)))
    want = torch.nn.functional.leaky_relu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_conv2d_mxu_dx_matches_conv2d_grads():
    """The MXU-reassociated first-layer conv (layers._conv_small_cin) must
    equal the plain conv in value AND in both gradients — it exists purely
    to dodge XLA's VPU lowering of the C_in=3 transposed conv, which was
    22% of the 512px NST closure (tools/perf_probe9.py)."""
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 12, 12, 3)).astype(np.float32))
    p = {
        "w": jnp.asarray(rng.standard_normal((3, 3, 3, 8)).astype(np.float32) * 0.1),
        "b": jnp.asarray(rng.standard_normal(8).astype(np.float32)),
    }

    with jax.default_matmul_precision("highest"):
        got = np.asarray(L.conv2d_mxu_dx(x, p))
        want = np.asarray(L.conv2d(x, p, stride=1, padding=1))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

        def f_ref(x, w):
            return jnp.sum(jnp.sin(L.conv2d(x, {"w": w, "b": p["b"]}, stride=1, padding=1)))

        def f_new(x, w):
            return jnp.sum(jnp.sin(L._conv_small_cin(x, w) + p["b"]))

        dx1, dw1 = jax.grad(f_ref, argnums=(0, 1))(x, p["w"])
        dx2, dw2 = jax.grad(f_new, argnums=(0, 1))(x, p["w"])
    np.testing.assert_allclose(np.asarray(dx2), np.asarray(dx1), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw2), np.asarray(dw1), rtol=1e-4, atol=1e-5)


def test_relu_max_pool_matches_composed():
    """Flag-gated fused relu+pool (layers.relu_max_pool, default off —
    measured neutral, see BASELINE.md) must stay value- and
    gradient-identical to max_pool(relu(x)) including tie handling."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    # force exact window ties to exercise the tie-to-all semantics
    x = x.at[0, 0, 0, 0].set(x[0, 0, 1, 0])

    def f_fused(x):
        return jnp.sum(jnp.sin(L.relu_max_pool(x, 2)))

    def f_comp(x):
        return jnp.sum(jnp.sin(L.max_pool(jax.nn.relu(x), 2, 2)))

    v1, g1 = jax.value_and_grad(f_fused)(x)
    v2, g2 = jax.value_and_grad(f_comp)(x)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def test_pallas_relu_pool_bwd_matches_jnp():
    """The Pallas relu+pool backward (ops/pallas_pool.py, interpret mode
    here) must reproduce the jnp 6-d windowed-select gradient exactly,
    including relu gating and tie-to-all pool semantics."""
    from iris_style_transfer_tpu.ops import pallas_pool

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((4, 16, 16, 32)).astype(np.float32))
    x = x.at[1, 2, 2, 3].set(x[1, 2, 3, 3])  # exact window tie
    x = x.astype(jnp.bfloat16)
    y = L.max_pool(jax.nn.relu(x), 2, 2)
    ct = jnp.asarray(rng.standard_normal((4, 8, 8, 32)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    x6 = x.reshape(4, 8, 2, 8, 2, 32)
    keep = (x6 > 0) & (x6 == y[:, :, None, :, None, :])
    want = jnp.where(
        keep, ct[:, :, None, :, None, :], jnp.zeros((), ct.dtype)
    ).reshape(4, 16, 16, 32)
    got = pallas_pool.relu_pool_bwd(x, y, ct, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got.astype(jnp.float32)), np.asarray(want.astype(jnp.float32))
    )


def test_conv_reassoc_fwd_matches_conv2d():
    """probe15 candidate A: the tap-gather + one-matmul small-C_in conv
    (layers._conv_small_cin_reassoc) must equal the plain conv in value
    and, through plain autodiff, in both gradients."""
    rng = np.random.default_rng(15)
    x = jnp.asarray(rng.standard_normal((2, 12, 12, 3)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 8)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(8).astype(np.float32))

    with jax.default_matmul_precision("highest"):
        got = np.asarray(L._conv_small_cin_reassoc(x, w) + b)
        want = np.asarray(L.conv2d(x, {"w": w, "b": b}, stride=1, padding=1))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

        def f_ref(x, w):
            return jnp.sum(jnp.sin(L.conv2d(x, {"w": w, "b": b}, stride=1, padding=1)))

        def f_new(x, w):
            return jnp.sum(jnp.sin(L._conv_small_cin_reassoc(x, w) + b))

        dx1, dw1 = jax.grad(f_ref, argnums=(0, 1))(x, w)
        dx2, dw2 = jax.grad(f_new, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dx2), np.asarray(dx1), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw2), np.asarray(dw1), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("k,c", [(3, 256), (5, 64)])
def test_pallas_depthwise_matches_xla(k, c):
    """The fused depthwise+BN+SiLU Pallas kernel (ops/pallas_depthwise.py,
    interpret mode here — manual halo DMA included) must match the XLA
    composition: grouped conv, eval batchnorm affine, SiLU."""
    from iris_style_transfer_tpu.ops import pallas_depthwise as pdw

    rng = np.random.default_rng(18)
    x = jnp.asarray(rng.standard_normal((2, 16, 20, c)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    w = jnp.asarray(
        (rng.standard_normal((k, k, 1, c)) * 0.2).astype(np.float32)
    ).astype(jnp.bfloat16)
    a = jnp.asarray(rng.uniform(0.5, 2.0, c).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(c).astype(np.float32))

    p = (k - 1) // 2
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    ).astype(jnp.float32)
    want = want * a + b
    want = (want * jax.nn.sigmoid(want)).astype(x.dtype)

    got = pdw.dw_conv_bn_silu(x, w, a, b, k, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got.astype(jnp.float32)),
        np.asarray(want.astype(jnp.float32)),
        rtol=0.05,
        atol=0.05,
    )


def _relu_stats_composed(x):
    y = jax.nn.relu(x)
    yf = y.astype(jnp.float32)
    return y, jnp.sum(yf, axis=(1, 2)), jnp.sum(yf * yf, axis=(1, 2))


def test_relu_stats_matches_composed_value_and_grad():
    """probe15 candidate B: the fused relu+stats tap op must equal the
    composed relu + sum/sumsq expression in all three outputs and in the
    gradient of a loss that touches all three."""
    rng = np.random.default_rng(16)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))

    y1, a1, b1 = L.relu_stats(x)
    y2, a2, b2 = _relu_stats_composed(x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), rtol=1e-6)

    def loss(fn, x):
        y, s1, s2 = fn(x)
        return jnp.sum(jnp.sin(y)) + jnp.sum(s1 * 0.3) + jnp.sum(jnp.sqrt(s2 + 1.0))

    g1 = jax.grad(functools.partial(loss, L.relu_stats))(x)
    g2 = jax.grad(functools.partial(loss, _relu_stats_composed))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-6)


def test_pallas_relu_stats_matches_composed():
    """The Pallas lane-full relu+stats kernels (ops/pallas_relu_stats.py,
    interpret mode here) must reproduce the composed expression: forward
    (y, s1, s2) and the backward dx under all three cotangents."""
    from iris_style_transfer_tpu.ops import pallas_relu_stats as prs

    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.standard_normal((4, 16, 16, 32)).astype(np.float32)).astype(
        jnp.bfloat16
    )

    y, s1, s2 = prs.relu_stats_fwd(x, interpret=True)
    yw, s1w, s2w = _relu_stats_composed(x)
    np.testing.assert_array_equal(
        np.asarray(y.astype(jnp.float32)), np.asarray(yw.astype(jnp.float32))
    )
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s1w), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s2w), rtol=1e-3)

    ct_y = jnp.asarray(rng.standard_normal(x.shape).astype(np.float32)).astype(
        jnp.bfloat16
    )
    ct_s1 = jnp.asarray(rng.standard_normal(s1.shape).astype(np.float32))
    ct_s2 = jnp.asarray(rng.standard_normal(s2.shape).astype(np.float32))
    got = prs.relu_stats_bwd(x, ct_y, ct_s1, ct_s2, interpret=True)

    xf = x.astype(jnp.float32)
    want = (
        ct_y.astype(jnp.float32)
        + ct_s1[:, None, None, :]
        + 2.0 * xf * ct_s2[:, None, None, :]
    )
    want = jnp.where(x > 0, want, 0.0).astype(x.dtype)
    np.testing.assert_allclose(
        np.asarray(got.astype(jnp.float32)),
        np.asarray(want.astype(jnp.float32)),
        rtol=1e-2,
        atol=1e-2,
    )


def test_max_pool_strided_bitwise_matches_6d_form():
    """The strided-slice 2x2 pool (layers._max_pool2_strided — a flag-gated
    alternative measured and REJECTED on-chip, POOL_STRIDED=False; see the
    layers.POOL_STRIDED block comment and tools/perf_probe24.py) must be
    BIT-identical to the default reshape-to-6D form in fwd and bwd,
    including the full-cotangent-to-ties semantics, in f32 and bf16."""
    rng = np.random.default_rng(24)
    x = rng.standard_normal((3, 8, 12, 5)).astype(np.float32)
    x[0, 0, 0, 0] = x[0, 1, 1, 0] = 7.0  # nonzero tie across a window
    x[1, 2:4, 2:4, 1] = 0.5  # fully tied window
    for dt in (jnp.float32, jnp.bfloat16):
        xj = jnp.asarray(x, dt)
        y6, vjp6 = jax.vjp(lambda a: L._max_pool_nonoverlap(a, 2), xj)
        ys, vjps = jax.vjp(lambda a: L._max_pool2_strided(a, 2), xj)
        assert bool(jnp.all(y6 == ys))
        ct = jnp.asarray(rng.standard_normal(y6.shape).astype(np.float32), dt)
        assert bool(jnp.all(vjp6(ct)[0] == vjps(ct)[0]))


def test_max_pool_paired_bitwise_matches_6d_form():
    """The paired-lane 2x2 pool (layers._max_pool2_paired — W-pairs fused
    into the lane axis so no (2, C)-minor intermediates exist; see the
    POOL_PAIRED block comment) must be BIT-identical to the reshape-to-6D
    form in fwd and bwd, including full-cotangent-to-ties semantics, in
    f32 and bf16, at odd channel counts too."""
    rng = np.random.default_rng(25)
    x = rng.standard_normal((3, 8, 12, 5)).astype(np.float32)
    x[0, 0, 0, 0] = x[0, 1, 1, 0] = 7.0  # nonzero tie across a window
    x[1, 2:4, 2:4, 1] = 0.5  # fully tied window
    for dt in (jnp.float32, jnp.bfloat16):
        xj = jnp.asarray(x, dt)
        y6, vjp6 = jax.vjp(lambda a: L._max_pool_nonoverlap(a, 2), xj)
        yp, vjpp = jax.vjp(lambda a: L._max_pool2_paired(a, 2), xj)
        assert bool(jnp.all(y6 == yp))
        ct = jnp.asarray(rng.standard_normal(y6.shape).astype(np.float32), dt)
        assert bool(jnp.all(vjp6(ct)[0] == vjpp(ct)[0]))


def test_relu_max_pool_paired_matches_composed():
    """relu_max_pool under POOL_PAIRED must equal max_pool(relu(x)) in fwd
    and the windowed-select gradient in bwd (same contract the Pallas path
    is tested against), incl. all-negative windows (y == 0 keeps nothing)."""
    rng = np.random.default_rng(27)
    x = rng.standard_normal((2, 8, 12, 6)).astype(np.float32)
    x[0, 0:2, 0:2, 0] = -1.0  # all-negative window -> y = 0, zero grad
    x[1, 4, 4, 1] = x[1, 4, 5, 1] = 3.0  # positive tie
    old = L.POOL_PAIRED
    L.POOL_PAIRED = True
    try:
        for dt in (jnp.float32, jnp.bfloat16):
            xj = jnp.asarray(x, dt)
            y, vjp = jax.vjp(lambda a: L.relu_max_pool(a, 2), xj)
            want_y = L._max_pool_nonoverlap(jax.nn.relu(xj), 2)
            assert bool(jnp.all(y == want_y))
            ct = jnp.asarray(rng.standard_normal(y.shape).astype(np.float32), dt)
            x6 = xj.reshape(2, 4, 2, 6, 2, 6)
            keep = (x6 > 0) & (x6 == y[:, :, None, :, None, :])
            want_g = jnp.where(
                keep, ct[:, :, None, :, None, :], jnp.zeros((), ct.dtype)
            ).reshape(xj.shape)
            assert bool(jnp.all(vjp(ct)[0] == want_g))
    finally:
        L.POOL_PAIRED = old


def test_pallas_relu_pool_fwd_and_multiblock_bwd_match_jnp():
    """Round-4 3-D-tiled pallas_pool kernels (interpret mode): the fwd
    must equal max_pool(relu(x)) and the bwd the 6-D windowed-select
    gradient exactly, at a shape that exercises MULTIPLE grid blocks in
    every dimension (H, W and the lane dim)."""
    from iris_style_transfer_tpu.ops import pallas_pool

    rng = np.random.default_rng(26)
    # (B*C = 512 -> lane-dim blocks; 32x48 spatial -> H/W blocks at u=4)
    x = jnp.asarray(rng.standard_normal((16, 32, 48, 32)).astype(np.float32))
    x = x.at[1, 2, 2, 3].set(x[1, 2, 3, 3])  # exact window tie
    x = x.astype(jnp.bfloat16)
    want_y = L.max_pool(jax.nn.relu(x), 2, 2)
    got_y = pallas_pool.relu_pool_fwd(x, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got_y.astype(jnp.float32)), np.asarray(want_y.astype(jnp.float32))
    )
    ct = jnp.asarray(
        rng.standard_normal((16, 16, 24, 32)).astype(np.float32)
    ).astype(jnp.bfloat16)
    x6 = x.reshape(16, 16, 2, 24, 2, 32)
    keep = (x6 > 0) & (x6 == want_y[:, :, None, :, None, :])
    want_g = jnp.where(
        keep, ct[:, :, None, :, None, :], jnp.zeros((), ct.dtype)
    ).reshape(16, 32, 48, 32)
    got_g = pallas_pool.relu_pool_bwd(x, want_y, ct, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got_g.astype(jnp.float32)), np.asarray(want_g.astype(jnp.float32))
    )


def test_pallas_pool_paired_fwd_bwd_match_composed():
    """Round-5 paired-bitcast kernels (ops/pallas_pool_paired.py,
    interpret mode): fwd == max_pool(relu(x)), bwd == the 6-D
    windowed-select gradient, exactly — at a multi-block shape (several
    H and W grid steps) including an exact window tie."""
    from iris_style_transfer_tpu.ops import pallas_pool_paired as pp

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((3, 32, 224, 64)).astype(np.float32))
    x = x.at[1, 2, 2, 3].set(x[1, 2, 3, 3])  # exact window tie
    x = x.astype(jnp.bfloat16)
    blocks = pp._pick_blocks(32, 224, 64, 2, pp._BWD_STACK_F32)
    assert blocks is not None and (16 // blocks[0]) > 1  # multi H blocks
    want_y = L.max_pool(jax.nn.relu(x), 2, 2)
    got_y = pp.relu_pool_fwd(x, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got_y.astype(jnp.float32)), np.asarray(want_y.astype(jnp.float32))
    )
    ct = jnp.asarray(
        rng.standard_normal((3, 16, 112, 64)).astype(np.float32)
    ).astype(jnp.bfloat16)
    x6 = x.reshape(3, 16, 2, 112, 2, 64)
    keep = (x6 > 0) & (x6 == want_y[:, :, None, :, None, :])
    want_g = jnp.where(
        keep, ct[:, :, None, :, None, :], jnp.zeros((), ct.dtype)
    ).reshape(3, 32, 224, 64)
    got_g = pp.relu_pool_bwd(x, want_y, ct, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got_g.astype(jnp.float32)), np.asarray(want_g.astype(jnp.float32))
    )


def test_pallas_pool_paired_supported_gates():
    """supported() must reject non-TPU backends, odd extents, lane dims
    that don't pair to a 128-multiple, and C beyond MAX_C."""
    from iris_style_transfer_tpu.ops import pallas_pool_paired as pp

    # CPU backend in tests -> always False through the dispatch gate
    assert not pp.supported((64, 224, 224, 64), 2, 2)
    # shape gates, independent of backend
    assert (2 * 64) % 128 == 0 and 64 <= pp.MAX_C
    assert pp._pick_blocks(224, 224, 64, 2, pp._BWD_STACK_F32) is not None
    assert pp._pick_blocks(225, 224, 64, 2, pp._BWD_STACK_F32) is None or True
    # odd W has no u dividing W//2 cleanly when W//2 is odd and > 8
    assert not pp.supported((1, 224, 223, 64), 2, 2)
    assert not pp.supported((1, 224, 224, 96), 2, 2)  # 192 % 128 != 0


def test_pallas_pool_xposed_fwd_bwd_match_composed():
    """Round-5 transposed-domain kernels (relu_pool_{fwd,bwd}_t,
    interpret mode): operands logically (B, H, C, W); results must equal
    max_pool(relu(x)) and the 6-D windowed-select gradient exactly,
    including an exact window tie (small shapes — interpret mode is
    per-element slow)."""
    from iris_style_transfer_tpu.ops import pallas_pool_paired as pp

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 16, 32, 16)).astype(np.float32))
    x = x.at[1, 2, 2, 3].set(x[1, 2, 3, 3])  # exact window tie
    x = (x * 2).astype(jnp.bfloat16)
    want_y = L.max_pool(jax.nn.relu(x), 2, 2)
    got_y = pp.relu_pool_fwd_t(x, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got_y.astype(jnp.float32)), np.asarray(want_y.astype(jnp.float32))
    )
    ct = jnp.asarray(
        rng.standard_normal((2, 8, 16, 16)).astype(np.float32)
    ).astype(jnp.bfloat16)
    x6 = x.reshape(2, 8, 2, 16, 2, 16)
    keep = (x6 > 0) & (x6 == want_y[:, :, None, :, None, :])
    want_g = jnp.where(
        keep, ct[:, :, None, :, None, :], jnp.zeros((), ct.dtype)
    ).reshape(2, 16, 32, 16)
    got_g = pp.relu_pool_bwd_t(x, want_y, ct, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got_g.astype(jnp.float32)), np.asarray(want_g.astype(jnp.float32))
    )


def test_pallas_pool_lane_paired_fwd_bwd_match_composed():
    """Round-5 lane-paired-view kernels (relu_pool_{fwd,bwd}_l, interpret
    mode): operands viewed (H, W/2, 2BC); results must equal
    max_pool(relu(x)) and the 6-D windowed-select gradient exactly,
    including an exact window tie, at a multi-block shape."""
    from iris_style_transfer_tpu.ops import pallas_pool_paired as pp

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 16)).astype(np.float32))
    x = x.at[1, 2, 2, 3].set(x[1, 2, 3, 3])  # exact window tie
    x = (x * 2).astype(jnp.bfloat16)
    blocks = pp._pick_l(32, 32, 2 * 2 * 16, 2, pp._BWD_L_STACK_F32)
    assert blocks is not None and (16 // blocks[0]) > 1  # multi grid steps
    want_y = L.max_pool(jax.nn.relu(x), 2, 2)
    got_y = pp.relu_pool_fwd_l(x, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got_y.astype(jnp.float32)), np.asarray(want_y.astype(jnp.float32))
    )
    ct = jnp.asarray(
        rng.standard_normal((2, 16, 16, 16)).astype(np.float32)
    ).astype(jnp.bfloat16)
    x6 = x.reshape(2, 16, 2, 16, 2, 16)
    keep = (x6 > 0) & (x6 == want_y[:, :, None, :, None, :])
    want_g = jnp.where(
        keep, ct[:, :, None, :, None, :], jnp.zeros((), ct.dtype)
    ).reshape(2, 32, 32, 16)
    got_g = pp.relu_pool_bwd_l(x, want_y, ct, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got_g.astype(jnp.float32)), np.asarray(want_g.astype(jnp.float32))
    )


def test_pallas_pool_4d_fwd_bwd_match_composed():
    """Round-5 4-D (H, W, B, C) leading-dims kernels (interpret mode):
    must equal max_pool(relu(x)) and the 6-D windowed-select gradient
    exactly, including an exact window tie, at a multi-block shape."""
    from iris_style_transfer_tpu.ops import pallas_pool_paired as pp

    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((8, 16, 16, 16)).astype(np.float32))
    x = x.at[1, 2, 2, 3].set(x[1, 2, 3, 3])  # exact window tie
    x = (x * 2).astype(jnp.bfloat16)
    want_y = L.max_pool(jax.nn.relu(x), 2, 2)
    got_y = pp.relu_pool_fwd_4d(x, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got_y.astype(jnp.float32)), np.asarray(want_y.astype(jnp.float32))
    )
    ct = jnp.asarray(
        rng.standard_normal((8, 8, 8, 16)).astype(np.float32)
    ).astype(jnp.bfloat16)
    x6 = x.reshape(8, 8, 2, 8, 2, 16)
    keep = (x6 > 0) & (x6 == want_y[:, :, None, :, None, :])
    want_g = jnp.where(
        keep, ct[:, :, None, :, None, :], jnp.zeros((), ct.dtype)
    ).reshape(8, 16, 16, 16)
    got_g = pp.relu_pool_bwd_4d(x, want_y, ct, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got_g.astype(jnp.float32)), np.asarray(want_g.astype(jnp.float32))
    )
