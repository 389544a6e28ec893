"""Functional NN primitives (NHWC / HWIO — TPU-native layouts).

Matmuls and convolutions carry ``preferred_element_type=float32`` so
bfloat16 params/activations accumulate at full precision on the MXU.
Initializers reproduce torch defaults (kaiming-uniform with a=sqrt(5)) so
randomly-initialized models are distribution-compatible with the reference.
"""

from __future__ import annotations

import functools
import math
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# initializers (torch nn.Conv2d / nn.Linear defaults)
# ---------------------------------------------------------------------------


def init_conv(key, kh, kw, cin, cout, dtype=jnp.float32) -> Params:
    fan_in = kh * kw * cin
    bound_w = math.sqrt(1.0 / fan_in)  # kaiming_uniform(a=sqrt(5))
    kw_, kb_ = jax.random.split(key)
    w = jax.random.uniform(kw_, (kh, kw, cin, cout), dtype, -bound_w, bound_w)
    b = jax.random.uniform(kb_, (cout,), dtype, -bound_w, bound_w)
    return {"w": w, "b": b}


def init_conv_he(key, kh, kw, cin, cout, dtype=jnp.float32) -> Params:
    """Kaiming-normal (fan_out, relu gain sqrt(2)) conv init, zero bias —
    exactly torchvision's ``_initialize_weights`` for VGG and ResNet.

    Used for the *seeded fallback* of shells the reference only ever runs
    with pretrained weights (``models/vgg/vgg.py:39-48`` always loads
    IMAGENET1K_V1, ``models/resnet/resnet.py:18`` V2 — both with O(1)
    activations at every depth).  torch's *default* conv init
    (``init_conv``, kaiming_uniform a=sqrt(5)) loses ~2x activation
    variance per conv+relu layer, so 16 layers in, features are ~100x too
    small and anything trained on top of them (the classifier heads, the
    appearance-based gaze estimator) is hopelessly ill-conditioned; He
    init keeps the seeded shell's feature scale depth-stable like the
    pretrained one — and is what torchvision itself draws when these
    models are constructed without weights."""
    fan_out = kh * kw * cout
    w = jax.random.normal(key, (kh, kw, cin, cout), dtype) * math.sqrt(2.0 / fan_out)
    return {"w": w, "b": jnp.zeros((cout,), dtype)}


def init_linear(key, din, dout, dtype=jnp.float32) -> Params:
    bound = math.sqrt(1.0 / din)
    kw_, kb_ = jax.random.split(key)
    w = jax.random.uniform(kw_, (din, dout), dtype, -bound, bound)
    b = jax.random.uniform(kb_, (dout,), dtype, -bound, bound)
    return {"w": w, "b": b}


def init_batchnorm(c, dtype=jnp.float32) -> Params:
    return {
        "scale": jnp.ones((c,), dtype),
        "bias": jnp.zeros((c,), dtype),
        "mean": jnp.zeros((c,), dtype),
        "var": jnp.ones((c,), dtype),
    }


# ---------------------------------------------------------------------------
# ops
# ---------------------------------------------------------------------------


def conv2d(
    x: jax.Array,
    p: Params,
    stride: int | tuple[int, int] = 1,
    padding: str | int | tuple = "SAME",
    groups: int = 1,
) -> jax.Array:
    """2-D conv, NHWC x HWIO -> NHWC, f32 accumulation."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    # no preferred_element_type: bf16 convs accumulate in f32 on the MXU
    # natively, and mixed-dtype outputs break the conv VJP
    out = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    return out + p["b"].astype(out.dtype)


def _conv_raw(x: jax.Array, w: jax.Array, groups: int = 1) -> jax.Array:
    """Stride-1 SAME-style conv with explicit symmetric padding (the only
    form the VGG stack uses); shared by :func:`conv2d_mxu_dx`."""
    pad = ((w.shape[0] - 1) // 2, (w.shape[0] - 1) // 2)
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding=[pad, pad],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv_small_cin(x: jax.Array, w: jax.Array, groups: int = 1) -> jax.Array:
    return _conv_raw(x, w, groups)


def _conv_small_cin_fwd(x, w, groups):
    return _conv_raw(x, w, groups), (x, w)


def _conv_small_cin_bwd(groups, res, ct):
    """Input gradient as one MXU matmul + 9 shifted adds.

    For a first-layer conv (C_in = 3), XLA lowers the transposed conv
    ``dx = conv_T(ct, w)`` to a VPU loop fusion: the natural matmul has
    N = C_in = 3 output lanes, so the MXU tiling (128 lanes) would waste
    125/128 of the array, and the fusion it picks instead was measured at
    6.4 ms/closure — 22% of the whole 512px NST step (tools/perf_probe9.py,
    round-3 trace).  Reassociating the contraction fixes the shape:

        Y[b,h,w,(kh,kw,ci)] = sum_o ct[b,h,w,o] * w[kh,kw,ci,o]
        dx[b,i,j,ci]        = sum_{kh,kw} Y[b, i-kh+P, j-kw+P, (kh,kw,ci)]

    The matmul now has N = kh*kw*C_in = 27 lanes (4.7x fewer wasted than
    3), runs on the MXU, and the shifted-window sum is one bandwidth-bound
    fusion over a 27-channel buffer.  Weight/bias gradients reuse XLA's
    standard conv-transpose (dead-code-eliminated when params are frozen,
    as in NST).
    """
    x, w = res
    kh, kw, ci, co_packed = w.shape
    ph = (kh - 1) // 2
    g = groups
    co = co_packed // g
    cin_packed = g * ci  # == x.shape[-1]

    if g == 1:
        wf = w.reshape(kh * kw * ci, co).astype(ct.dtype)
    else:
        # grouped: block-diagonal packed weight so the whole dx stays one
        # matmul — rows (g, o), cols (k, g', ci), nonzero only at g == g'.
        # The g x zero-FLOP waste is negligible (the matrix is tiny) and
        # buys N = kh*kw*g*ci output lanes.
        wg = w.reshape(kh * kw, ci, g, co)
        eye = jnp.eye(g, dtype=w.dtype)
        w2 = jnp.einsum("kcgo,gh->gokhc", wg, eye)
        wf = w2.reshape(g * co, kh * kw * cin_packed).astype(ct.dtype)

    # keep y in f32 through the 9 shifted adds: chaining them in bf16 would
    # round 9 extra times, and that ulp noise feeds L-BFGS's curvature gate
    # (ys > 1e-10) where it flips pair acceptance at near-ties — dx rounds
    # exactly once, like the XLA conv-transpose this path replaces
    y = jax.lax.dot_general(
        ct, wf,
        dimension_numbers=(((3,), (0,) if g > 1 else (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, H, W, kh*kw*cin_packed) f32

    b_, h_, w_, _ = ct.shape
    ypad = jnp.pad(y, ((0, 0), (ph, ph), (ph, ph), (0, 0)))
    dx = jnp.zeros(x.shape, jnp.float32)
    for i in range(kh):
        for j in range(kw):
            tap = jax.lax.slice(
                ypad,
                (0, 2 * ph - i, 2 * ph - j, (i * kw + j) * cin_packed),
                (b_, 2 * ph - i + h_, 2 * ph - j + w_, (i * kw + j + 1) * cin_packed),
            )
            dx = dx + tap
    dx = dx.astype(x.dtype)

    # dw via XLA's standard conv-backward-filter; pruned by DCE on frozen
    # params (jax only emits it when the caller differentiates w.r.t. w)
    _, pull = jax.vjp(lambda wv: _conv_raw(x, wv, g), w)
    (dw,) = pull(ct)
    return dx, dw


_conv_small_cin.defvjp(_conv_small_cin_fwd, _conv_small_cin_bwd)

# probe escape hatch (tools/perf_probe10.py A/B): False restores XLA's own
# conv-transpose for small-C_in input gradients
USE_MXU_DX = True

# probe15 candidate: ALSO reassociate the small-C_in FORWARD onto the MXU.
# XLA lowers a C_in=3 conv to a VPU loop fusion for the same reason it did
# the input gradient (the natural matmul has K = 3 contraction lanes);
# probe9 measured that forward fusion at 1.76 ms/closure at 512px bs4.
# The reassociated form gathers the 9 shifted taps into a (B, H, W, 27)
# buffer and runs ONE K=27 matmul; autodiff of this expression reproduces
# the hand-written ``_conv_small_cin_bwd`` shape for dx automatically
# (dx27 = ct @ Wf^T, then the concat-of-slices transpose = 9 shifted
# adds), so the custom VJP is bypassed entirely when this is on.
# Default OFF until measured on-chip (tools/perf_probe15.py).
USE_MXU_FWD = False


def _conv_small_cin_reassoc(x: jax.Array, w: jax.Array) -> jax.Array:
    """Small-C_in stride-1 symmetric-pad conv as tap-gather + one matmul.

    y[b,i,j,o] = sum_{kh,kw,ci} xpad[b,i+kh,j+kw,ci] * w[kh,kw,ci,o] with
    the (kh, kw, ci) axis flattened into a K = kh*kw*C_in contraction —
    27 MXU lanes for a 3x3 RGB conv instead of 3.  Plain jax expression:
    autodiff produces the MXU-friendly input gradient for free.
    """
    kh, kw, ci, co = w.shape
    ph = (kh - 1) // 2
    b, h, w_, _ = x.shape
    xpad = jnp.pad(x, ((0, 0), (ph, ph), (ph, ph), (0, 0)))
    taps = [
        jax.lax.slice(xpad, (0, i, j, 0), (b, i + h, j + w_, ci))
        for i in range(kh)
        for j in range(kw)
    ]
    xk = jnp.concatenate(taps, axis=-1)  # (B, H, W, kh*kw*ci)
    wf = w.reshape(kh * kw * ci, co).astype(x.dtype)
    y = jax.lax.dot_general(
        xk, wf,
        dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y.astype(x.dtype)


def conv2d_mxu_dx(x: jax.Array, p: Params, groups: int = 1) -> jax.Array:
    """Stride-1 symmetric-pad conv whose input gradient is the
    MXU-reassociated form (see ``_conv_small_cin_bwd``).  Numerically
    identical to :func:`conv2d`; use for first-layer convs (small
    per-group C_in) on gradient-hot paths like the NST closure."""
    if USE_MXU_FWD and groups == 1:
        out = _conv_small_cin_reassoc(x, p["w"])
        return out + p["b"].astype(out.dtype)
    if not USE_MXU_DX:
        return conv2d(
            x, p, stride=1, padding=(p["w"].shape[0] - 1) // 2, groups=groups
        )
    out = _conv_small_cin(x, p["w"], groups)
    return out + p["b"].astype(out.dtype)


def linear(x: jax.Array, p: Params) -> jax.Array:
    out = jnp.dot(x, p["w"].astype(x.dtype))
    return out + p["b"].astype(out.dtype)


def batchnorm(x: jax.Array, p: Params, eps: float = 1e-5) -> jax.Array:
    """Inference-mode batchnorm over the channel-last axis."""
    x32 = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    out = (x32 - p["mean"].astype(jnp.float32)) * inv * p["scale"].astype(
        jnp.float32
    ) + p["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def batchnorm_train(
    x: jax.Array, p: Params, momentum: float = 0.1, eps: float = 1e-5
) -> tuple[jax.Array, Params]:
    """Training-mode batchnorm: normalize by batch stats, return updated
    running stats (torch momentum convention)."""
    x32 = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x32, axis=axes)
    var = jnp.var(x32, axis=axes)
    n = x32.size // x32.shape[-1]
    unbiased = var * n / max(n - 1, 1)
    inv = jax.lax.rsqrt(var + eps)
    out = (x32 - mean) * inv * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    new_p = dict(p)
    new_p["mean"] = (1 - momentum) * p["mean"] + momentum * mean
    new_p["var"] = (1 - momentum) * p["var"] + momentum * unbiased
    return out.astype(x.dtype), new_p


# Strided-slice formulation of the 2x2 pool (round-4 probe24): the
# reshape-to-6D form's intermediates have minor dims (2, C) — at block 1
# (C=64) that is a 2/8-sublane x 64/128-lane tile occupancy (12.5%), and
# the round-4 bs64 trace shows the pool1 backward costing 10.1 ms/closure
# (compare_select 6.8 + 6-D broadcast 3.3) against a ~1.3 ms HBM bound.
# Four strided H/W slices keep every op 4-D with the tensor's own (B, C)
# minor dims; the backward scatters through interior-padded adds.
#
# MEASURED AND REJECTED (tools/perf_probe24.py, real chip): 14.03 vs
# 22.32 steps/s at (64, 224, 224, 3) and 12.68 vs 45.65 at the 512px
# bench config — XLA lowers the strided slices/interior pads to far
# worse code than the 6-D reshape form it was meant to replace.  Kept
# flag-gated OFF as the documented dead end (bit-identical numerics,
# tests/test_layers.py::test_max_pool_strided_bitwise_matches_6d_form).
POOL_STRIDED = False


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _max_pool2_strided(x: jax.Array, window: int = 2) -> jax.Array:
    x00 = x[:, 0::2, 0::2, :]
    x01 = x[:, 0::2, 1::2, :]
    x10 = x[:, 1::2, 0::2, :]
    x11 = x[:, 1::2, 1::2, :]
    return jnp.maximum(jnp.maximum(x00, x01), jnp.maximum(x10, x11))


def _max_pool2_strided_fwd(x, window):
    y = _max_pool2_strided(x, window)
    # residual (x, y): both already live in the surrounding graph (x is
    # the relu output, y feeds the next conv), so the fwd writes nothing
    # extra — vs the 6-D form's full-res bool mask
    return y, (x, y)


def _max_pool2_strided_bwd(window, res, ct):
    """Tie semantics identical to ``_max_pool_nonoverlap``: every
    max-achieving window element receives the full cotangent."""
    x, y = res
    zero = jnp.zeros((), ct.dtype)
    dx = None
    for i in (0, 1):
        for j in (0, 1):
            xij = jax.lax.slice(x, (0, i, j, 0), x.shape, (1, 2, 2, 1))
            g = jnp.where(xij == y, ct, zero)
            # interior padding interleaves the slice back to full res
            part = jax.lax.pad(
                g, zero,
                ((0, 0, 0), (i, 1 - i, 1), (j, 1 - j, 1), (0, 0, 0)),
            )
            dx = part if dx is None else dx + part
    return (dx,)


_max_pool2_strided.defvjp(_max_pool2_strided_fwd, _max_pool2_strided_bwd)


# Paired-lane formulation of the 2x2 pool (round 5): the 6-D form's
# pathology is its (2, C) minor dims — 2/8 sublanes x C/128 lanes = 12.5%
# vreg occupancy at block 1 (C=64), which the round-4 bs64 trace prices at
# ~15.7 ms/closure of pool1 fwd+bwd against a ~2 ms HBM bound.  Key
# observation: W and C are ADJACENT row-major dims, so regrouping
#
#     (B, H, W, C)  ->  (B, H/2, 2, W/2, 2C)
#
# is a pure row-major reshape that fuses each W-pair into the lane axis:
# the minor dims become (W/2, 2C) = (112, 128) at block 1 — fully
# occupied tiles.  The W-pair max is then a lane-aligned half-split
# maximum, and the H-pair max reduces a SLAB-strided axis (stride
# W/2 * 2C, vreg-aligned), never a sublane-interleaved one.  The backward
# broadcasts y/ct into both lane halves (concat) and both H-slabs —
# again no (2, C)-minor intermediates.  Numerics are bit-identical to
# the 6-D form incl. tie-to-all semantics (max is exactly associative).
# MEASURED AND REJECTED on-chip (2026-08-20, tools/probe.py nst,
# interleaved min-of-3): 16.57 vs 22.38 steps/s at (64, 224, 224, 3)
# (0.740x) and 37.78 vs 45.79 at (4, 512, 512, 3) (0.825x), s_loss
# identical — XLA lowers the (B, H/2, 2, W/2, 2C) regroup no better
# than the 6-D form; the relayout to/from the paired view costs more
# than the lane-occupancy win.  Eighth and last pure-XLA reformulation
# of the block-1 boundary; stays flag-gated OFF as the documented dead
# end (bit-exactness: tests/test_layers.py::test_max_pool_paired_*).
POOL_PAIRED = False


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _max_pool2_paired(x: jax.Array, window: int = 2) -> jax.Array:
    b, h, w, c = x.shape
    xp = x.reshape(b, h // 2, 2, w // 2, 2 * c)
    xw = jnp.maximum(xp[..., :c], xp[..., c:])  # W-pair max, lane-aligned
    return jnp.max(xw, axis=2)  # H-pair max, slab-aligned


def _max_pool2_paired_fwd(x, window):
    y = _max_pool2_paired(x, window)
    # residual (x, y): x is the upstream relu output already live in the
    # graph; no extra full-res mask is written (cf. _max_pool_nonoverlap)
    return y, (x, y)


def _max_pool2_paired_bwd(window, res, ct):
    """Tie semantics identical to ``_max_pool_nonoverlap``: every
    max-achieving window element receives the full cotangent."""
    x, y = res
    b, p, q, c = ct.shape
    xp = x.reshape(b, p, 2, q, 2 * c)
    yb = jnp.concatenate([y, y], axis=-1)[:, :, None]  # (B, P, 1, Q, 2C)
    ctb = jnp.concatenate([ct, ct], axis=-1)[:, :, None]
    g = jnp.where(xp == yb, ctb, jnp.zeros((), ct.dtype))
    return (g.reshape(b, 2 * p, 2 * q, c),)


_max_pool2_paired.defvjp(_max_pool2_paired_fwd, _max_pool2_paired_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _max_pool_nonoverlap(x: jax.Array, window: int) -> jax.Array:
    b, h, w, c = x.shape
    xr = x.reshape(b, h // window, window, w // window, window, c)
    return jnp.max(xr, axis=(2, 4))


def _max_pool_nonoverlap_fwd(x, window):
    """Residual is a bool max mask (1 B/elt vs the 2 B/elt bf16 input
    jnp.max's VJP would keep) — with frozen conv weights these pool/relu
    residuals are the bulk of the NST backward's HBM residual traffic
    (+3% steps/s at 512px, tools/perf_probe5.py).

    Tie semantics: every max-achieving window element receives the full
    cotangent.  Where the window max is unique this equals torch's
    ``F.max_pool2d`` backward exactly.  At ties it deviates from both
    torch (one winner) and jnp.max (even split) — a deliberate trade
    measured to be free here: in this framework every ``max_pool`` on a
    gradient path follows a relu, so tied-at-zero windows (the common
    case) are killed by the upstream relu mask, making d(pool∘relu)/dx
    torch-exact for f32; remaining bf16-quantization ties changed the
    512px NST loss trajectory by <1e-6 relative (BASELINE.md).  Every
    winner-selection scheme tried (uint8 argmax code, packed monotone
    key, quadrant priority scan) cost 1-2 ms/step more than the stock
    VJP — see tools/perf_probe5.py for the shootout.
    """
    b, h, w, c = x.shape
    xr = x.reshape(b, h // window, window, w // window, window, c)
    y = jnp.max(xr, axis=(2, 4))
    mask = xr == y[:, :, None, :, None, :]
    return y, (mask, x.shape)


def _max_pool_nonoverlap_bwd(window, res, ct):
    mask, (b, h, w, c) = res
    g = jnp.where(
        mask, ct[:, :, None, :, None, :], jnp.zeros((), ct.dtype)
    )
    return (g.reshape(b, h, w, c),)


_max_pool_nonoverlap.defvjp(_max_pool_nonoverlap_fwd, _max_pool_nonoverlap_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def relu_max_pool(x: jax.Array, window: int = 2) -> jax.Array:
    """Fused ``max_pool(relu(x))`` for non-overlapping windows.

    Exists for the backward: composing the two ops' VJPs makes XLA
    materialize TWO full-resolution upsampled arrays (the pooled
    cotangent and the pooled max broadcast back to input size) before a
    separate select fusion — measured 3.97 ms/closure at the 512px NST
    config, ~9x the bandwidth roofline (tools/perf_probe9.py round-3
    trace).  Writing the whole backward in the windowed 6-d domain keeps
    both broadcasts inside one fusion: read x, the pooled max and the
    pooled cotangent, write the gradient — nothing full-res in between.

    Gradient semantics match ``max_pool(relu(x))`` with
    ``_max_pool_nonoverlap``'s tie handling: every window element that is
    positive AND equals the window max receives the full cotangent.
    """
    b, h, w, c = x.shape
    xr = x.reshape(b, h // window, window, w // window, window, c)
    return jnp.max(jax.nn.relu(xr), axis=(2, 4))


# Round-5 Pallas relu+pool formulations (ops/pallas_pool_paired.py).
#
# POOL_PAIRED_PALLAS — the paired-bitcast view ((B,H,W,C)->(B,H,W/2,2C)).
# MEASURED AND REJECTED on-chip (2026-08-20, tools/probe.py nst): 20.94
# vs 22.35 steps/s at bs64 (0.937x), 44.87 vs 45.85 at 512px (0.978x).
# The probe9 trace shows the kernels beat XLA's forms ~6x but XLA's
# preferred block-1 layout is {2,3,1,0} (W in lanes), so the custom-call
# boundary costs ~7 ms of copies + a de-fused relu1_1 backward.
POOL_PAIRED_PALLAS = False

# POOL_XPOSED_PALLAS — the transposed-domain kernels: operands logically
# (B, H, C, W), W-pair work behind Mosaic's minor-dims transpose unit.
# MEASURED AND REJECTED (2026-08-20): 20.91 vs 22.37 steps/s at bs64
# (0.935x), 45.35 vs 45.79 at 512px (0.990x) — built on the wrong layout
# guess: the optimized HLO shows XLA keeps bf16 block-1 activations in
# {3,0,2,1} ([H][W][B][C]), not {2,3,1,0}, so these operands still copy.
POOL_XPOSED_PALLAS = False

# POOL_LANE_PALLAS — the lane-paired-view kernels: operands viewed
# (H, W/2, 2*B*C), a compile-verified BITCAST of the {3,0,2,1} layout
# (zero copies in the lowered HLO), every op lane-aligned.  Dispatched
# from relu_max_pool; reached from the VGG forward via the
# paired-eligibility fuse gate in vgg.py.  Default OFF until measured
# (tools/probe.py nst --variant lk:POOL_LANE_PALLAS=True).
POOL_LANE_PALLAS = False

# POOL_4D_PALLAS — 4-D (H, W, B, C) operands (the shape XLA already
# rewrites the block-1 conv to produce), both pool axes leading dims,
# (B, C) minors untouched; no reshape so no tiling change at the
# boundary.  MEASURED AND ACCEPTED (2026-08-20, tools/probe.py nst,
# interleaved min-of-3): **24.01 vs 22.38 steps/s at (64,224,224,64) =
# 1.073x**, s_loss identical — the first formulation of the block-1
# boundary to beat XLA's own lowering after eleven rejections across
# rounds 3-5.  At the 512px bs4 bench config ``supported_4d`` is False
# (B % 8 != 0) so the composed path is unchanged there.  Default ON.
POOL_4D_PALLAS = True


def _relu_max_pool_fwd(x, window):
    from ..ops import pallas_pool, pallas_pool_paired

    isz = jnp.dtype(x.dtype).itemsize
    if (
        window == 2
        and POOL_4D_PALLAS
        and pallas_pool_paired.supported_4d(x.shape, window, isz)
    ):
        y = pallas_pool_paired.relu_pool_fwd_4d(x)
        return y, (x, y)
    if (
        window == 2
        and POOL_LANE_PALLAS
        and pallas_pool_paired.supported_l(x.shape, window, isz)
    ):
        y = pallas_pool_paired.relu_pool_fwd_l(x)
        return y, (x, y)
    if (
        window == 2
        and POOL_XPOSED_PALLAS
        and pallas_pool_paired.supported_t(x.shape, window, isz)
    ):
        y = pallas_pool_paired.relu_pool_fwd_t(x)
        return y, (x, y)
    if (
        window == 2
        and POOL_PAIRED_PALLAS
        and pallas_pool_paired.supported(x.shape, window, isz)
    ):
        y = pallas_pool_paired.relu_pool_fwd(x)
        return y, (x, y)
    if window == 2 and POOL_PAIRED:
        # paired-lane form: W-pairs fused into lanes, relu folded into the
        # H-pair max (see the POOL_PAIRED block comment above)
        b, h, w, c = x.shape
        xp = x.reshape(b, h // 2, 2, w // 2, 2 * c)
        xw = jnp.maximum(xp[..., :c], xp[..., c:])
        y = jnp.maximum(jnp.max(xw, axis=2), jnp.zeros((), x.dtype))
    elif window == 2 and pallas_pool.supported(
        x.shape, window, jnp.dtype(x.dtype).itemsize
    ):
        # one lane-full pass (the XLA form materializes the relu output
        # plus a low-occupancy 6-D windowed view — see ops/pallas_pool.py)
        y = pallas_pool.relu_pool_fwd(x)
    else:
        y = relu_max_pool(x, window)
    return y, (x, y)


def _relu_max_pool_bwd(window, res, ct):
    x, y = res
    from ..ops import pallas_pool, pallas_pool_paired

    isz = jnp.dtype(x.dtype).itemsize
    if (
        window == 2
        and POOL_4D_PALLAS
        and pallas_pool_paired.supported_4d(x.shape, window, isz)
    ):
        return (pallas_pool_paired.relu_pool_bwd_4d(x, y, ct.astype(x.dtype)),)
    if (
        window == 2
        and POOL_LANE_PALLAS
        and pallas_pool_paired.supported_l(x.shape, window, isz)
    ):
        return (pallas_pool_paired.relu_pool_bwd_l(x, y, ct.astype(x.dtype)),)
    if (
        window == 2
        and POOL_XPOSED_PALLAS
        and pallas_pool_paired.supported_t(x.shape, window, isz)
    ):
        return (pallas_pool_paired.relu_pool_bwd_t(x, y, ct.astype(x.dtype)),)
    if (
        window == 2
        and POOL_PAIRED_PALLAS
        and pallas_pool_paired.supported(x.shape, window, isz)
    ):
        return (pallas_pool_paired.relu_pool_bwd(x, y, ct.astype(x.dtype)),)
    if window == 2 and POOL_PAIRED:
        b, p2, q2, c = x.shape
        xp = x.reshape(b, p2 // 2, 2, q2 // 2, 2 * c)
        yb = jnp.concatenate([y, y], axis=-1)[:, :, None]
        ctb = jnp.concatenate([ct, ct], axis=-1)[:, :, None].astype(ct.dtype)
        keep = (xp > 0) & (xp == yb)
        g = jnp.where(keep, ctb, jnp.zeros((), ct.dtype))
        return (g.reshape(b, p2, q2, c),)
    if pallas_pool.supported(x.shape, window, jnp.dtype(x.dtype).itemsize):
        # one lane-full pass over a bitcast (H, W, B*C) view — the XLA
        # lowering of the expression below runs at 25% vreg occupancy in
        # the bs4 batch-in-sublanes layout (see ops/pallas_pool.py)
        return (pallas_pool.relu_pool_bwd(x, y, ct.astype(x.dtype)),)
    b, h, w, c = x.shape
    x6 = x.reshape(b, h // window, window, w // window, window, c)
    keep = (x6 > 0) & (x6 == y[:, :, None, :, None, :])
    g6 = jnp.where(keep, ct[:, :, None, :, None, :], jnp.zeros((), ct.dtype))
    return (g6.reshape(b, h, w, c),)


relu_max_pool.defvjp(_relu_max_pool_fwd, _relu_max_pool_bwd)

# Default OFF: measured exactly neutral on the 512px NST closure
# (46.05 vs 45.99 steps/s, tools/perf_probe11.py) — the composed ops'
# cost is the 25%-occupancy batch-in-sublanes layout XLA picks at bs4,
# not the fusion structure, so the simpler composed path stays canonical.
FUSE_RELU_POOL = False


# probe15 candidate: style-tap relus computed as a fused relu+stats op
# whose TPU path is a lane-full Pallas kernel (ops/pallas_relu_stats.py).
# Default OFF until measured on-chip; the op itself is always available.
STATS_TAPS = False


@jax.custom_vjp
def relu_stats(x: jax.Array):
    """(y, s1, s2) = (relu(x), sum_hw y, sum_hw y*y) with f32 sums per
    (B, C) — the NST style tap and its BN-statistics reductions as ONE
    op, so the backward injects the d(mean)/d(std) cotangents under the
    relu mask in a single pass (see ``ops/pallas_relu_stats.py`` for why
    XLA's own fusion of the same expression is layout-bound at bs4).

    Semantics match ``relu`` + ``ops.losses.style_stats``'s sum/sumsq
    pass exactly; reference anchor ``utils.py:324-355``.
    """
    y = jax.nn.relu(x)
    yf = y.astype(jnp.float32)
    return y, jnp.sum(yf, axis=(1, 2)), jnp.sum(yf * yf, axis=(1, 2))


def _relu_stats_fwd(x):
    from ..ops import pallas_relu_stats

    if pallas_relu_stats.supported(x.shape, jnp.dtype(x.dtype).itemsize):
        y, s1, s2 = pallas_relu_stats.relu_stats_fwd(x)
    else:
        y = jax.nn.relu(x)
        yf = y.astype(jnp.float32)
        s1 = jnp.sum(yf, axis=(1, 2))
        s2 = jnp.sum(yf * yf, axis=(1, 2))
    return (y, s1, s2), x


def _relu_stats_bwd(x, cts):
    ct_y, ct_s1, ct_s2 = cts
    from ..ops import pallas_relu_stats

    if pallas_relu_stats.supported(x.shape, jnp.dtype(x.dtype).itemsize):
        return (pallas_relu_stats.relu_stats_bwd(x, ct_y, ct_s1, ct_s2),)
    xf = x.astype(jnp.float32)
    g = (
        ct_y.astype(jnp.float32)
        + ct_s1.astype(jnp.float32)[:, None, None, :]
        + 2.0 * xf * ct_s2.astype(jnp.float32)[:, None, None, :]
    )
    g = jnp.where(x > 0, g, 0.0)
    return (g.astype(x.dtype),)


relu_stats.defvjp(_relu_stats_fwd, _relu_stats_bwd)


def max_pool(x: jax.Array, window: int = 2, stride: int | None = None) -> jax.Array:
    stride = stride or window
    if stride == window and x.shape[1] % window == 0 and x.shape[2] % window == 0:
        # non-overlapping pooling as elementwise max: its VJP is an
        # elementwise compare/select instead of reduce_window's
        # SelectAndScatter, which dominates backward time on TPU (the VGG
        # NST closure spends more in pool gradients than in all the convs
        # without this).  The default dispatch is _max_pool_nonoverlap
        # (6-D reshape form); the strided-slice alternative is flag-gated
        # OFF — measured and REJECTED on-chip (see the POOL_STRIDED block
        # comment, the source of truth for that verdict)
        if window == 2 and POOL_STRIDED:
            return _max_pool2_strided(x, window)
        if window == 2 and POOL_PAIRED:
            return _max_pool2_paired(x, window)
        return _max_pool_nonoverlap(x, window)
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        "VALID",
    )


def avg_pool(x: jax.Array, window: int = 2, stride: int | None = None) -> jax.Array:
    stride = stride or window
    summed = jax.lax.reduce_window(
        x.astype(jnp.float32),
        0.0,
        jax.lax.add,
        (1, window, window, 1),
        (1, stride, stride, 1),
        "VALID",
    )
    return (summed / (window * window)).astype(x.dtype)


def adaptive_avg_pool(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """AdaptiveAvgPool2d for NHWC; matches torch's bin edges
    (start = floor(i*H/oh), end = ceil((i+1)*H/oh))."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if h % oh == 0 and w % ow == 0:
        return avg_pool(x, window=h // oh, stride=h // oh) if (h // oh) == (w // ow) else _adaptive_general(x, oh, ow)
    return _adaptive_general(x, oh, ow)


def _adaptive_general(x: jax.Array, oh: int, ow: int) -> jax.Array:
    b, h, w, c = x.shape
    x32 = x.astype(jnp.float32)
    # row pooling matrix (oh, h) and col pooling matrix (ow, w)
    def pool_mat(out_n, in_n):
        idx = jnp.arange(in_n)
        starts = (jnp.arange(out_n) * in_n) // out_n
        ends = -((-(jnp.arange(out_n) + 1) * in_n) // out_n)  # ceil
        m = (idx[None, :] >= starts[:, None]) & (idx[None, :] < ends[:, None])
        m = m.astype(jnp.float32)
        return m / jnp.sum(m, axis=1, keepdims=True)

    rm = pool_mat(oh, h)  # (oh, h)
    cm = pool_mat(ow, w)  # (ow, w)
    out = jnp.einsum("oh,bhwc->bowc", rm, x32)
    out = jnp.einsum("pw,bowc->bopc", cm, out)
    return out.astype(x.dtype)


def upsample_nearest(x: jax.Array, scale: int = 2) -> jax.Array:
    """Nearest-neighbor x2 upsample (reference up-blocks, ``ritnet.py:151``)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, scale, w, scale, c))
    return x.reshape(b, h * scale, w * scale, c)


def leaky_relu(x: jax.Array, negative_slope: float = 0.01) -> jax.Array:
    return jax.nn.leaky_relu(x, negative_slope)


def dropout(x: jax.Array, rate: float, key: jax.Array | None, train: bool) -> jax.Array:
    if not train or rate == 0.0 or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
