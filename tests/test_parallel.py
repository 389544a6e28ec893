"""Multi-device tests on the virtual 8-device CPU mesh (conftest.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iris_style_transfer_tpu.models import VGG19
from iris_style_transfer_tpu.parallel import (
    batch_sharding,
    make_mesh,
    make_multislice_mesh,
    mlp_tp_spec,
    replicated,
    shard_batch,
    shard_params,
    spatial_sharding,
)
from iris_style_transfer_tpu.transfer.nst import make_nst_fn


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.shape == (8, 1)
    mesh = make_mesh(model_parallel=2)
    assert mesh.devices.shape == (4, 2)


@pytest.mark.slow
def test_sharded_nst_matches_single_device():
    """The NST program under batch sharding must produce the same result
    as unsharded execution (same math, XLA inserts the collectives)."""
    mesh = make_mesh()
    params = VGG19.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.random((8, 32, 32, 3)), jnp.float32)
    s = jnp.asarray(rng.random((8, 32, 32, 3)), jnp.float32)

    fn = jax.jit(make_nst_fn(epochs=5))
    res_single = fn(params, c, s)

    c_sh = jax.device_put(c, batch_sharding(mesh))
    s_sh = jax.device_put(s, batch_sharding(mesh))
    params_sh = shard_params(mesh, params)
    res_sharded = fn(params_sh, c_sh, s_sh)

    # losses must agree tightly; pixels agree in the mean but isolated
    # elements may branch at relu/clip ties: on the CPU test backend the
    # per-shard matmul M differs from the single-device M, so the
    # K-reduction blocking (and hence f32 rounding) differs by an ulp,
    # and 5 L-BFGS steps amplify that chaotically (the round-3 MXU-dx
    # formulation surfaced this; its math is pinned by
    # test_conv2d_mxu_dx_matches_conv2d_grads)
    np.testing.assert_allclose(
        np.asarray(res_single.s_loss_hist),
        np.asarray(res_sharded.s_loss_hist),
        rtol=2e-2,
    )
    dx = np.abs(np.asarray(res_single.x) - np.asarray(res_sharded.x))
    assert dx.mean() < 1e-3
    assert dx.max() < 5e-2


@pytest.mark.slow
def test_spatial_sharded_nst_matches_single_device():
    """Spatial parallelism (the SP analog, parallel.spatial_sharding):
    the NST scan with images H-sharded over the ``model`` axis — XLA
    partitions the convs with halo exchanges and psums the Gram/stats
    reductions and L-BFGS inner products — must match unsharded
    execution.  4x2 mesh: dp over batch, sp=2 over H."""
    mesh = make_mesh(model_parallel=2)
    params = VGG19.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.random((8, 32, 32, 3)), jnp.float32)
    s = jnp.asarray(rng.random((8, 32, 32, 3)), jnp.float32)

    fn = jax.jit(make_nst_fn(epochs=5))
    res_single = fn(params, c, s)

    sp = spatial_sharding(mesh)
    res_sharded = fn(
        shard_params(mesh, params),
        jax.device_put(c, sp),
        jax.device_put(s, sp),
    )
    assert res_sharded.x.sharding.is_equivalent_to(sp, res_sharded.x.ndim)
    # same tolerance story as test_sharded_nst_matches_single_device:
    # per-shard reduction blocking differs by ulps, 5 L-BFGS steps
    # amplify isolated pixels at relu/clip ties
    np.testing.assert_allclose(
        np.asarray(res_single.s_loss_hist),
        np.asarray(res_sharded.s_loss_hist),
        rtol=2e-2,
    )
    dx = np.abs(np.asarray(res_single.x) - np.asarray(res_sharded.x))
    assert dx.mean() < 1e-3
    assert dx.max() < 5e-2


@pytest.mark.slow
def test_spatial_sharded_nst_stats_taps_matches_single_device():
    """stats_taps=True (style taps as fused relu+stats (mean, std) pairs)
    under spatial sharding: the per-(B, C) sum/sumsq reductions now live
    INSIDE the VGG forward's custom-VJP op, so XLA must psum them across
    the H shards and route the d(mean)/d(std) cotangents back through the
    shard-local relu masks — must match unsharded execution.

    Scope: on this CPU mesh ``pallas_relu_stats.supported()`` is False,
    so this validates the composed-XLA fallback's sharded math; the
    Pallas kernel under real multi-chip sharding is probe territory
    (see the sharding caveat in ops/pallas_relu_stats.py)."""
    mesh = make_mesh(model_parallel=2)
    params = VGG19.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    c = jnp.asarray(rng.random((8, 32, 32, 3)), jnp.float32)
    s = jnp.asarray(rng.random((8, 32, 32, 3)), jnp.float32)

    fn = jax.jit(make_nst_fn(epochs=5, stats_taps=True))
    res_single = fn(params, c, s)

    sp = spatial_sharding(mesh)
    res_sharded = fn(
        shard_params(mesh, params),
        jax.device_put(c, sp),
        jax.device_put(s, sp),
    )
    np.testing.assert_allclose(
        np.asarray(res_single.s_loss_hist),
        np.asarray(res_sharded.s_loss_hist),
        rtol=2e-2,
    )
    dx = np.abs(np.asarray(res_single.x) - np.asarray(res_sharded.x))
    assert dx.mean() < 1e-3
    assert dx.max() < 5e-2


@pytest.mark.slow
def test_multislice_mesh_nst_matches_single_device():
    """Multi-slice (slice, data, model) mesh: the batch shards over both
    DP axes (hierarchical ICI-then-DCN reductions on real pods); results
    must match unsharded execution.  2 virtual slices x 4 chips here."""
    mesh = make_multislice_mesh(n_slices=2)
    assert mesh.devices.shape == (2, 4, 1)
    assert mesh.axis_names == ("slice", "data", "model")

    params = VGG19.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    c = jnp.asarray(rng.random((8, 32, 32, 3)), jnp.float32)
    s = jnp.asarray(rng.random((8, 32, 32, 3)), jnp.float32)

    fn = jax.jit(make_nst_fn(epochs=5))
    res_single = fn(params, c, s)

    res_sharded = fn(
        shard_params(mesh, params),
        jax.device_put(c, batch_sharding(mesh)),
        jax.device_put(s, batch_sharding(mesh)),
    )
    np.testing.assert_allclose(
        np.asarray(res_single.x), np.asarray(res_sharded.x), atol=2e-3
    )


def test_shard_params_partial_spec_replicates_missing():
    """The documented contract: spec entries that are MISSING (not just
    None) replicate — a plain tree.map would raise a dict-key mismatch."""
    import numpy as np
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh()
    params = {"a": {"w": np.ones((8, 4), np.float32), "b": np.ones(4, np.float32)}}
    out = shard_params(mesh, params, spec={"a": {"w": P("data", None)}})
    assert out["a"]["w"].sharding.spec == P("data", None)
    # 'b' was absent from the spec -> replicated
    assert out["a"]["b"].sharding.is_fully_replicated


@pytest.mark.slow
def test_tensor_parallel_classifier_matches_replicated():
    from iris_style_transfer_tpu.models import Classifier2

    mesh = make_mesh(model_parallel=2)
    params = Classifier2.init(jax.random.PRNGKey(1), num_class=10)
    style = [jnp.asarray(np.random.default_rng(2).random((4, 8, 8, c)), jnp.float32)
             for c in (64, 128, 256, 512)]

    want = np.asarray(Classifier2.apply(params, style))
    params_tp = shard_params(mesh, params, mlp_tp_spec(params))
    style_sh = [jax.device_put(f, batch_sharding(mesh)) for f in style]
    got = np.asarray(jax.jit(Classifier2.apply)(params_tp, style_sh))
    np.testing.assert_allclose(got, want, atol=2e-4)


@pytest.mark.slow
def test_sharded_gaze_step_matches_single_device():
    """The full 2020 gaze-preservation step (B7 TTA seg -> on-device
    landmarks -> both estimators -> one-for-all NST -> composite -> post
    estimators, reference iris_style_transfer_openeds2020.py:64-156) under
    batch sharding must match unsharded execution (round-4 VERDICT
    next-step #6: the 2020 step had no virtual-mesh equivalence coverage,
    unlike the 2019 IST step)."""
    from iris_style_transfer_tpu.data.synthetic import synthetic_eye_batch
    from iris_style_transfer_tpu.models import (
        EfficientNet,
        GazeEstimator1,
        GazeEstimator2,
    )
    from iris_style_transfer_tpu.ops.image import gray_to_rgb
    from iris_style_transfer_tpu.pipelines import composite_batch, extract_iris_batch

    mesh = make_mesh()
    key = jax.random.PRNGKey(11)
    eff_params = EfficientNet.init(key)
    g1_params = GazeEstimator1.init(jax.random.fold_in(key, 1))
    g2_params = GazeEstimator2.init(jax.random.fold_in(key, 2), extract_feature=True)
    vgg_params = VGG19.init(jax.random.fold_in(key, 3))
    imgs, _, _ = synthetic_eye_batch(8, height=48, width=64, seed=3)

    nst_fn = make_nst_fn(epochs=2)

    @jax.jit
    def gaze_step(eff_params, g1_params, g2_params, vgg_params, frames):
        segs = EfficientNet.apply(eff_params, frames)
        pre1 = GazeEstimator1.apply(g1_params, segs, extract_feature=True)
        pre2 = GazeEstimator2.apply(g2_params, gray_to_rgb(frames), extract_feature=True)
        irises, masks, bboxes = extract_iris_batch(frames, segs, 0.8, out_size=(32, 32))
        s_batch = jnp.broadcast_to(irises[:1], irises.shape)
        result = nst_fn(vgg_params, irises, s_batch)
        new_frames = composite_batch(frames, result.x, masks, bboxes)
        re_segs = EfficientNet.apply(eff_params, new_frames)
        post1 = GazeEstimator1.apply(g1_params, re_segs, extract_feature=True)
        return new_frames, pre1, pre2, post1

    want = gaze_step(eff_params, g1_params, g2_params, vgg_params, jnp.asarray(imgs))

    x_sh = jax.device_put(jnp.asarray(imgs), batch_sharding(mesh))
    got = gaze_step(
        shard_params(mesh, eff_params),
        shard_params(mesh, g1_params),
        shard_params(mesh, g2_params),
        shard_params(mesh, vgg_params),
        x_sh,
    )
    # pre-NST predictions are deterministic functions of per-sample data —
    # tight; the post-NST path crosses 2 L-BFGS steps where per-shard
    # reduction blocking differs by ulps (same story as the NST tests)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[2]), np.asarray(want[2]), atol=2e-4)
    df = np.abs(np.asarray(got[0]) - np.asarray(want[0]))
    assert df.mean() < 1e-3 and df.max() < 5e-2
    np.testing.assert_allclose(np.asarray(got[3]), np.asarray(want[3]), atol=2e-2)


@pytest.mark.slow
def test_dryrun_multichip():
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
