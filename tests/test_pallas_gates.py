"""Sharding-aware Pallas dispatch gates (round-3 VERDICT weak #3).

A ``pallas_call`` has no SPMD partitioning rule: under a model-sharded
(spatial H-sharded) mesh XLA replicates its operands around the kernel —
correct but a silent perf cliff on a first-class flag combination
(``--pallas_gram`` x ``--model_parallel``).  ``make_nst_fn(model_sharded=
True)`` must therefore resolve BOTH Pallas gates (blockwise Gram, fused
relu+stats) to their numerically-identical XLA forms, even when the flag
requested the kernel explicitly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import sys

from iris_style_transfer_tpu.models import VGG19
import iris_style_transfer_tpu.transfer.nst  # noqa: F401 - registers the submodule

# the package re-exports the nst FUNCTION under the submodule's name; grab
# the module itself for make_nst_fn / cached_nst_program
nst = sys.modules["iris_style_transfer_tpu.transfer.nst"]


@pytest.fixture(scope="module")
def vgg_params():
    return VGG19.init(jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
    s = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
    return c, s


def _count_pallas_gram_calls(monkeypatch, vgg_params, imgs, **kw):
    """Build + run a tiny Gram-loss NST with gram_matrix_pallas wrapped in
    a call recorder that delegates to the XLA form (so the program always
    executes, CPU backend included)."""
    from iris_style_transfer_tpu.ops import gram as gram_mod
    from iris_style_transfer_tpu.ops import pallas_gram as pg_mod

    calls = []

    def recorder(f, **kwargs):
        calls.append(f.shape)
        return gram_mod.gram_matrix(f)

    monkeypatch.setattr(pg_mod, "gram_matrix_pallas", recorder)
    c, s = imgs
    fn = nst.make_nst_fn(epochs=2, bn_loss=False, **kw)
    res = jax.jit(fn)(vgg_params, c, s)
    assert np.isfinite(np.asarray(res.s_loss_hist)).all()
    return len(calls)


def test_explicit_pallas_gram_is_used_when_unsharded(monkeypatch, vgg_params, imgs):
    n = _count_pallas_gram_calls(
        monkeypatch, vgg_params, imgs, pallas_gram=True, model_sharded=False
    )
    assert n > 0  # the recorder actually intercepts the kernel dispatch


def test_model_sharded_forces_xla_gram(monkeypatch, vgg_params, imgs):
    # even an EXPLICIT pallas_gram=True resolves to the XLA form: the two
    # are numerically identical and the kernel has no SPMD rule
    n = _count_pallas_gram_calls(
        monkeypatch, vgg_params, imgs, pallas_gram=True, model_sharded=True
    )
    assert n == 0


def test_model_sharded_forces_classic_stats_taps(monkeypatch, vgg_params, imgs):
    """stats_taps=True under model_sharded must fall back to full-tensor
    style taps (classic ``style_stats`` path) — VGG19.apply must never be
    built with stats_taps=True."""
    seen = []
    real_apply = VGG19.apply

    def spy(params, x, **kw):
        seen.append(bool(kw.get("stats_taps", False)))
        return real_apply(params, x, **kw)

    monkeypatch.setattr(VGG19, "apply", staticmethod(spy))
    c, s = imgs
    fn = nst.make_nst_fn(epochs=2, stats_taps=True, model_sharded=True)
    res = jax.jit(fn)(vgg_params, c, s)
    assert np.isfinite(np.asarray(res.s_loss_hist)).all()
    assert seen and not any(seen)

    # control: unsharded explicit stats_taps=True does reach VGG19.apply
    seen.clear()
    fn = nst.make_nst_fn(epochs=2, stats_taps=True, model_sharded=False)
    jax.jit(fn)(vgg_params, c, s)
    assert any(seen)


def test_model_sharded_forces_composed_relu_pool(monkeypatch, vgg_params, imgs):
    """FUSE_RELU_POOL=True under model_sharded must resolve to the composed
    relu + max_pool path: relu_max_pool's Pallas dispatch
    (layers._relu_max_pool_fwd) has no SPMD rule either, so VGG19.apply
    must be built with fuse_relu_pool=False (round-4 ADVICE item 2)."""
    from iris_style_transfer_tpu.models import layers as L

    seen = []
    real_apply = VGG19.apply

    def spy(params, x, **kw):
        seen.append(kw.get("fuse_relu_pool", None))
        return real_apply(params, x, **kw)

    monkeypatch.setattr(VGG19, "apply", staticmethod(spy))
    monkeypatch.setattr(L, "FUSE_RELU_POOL", True)
    c, s = imgs
    fn = nst.make_nst_fn(epochs=2, model_sharded=True)
    res = jax.jit(fn)(vgg_params, c, s)
    assert np.isfinite(np.asarray(res.s_loss_hist)).all()
    assert seen and all(v is False for v in seen)

    # control: unsharded defers to the module flag (None)
    seen.clear()
    fn = nst.make_nst_fn(epochs=2, model_sharded=False)
    jax.jit(fn)(vgg_params, c, s)
    assert seen and all(v is None for v in seen)


def test_cached_program_keys_on_model_sharded():
    a = nst.cached_nst_program(2, 1.0, 1.0, "float32", model_sharded=False)
    b = nst.cached_nst_program(2, 1.0, 1.0, "float32", model_sharded=True)
    assert a is not b
    assert a is nst.cached_nst_program(2, 1.0, 1.0, "float32", model_sharded=False)
