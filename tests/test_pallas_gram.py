"""Pallas Gram kernel vs the XLA reference (interpreter mode on CPU)."""

import numpy as np

import jax.numpy as jnp

from iris_style_transfer_tpu.ops.gram import gram_matrix
from iris_style_transfer_tpu.ops.pallas_gram import gram_matrix_pallas


def test_pallas_gram_matches_xla_interpret():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 128)).astype(np.float32))
    got = np.asarray(gram_matrix_pallas(x, tile_hw=64, interpret=True))
    want = np.asarray(gram_matrix(x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_gram_ragged_fallback():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 7, 9, 32)).astype(np.float32))  # 63 px
    got = np.asarray(gram_matrix_pallas(x, tile_hw=16, interpret=True))
    want = np.asarray(gram_matrix(x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_gram_gradient_matches_xla():
    import jax

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 128)).astype(np.float32))
    tgt = jnp.asarray(rng.standard_normal((2, 128, 128)).astype(np.float32))

    def loss_pallas(x):
        g = gram_matrix_pallas(x, 32, True, True)
        return jnp.sum((g - tgt) ** 2)

    def loss_xla(x):
        g = gram_matrix(x)
        return jnp.sum((g - tgt) ** 2)

    gp = np.asarray(jax.grad(loss_pallas)(x))
    gx = np.asarray(jax.grad(loss_xla)(x))
    np.testing.assert_allclose(gp, gx, rtol=1e-3, atol=1e-3)
