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
