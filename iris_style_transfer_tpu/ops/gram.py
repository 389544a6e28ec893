"""Gram matrices for style features.

Reference: ``utils.GramMatrix`` (``utils.py:242-257``) — flattens H,W and
computes ``x @ x^T / n`` where ``n = x[0].numel()``.  For the batched input
used by ``StyleLoss_Gram`` inside ``nst()`` that normalizer is ``C*H*W``
(the batched convention; see SURVEY.md §2.1 losses row).

Here features are channel-last ``(B, H, W, C)``; the Gram contraction is a
single large matmul (HW x C)^T @ (HW x C), which XLA tiles directly onto the
MXU.  Accumulation is forced to float32 via ``preferred_element_type`` so
bfloat16 activations keep a stable Gram.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gram_matrix(x: jax.Array, batched_norm: bool = True) -> jax.Array:
    """Normalized Gram matrix of (B, H, W, C) features -> (B, C, C).

    ``batched_norm=True`` normalizes by C*H*W (the reference's batched
    convention); ``False`` normalizes by H*W (its unbatched convention for
    (C, HW) inputs).
    """
    b, h, w, c = x.shape
    flat = x.reshape(b, h * w, c)
    g = jax.lax.dot_general(
        flat,
        flat,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    n = (c * h * w) if batched_norm else (h * w)
    return g / jnp.asarray(n, dtype=g.dtype)
