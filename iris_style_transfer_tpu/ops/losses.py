"""NST loss functions with the reference's exact numerical conventions.

Reference: ``utils.py:259-355``
  * ContentLoss_L2  — ``0.5 * sum_i w_i * mse(p_i, t_i)``  (mse = mean)
  * StyleLoss_Gram  — ``0.25 * sum_i w_i * sum((G(p_i) - G(t_i))**2)``
  * StyleLoss_BN    — ``sum_i w_i * sum((mu_p-mu_t)^2 + (sd_p-sd_t)^2)/C_i``
                      with per-channel spatial mean and *Bessel-corrected*
                      std (``torch.std`` default, ``utils.py:337-338,353``).

Targets are precomputed once (as in ``pipelines.py:62-68``): Gram matrices
for the Gram loss, (mean, std) pairs for the BN loss.  All reductions
accumulate in float32.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from .gram import gram_matrix


def _weights(weights: Sequence[float] | None, n: int) -> Sequence[float]:
    return [1.0] * n if weights is None else list(weights)


def content_loss_l2(
    preds: Sequence[jax.Array],
    targets: Sequence[jax.Array],
    weights: Sequence[float] | None = None,
) -> jax.Array:
    """0.5 * sum_i w_i * mean((p_i - t_i)^2); reference ``utils.py:276-290``."""
    ws = _weights(weights, len(targets))
    loss = jnp.float32(0.0)
    for p, t, w in zip(preds, targets, ws):
        d = p.astype(jnp.float32) - t.astype(jnp.float32)
        loss = loss + jnp.mean(d * d) * w
    return loss * 0.5


def style_loss_gram(
    preds: Sequence[jax.Array],
    target_grams: Sequence[jax.Array],
    weights: Sequence[float] | None = None,
    gram_fn=gram_matrix,
) -> jax.Array:
    """0.25 * sum_i w_i * sum((G(p_i) - G_t_i)^2); reference
    ``utils.py:308-322``.  ``target_grams`` are precomputed via
    :func:`gram_matrix` (batched convention).  ``gram_fn`` lets callers
    substitute the Pallas blockwise kernel for large spatial extents."""
    ws = _weights(weights, len(target_grams))
    loss = jnp.float32(0.0)
    for p, gt, w in zip(preds, target_grams, ws):
        g = gram_fn(p).astype(jnp.float32)
        d = g - gt.astype(jnp.float32)
        loss = loss + jnp.sum(d * d) * w
    return loss * 0.25


def style_stats(feat: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-channel spatial (mean, std) of (B, H, W, C) features -> (B, C).

    std is Bessel-corrected (ddof=1) to match ``torch.std``
    (``utils.py:337-338``); computed in float32.

    One fused pass (sum + sum-of-squares) instead of mean-then-var: the
    taps are the large early-layer activations (up to (B, 512, 512, 64) at
    the 512px north star), and the two-pass form reads them from HBM twice
    per loss evaluation (~2 ms/step measured at that config).  Post-ReLU
    activations have mean ~ std, so E[x^2] - E[x]^2 cancellation is benign
    in f32 accumulation.
    """
    f = feat.astype(jnp.float32)
    n = feat.shape[-3] * feat.shape[-2]
    s1 = jnp.sum(f, axis=(-3, -2))
    s2 = jnp.sum(f * f, axis=(-3, -2))
    return stats_from_sums(s1, s2, n)


def stats_from_sums(s1: jax.Array, s2: jax.Array, n: int) -> tuple[jax.Array, jax.Array]:
    """(mean, Bessel std) from f32 (sum, sum-of-squares) over n elements —
    the conversion half of :func:`style_stats`, shared with the fused
    relu+stats tap op (``models/layers.py:relu_stats``)."""
    mean = s1 / n
    var = jnp.maximum(s2 - n * mean * mean, 0.0) / (n - 1)
    return mean, jnp.sqrt(var)


def style_loss_bn_stats(
    pred_stats: Sequence[tuple[jax.Array, jax.Array]],
    target_stats: Sequence[tuple[jax.Array, jax.Array]],
    weights: Sequence[float] | None = None,
) -> jax.Array:
    """:func:`style_loss_bn` on PRECOMPUTED per-tap (mean, std) pairs —
    used when the VGG forward already produced the statistics via the
    fused relu+stats tap (``stats_taps``); same numerical convention as
    the reference (``utils.py:341-355``)."""
    ws = _weights(weights, len(target_stats))
    loss = jnp.float32(0.0)
    for (p_mean, p_std), (t_mean, t_std), w in zip(pred_stats, target_stats, ws):
        c = p_mean.shape[-1]
        term = jnp.sum((p_mean - t_mean) ** 2 + (p_std - t_std) ** 2)
        loss = loss + term * (w / c)
    return loss


def style_loss_bn(
    preds: Sequence[jax.Array],
    target_stats: Sequence[tuple[jax.Array, jax.Array]],
    weights: Sequence[float] | None = None,
) -> jax.Array:
    """sum_i w_i * sum_{b,c}((mu_p-mu_t)^2 + (sd_p-sd_t)^2) / C_i;
    reference ``utils.py:341-355``."""
    ws = _weights(weights, len(target_stats))
    loss = jnp.float32(0.0)
    for p, (t_mean, t_std), w in zip(preds, target_stats, ws):
        p_mean, p_std = style_stats(p)
        c = p_mean.shape[-1]
        term = jnp.sum((p_mean - t_mean) ** 2 + (p_std - t_std) ** 2)
        loss = loss + term * (w / c)
    return loss
