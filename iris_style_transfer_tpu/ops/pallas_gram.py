"""Blockwise Gram accumulation as a Pallas TPU kernel.

Motivation (SURVEY.md §5.7): at the 512px north-star resolution the relu1_1
style features are (B, 512, 512, 64) — the Gram contraction reads ~64MB of
activations per image to produce a 64x64 matrix.  XLA emits one large dot;
this kernel streams HW tiles HBM->VMEM and accumulates the (C, C) product
in a VMEM scratch accumulator, so the contraction is one pass over memory
with MXU-f32 accumulation and no intermediate materialization — the image
domain's stand-in for blockwise/ring attention.

Selected automatically by the NST engine (``make_nst_fn(pallas_gram=
"auto")``, the default) for Gram-loss runs on TPU when the tap's spatial
extent is >= 128x128; ``gram_matrix`` remains the XLA reference
implementation (the two are tested against each other), used on CPU, for
small extents, and for ragged tile sizes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gram_kernel(x_ref, o_ref, acc_ref, *, n_norm: float):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[0]  # (TILE_HW, C)
    acc_ref[:] += jax.lax.dot_general(
        x,
        x,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        o_ref[0] = acc_ref[:] * (1.0 / n_norm)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(1, 2, 3)
)
def gram_matrix_pallas(
    x: jax.Array,
    tile_hw: int = 2048,
    batched_norm: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Gram of (B, H, W, C) -> (B, C, C), f32; same convention as
    :func:`iris_style_transfer_tpu.ops.gram.gram_matrix`.  Differentiable:
    the VJP of G = X'X/n is dX = X (Gbar + Gbar') / n (one batched matmul).
    """
    return _gram_pallas_impl(x, tile_hw, batched_norm, interpret)


def _gram_fwd(x, tile_hw, batched_norm, interpret):
    return _gram_pallas_impl(x, tile_hw, batched_norm, interpret), x


def _gram_bwd(tile_hw, batched_norm, interpret, x, g_bar):
    b, h, w, c = x.shape
    n_norm = float(c * h * w if batched_norm else h * w)
    sym = (g_bar + jnp.swapaxes(g_bar, -1, -2)) / n_norm
    flat = x.reshape(b, h * w, c).astype(jnp.float32)
    dx = jnp.einsum("bnc,bcd->bnd", flat, sym).astype(x.dtype)
    return (dx.reshape(x.shape),)


gram_matrix_pallas.defvjp(_gram_fwd, _gram_bwd)


@functools.partial(jax.jit, static_argnames=("tile_hw", "batched_norm", "interpret"))
def _gram_pallas_impl(
    x: jax.Array,
    tile_hw: int = 2048,
    batched_norm: bool = True,
    interpret: bool = False,
) -> jax.Array:
    b, h, w, c = x.shape
    hw = h * w
    tile = min(tile_hw, hw)
    if hw % tile:
        # fall back to XLA for ragged spatial extents
        from .gram import gram_matrix

        return gram_matrix(x, batched_norm)
    flat = x.reshape(b, hw, c)
    n_norm = float(c * hw if batched_norm else hw)

    out = pl.pallas_call(
        functools.partial(_gram_kernel, n_norm=n_norm),
        grid=(b, hw // tile),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, c, c), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hw * c * c,
            bytes_accessed=b * hw * c * x.dtype.itemsize + b * c * c * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(flat)
    return out
