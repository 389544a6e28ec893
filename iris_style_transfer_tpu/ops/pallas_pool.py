"""Pallas kernel: fused relu+max-pool backward for the NST closure.

Motivation (round-3 trace, tools/perf_probe9.py): at the 512px bs4
config the relu1_2+pool1 backward costs 3.97 ms/closure — XLA
materializes two full-resolution upsampled broadcasts before a select
fusion, and every op runs in the batch-in-sublanes layout it picks at
bs4 ((8, 128) vector registers 4/8 x 64/128 = 25% occupied).  Pure-XLA
reformulations don't move it (perf_probe11: exactly neutral), so this
kernel does the whole backward in one pass over a LANE-FULL view:

    x  (B, H, W, C)  -->  transpose(1,2,0,3) + reshape  -->  (H, W, B*C)

The transposed view's default layout is byte-identical to the
``{3,0,2,1}`` layout XLA already stores these tensors in ([H][W][B][C]
minor-to-major), so the rearrangement is a bitcast, not a copy — and
B*C = 256 fills both lane tiles.  The kernel reads an x strip, the
pooled max and pooled cotangent rows, and writes the gradient:

    g = (x > 0) & (x == y_window)  ?  ct_window  :  0

matching ``layers.relu_max_pool``'s tie-to-all semantics exactly.
Traffic: read 128+32+32 MB, write 128 MB = one bandwidth-bound pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lane_view import pick_rows, unview, view


def _bwd_kernel(x_ref, y_ref, ct_ref, g_ref):
    t2, w, bc = x_ref.shape  # (2T, W, BC)
    t, wp, _ = y_ref.shape  # (T, W/2, BC)
    x6 = x_ref[:].reshape(t, 2, wp, 2, bc)
    # Mosaic-compile constraints found on the real v5e (2026-08-18):
    #  - no bf16 vector cmpf ("Target does not support this comparison")
    #    -> compare in f32 (bf16->f32 is exact, predicates unchanged);
    #  - i1 masks born from singleton-broadcast comparisons carry
    #    replicated layouts that cannot be combined ("Invalid relayout:
    #    Non-singleton logical dimension is replicated in destination but
    #    not in source" on the `&`) -> use ONE comparison and fold the
    #    relu condition into the compared value: z = x>0 ? x : -1 never
    #    equals the pooled max y (y >= 0 always, and x==y<=0 must not
    #    keep), so `z == y` alone is the tie-to-all keep mask; apply it
    #    as a float multiply so no boolean ops remain.
    xf = x6.astype(jnp.float32)
    z = jnp.where(xf > 0.0, xf, jnp.full_like(xf, -1.0))
    yb = y_ref[:][:, None, :, None, :].astype(jnp.float32)
    ctb = ct_ref[:][:, None, :, None, :].astype(jnp.float32)
    g6 = ctb * (z == yb).astype(jnp.float32)
    g_ref[:] = g6.reshape(t2, w, bc).astype(g_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rows_per_step", "interpret"))
def _bwd_view(xv: jax.Array, yv: jax.Array, ctv: jax.Array, rows_per_step: int = 4,
              interpret: bool = False):
    """(H, W, BC) view backward; rows_per_step = pooled rows per grid step."""
    h, w, bc = xv.shape
    t = rows_per_step
    grid = ((h // 2) // t,)
    return pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2 * t, w, bc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, w // 2, bc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, w // 2, bc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2 * t, w, bc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((h, w, bc), ctv.dtype),
        interpret=interpret,
    )(xv, yv, ctv)


def _pick_t(h: int, w: int, bc: int, itemsize: int) -> int | None:
    """Pooled rows per grid step: the kernel holds the (2t, w, bc) x and
    g strips plus two (t, w/2, bc) pooled strips = 2.5 strip-equivalents
    (round up to 3), each double-buffered, PLUS ~4 strip-sized f32 stack
    temporaries from the Mosaic-compile workaround (xf, z, the mask as
    f32, g6) — budget the whole working set against VMEM
    (``lane_view.pick_rows``); without the bound, larger shapes fail at
    compile time ("Scoped allocation ... exceeded scoped vmem limit")
    instead of falling back to XLA."""
    return pick_rows(h // 2, w, bc, itemsize, row_scale=2, n_strips=3, stack_f32=4)


def supported(x_shape: tuple[int, ...], window: int, itemsize: int = 2) -> bool:
    """Kernel applicability: 2x2 non-overlap pooling on even dims, lane
    dim (B*C) a multiple of 128, a VMEM-feasible strip height, TPU."""
    if window != 2 or len(x_shape) != 4:
        return False
    b, h, w, c = x_shape
    return (
        jax.default_backend() == "tpu"
        and h % 8 == 0
        and w % 2 == 0
        and (b * c) % 128 == 0
        and _pick_t(h, w, b * c, itemsize) is not None
    )


def relu_pool_bwd(
    x: jax.Array, y: jax.Array, ct: jax.Array, interpret: bool = False
) -> jax.Array:
    """Gradient of ``max_pool(relu(x), 2)`` given the forward's input x,
    pooled output y and the pooled cotangent ct; tie-to-all semantics.

    Layout note: the (B,H,W,C)->(H,W,B*C) rearrangement is a bitcast
    when the operand layout is XLA's bs4 choice ``{3,0,2,1}``; on other
    layouts XLA inserts real transposes and the caller's cost model
    (perf_probe14) decides whether the kernel still wins.
    """
    b, h, w, c = x.shape
    t = _pick_t(h, w, b * c, x.dtype.itemsize)
    assert t is not None, "caller must gate on supported()"
    gv = _bwd_view(view(x), view(y), view(ct), rows_per_step=t, interpret=interpret)
    return unview(gv, b)
