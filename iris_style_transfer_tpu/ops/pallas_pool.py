"""Pallas kernels: fused relu+max-pool forward/backward for the NST closure.

Motivation (round-3/4 traces, tools/perf_probe9.py): the relu+pool
boundary dominates the closure's non-conv time at BOTH serving configs —
XLA materializes two full-resolution 6-D upsampled broadcasts before a
select fusion, and the (B, H/2, 2, W/2, 2, C) intermediates tile at
2/8 sublanes x C/128 lanes (12.5% occupancy at block 1's C=64; ~10 ms of
the 44.2 ms bs64 closure against a ~1.3 ms HBM bound).  Pure-XLA
reformulations don't move it (perf_probe11 fusion: neutral; perf_probe24
strided slices: 0.63x; perf_probe25 channel packing: 0.70x), so these
kernels do each pass in one sweep over a LANE-FULL view:

    x  (B, H, W, C)  -->  transpose(1,2,0,3) + reshape  -->  (H, W, B*C)

The transposed view's default layout is byte-identical to the
``{3,0,2,1}`` layout XLA already stores these tensors in ([H][W][B][C]
minor-to-major), so the rearrangement is a bitcast, not a copy — and
B*C >= 128 fills the lanes at every block.

Round-4 generalization: the original kernel blocked on full-W strips,
whose VMEM working set made ``supported()`` False at the production bs64
config (B*C = 4096: one double-buffered strip set alone exceeds the
16 MB VMEM) — so the kernel had never actually run at the shape it was
built for.  The grid is now 3-D, tiling H-pairs, W-pairs AND the lane
dim (every op is elementwise in B*C), which makes the working set a free
parameter independent of shape.

    backward:  g = (x > 0) & (x == y_window)  ?  ct_window  :  0
    forward:   y = max(relu(x_window))

matching ``layers.relu_max_pool``'s tie-to-all semantics exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lane_view import VMEM_BUDGET, unview, view


def _bwd_kernel(x_ref, y_ref, ct_ref, g_ref):
    t2, u2, bcb = x_ref.shape  # (2T, 2U, BCB)
    t, u = t2 // 2, u2 // 2
    x6 = x_ref[:].reshape(t, 2, u, 2, bcb)
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
    # The f32 strip temporaries these workarounds allocate are priced
    # into _pick_blocks (they sank the full-W form at 512px in round 3).
    xf = x6.astype(jnp.float32)
    z = jnp.where(xf > 0.0, xf, jnp.full_like(xf, -1.0))
    yb = y_ref[:][:, None, :, None, :].astype(jnp.float32)
    ctb = ct_ref[:][:, None, :, None, :].astype(jnp.float32)
    g6 = ctb * (z == yb).astype(jnp.float32)
    g_ref[:] = g6.reshape(t2, u2, bcb).astype(g_ref.dtype)


def _fwd_kernel(x_ref, y_ref):
    t2, u2, bcb = x_ref.shape
    x6 = x_ref[:].reshape(t2 // 2, 2, u2 // 2, 2, bcb).astype(jnp.float32)
    # max over the 2x2 window via explicit pairs (no reduce over interior
    # dims), relu folded as max with 0
    a = jnp.maximum(x6[:, 0, :, 0, :], x6[:, 0, :, 1, :])
    b = jnp.maximum(x6[:, 1, :, 0, :], x6[:, 1, :, 1, :])
    y_ref[:] = jnp.maximum(jnp.maximum(a, b), 0.0).astype(y_ref.dtype)


def _pick_blocks(
    h: int, w: int, bc: int, itemsize: int, stack_f32: int
) -> tuple[int, int, int] | None:
    """(t, u, bcb): pooled rows / pooled cols / lanes per grid step.

    Budget: the x and g blocks (2t, 2u, bcb) and pooled blocks
    (t, u, bcb), double-buffered by the Pallas pipeline, plus
    ``stack_f32`` block-sized f32 temporaries from the Mosaic compare
    workaround, must fit VMEM_BUDGET.  Prefer large lane blocks (DMA
    efficiency), then tall/wide blocks.

    Pallas TPU constraint: the last two dims of every block must be
    (8, 128)-divisible OR span the full array dim — bcb is always a
    128-multiple, so this binds u (and 2u): multiples of 8, or the full
    pooled width."""
    w2 = w // 2
    u_opts = [w2] + [u for u in (64, 32, 16, 8) if u < w2 and w2 % u == 0]
    for bcb in (1024, 512, 256, 128):
        if bc % bcb:
            continue
        for u in u_opts:
            for t in (8, 4, 2, 1):
                if (h // 2) % t:
                    continue
                big = 4 * t * u * bcb  # (2t, 2u, bcb) elements
                small = t * u * bcb
                work = 2 * (2 * big + 2 * small) * itemsize + stack_f32 * big * 4
                if work <= VMEM_BUDGET:
                    return t, u, bcb
    return None


@functools.partial(jax.jit, static_argnames=("blocks", "interpret"))
def _bwd_view(xv, yv, ctv, blocks: tuple[int, int, int], interpret: bool = False):
    h, w, bc = xv.shape
    t, u, bcb = blocks
    grid = ((h // 2) // t, (w // 2) // u, bc // bcb)
    return pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2 * t, 2 * u, bcb), lambda i, j, k: (i, j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, u, bcb), lambda i, j, k: (i, j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, u, bcb), lambda i, j, k: (i, j, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2 * t, 2 * u, bcb), lambda i, j, k: (i, j, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, bc), ctv.dtype),
        interpret=interpret,
    )(xv, yv, ctv)


@functools.partial(jax.jit, static_argnames=("blocks", "interpret"))
def _fwd_view(xv, blocks: tuple[int, int, int], interpret: bool = False):
    h, w, bc = xv.shape
    t, u, bcb = blocks
    grid = ((h // 2) // t, (w // 2) // u, bc // bcb)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2 * t, 2 * u, bcb), lambda i, j, k: (i, j, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, u, bcb), lambda i, j, k: (i, j, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h // 2, w // 2, bc), xv.dtype),
        interpret=interpret,
    )(xv)


# the backward's Mosaic workaround holds ~4 block-sized f32 temporaries
# (xf, z, the mask, g6); the forward ~3 (x6f, two pair maxima)
_BWD_STACK_F32 = 4
_FWD_STACK_F32 = 3


def supported(x_shape: tuple[int, ...], window: int, itemsize: int = 2) -> bool:
    """Kernel applicability: 2x2 non-overlap pooling on even dims, lane
    dim (B*C) a multiple of 128, a VMEM-feasible block, TPU."""
    if window != 2 or len(x_shape) != 4:
        return False
    b, h, w, c = x_shape
    return (
        jax.default_backend() == "tpu"
        and h % 2 == 0
        and w % 2 == 0
        and (b * c) % 128 == 0
        and _pick_blocks(h, w, b * c, itemsize, _BWD_STACK_F32) is not None
    )


def relu_pool_bwd(
    x: jax.Array, y: jax.Array, ct: jax.Array, interpret: bool = False
) -> jax.Array:
    """Gradient of ``max_pool(relu(x), 2)`` given the forward's input x,
    pooled output y and the pooled cotangent ct; tie-to-all semantics.

    Layout note: the (B,H,W,C)->(H,W,B*C) rearrangement is a bitcast
    when the operand layout is XLA's choice ``{3,0,2,1}``; on other
    layouts XLA inserts real transposes and the caller's cost model
    (perf_probe14/26) decides whether the kernel still wins.
    """
    b, h, w, c = x.shape
    blocks = _pick_blocks(h, w, b * c, x.dtype.itemsize, _BWD_STACK_F32)
    assert blocks is not None, "caller must gate on supported()"
    gv = _bwd_view(view(x), view(y), view(ct), blocks=blocks, interpret=interpret)
    return unview(gv, b)


def relu_pool_fwd(x: jax.Array, interpret: bool = False) -> jax.Array:
    """``max_pool(relu(x), 2)`` in one lane-full pass (the XLA form
    materializes the relu output and a 6-D windowed view whose minor
    (2, C) dims tile at low occupancy)."""
    b, h, w, c = x.shape
    blocks = _pick_blocks(h, w, b * c, x.dtype.itemsize, _FWD_STACK_F32)
    assert blocks is not None, "caller must gate on supported()"
    yv = _fwd_view(view(x), blocks=blocks, interpret=interpret)
    return unview(yv, b)
