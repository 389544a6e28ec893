"""Pallas kernels: fused relu+2x2-pool in the PAIRED-BITCAST view.

The round-5 "own layout" attack on the block-1 boundary (round-4 VERDICT
next-step #1).  Every prior formulation inherited a bad tensor layout at
its boundary:

* XLA's own 6-D reshape form tiles the (B, H/2, 2, W/2, 2, C)
  intermediates at 2/8 sublanes x 64/128 lanes = 12.5% vreg occupancy at
  block 1 (C = 64) — the bs64 trace prices pool1 fwd+bwd at
  ~15.7 ms/closure against a ~2 ms HBM bound (tools/perf_probe9.py).
* The lane-view Pallas kernels (``ops/pallas_pool.py``) fixed occupancy
  with an (H, W, B*C) view — but that view is only a bitcast in the bs4
  batch-in-sublanes layout; at bs64 XLA stores these tensors plain
  NHWC row-major, so the view costs REAL 411 MB transposes on both
  sides of each kernel (probe26: 0.84x).
* The pure-XLA paired regroup (``layers._max_pool2_paired``) had the
  right view but trusted XLA to lower it; XLA materializes relayouts
  instead (probe 2026-08-20: 0.74x at bs64).

This module keeps the paired view AND owns the lowering.  The view

    x (B, H, W, C)  -->  reshape  -->  (B, H, W/2, 2C)

is a PURE ROW-MAJOR RESHAPE of plain NHWC — a bitcast, no transpose at
any batch size — and it fuses each W-pair into the lane axis: at block 1
the minor dims become (112, 128), fully-occupied tiles.  Each lane of
the view is one (w%2, c) pair, so

    forward:   y[p, q, c] = max(relu(x[2p:2p+2, q, {c, C+c}]))
               = max over one sublane pair and one lane half-split
    backward:  g = (x > 0) & (x == y_bcast) ? ct_bcast : 0
               with y/ct lane-duplicated (concat) and row-paired

never touches a (2, C)-minor intermediate.  Gradient semantics match
``layers.relu_max_pool`` exactly (tie-to-all through the relu; the
``z = x>0 ? x : -1`` trick folds the relu predicate into one f32
comparison — the Mosaic constraints recorded in ``ops/pallas_pool.py``
apply here too).

Reference anchor: the pool these kernels serve is torch
``F.max_pool2d(relu(...))`` inside the VGG19 forward of the NST closure
(``/root/reference/pipelines.py:86-90``, ``models/vgg/vgg.py:56-92``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lane_view import VMEM_BUDGET

# Only shapes whose PAIRED lane dim (2C) is a 128-multiple qualify; the
# kernels are built for the one shape XLA mishandles (block 1, C = 64 —
# the only VGG pool whose natural lane dim is half-occupied).  Deeper
# pools (C >= 128) already tile lane-full in plain NHWC and measured
# neutral under every fused form (probe11/16); MAX_C gates them out of
# the dispatch so the flag can never select a shape it wasn't measured
# on.  Raise via tools/probe.py variants to measure other blocks.
MAX_C = 64


def _fwd_kernel(x_ref, y_ref):
    # x block (1, 2t, u, 2C), y block (1, t, u, C)
    t2, u, L = x_ref.shape[1:]
    t, c = t2 // 2, L // 2
    # f32 throughout: Mosaic on v5e rejects bf16 vector compares, and max
    # lowers to cmp+select (see ops/pallas_pool.py's compile log notes);
    # bf16->f32 is exact so numerics are unchanged
    x = x_ref[0].astype(jnp.float32).reshape(t, 2, u, L)
    xh = jnp.maximum(x[:, 0], x[:, 1])  # H-pair max  (t, u, 2C)
    xw = jnp.maximum(xh[..., :c], xh[..., c:])  # W-pair max (lane halves)
    y_ref[0] = jnp.maximum(xw, 0.0).astype(y_ref.dtype)


def _bwd_kernel(x_ref, y_ref, ct_ref, g_ref):
    t2, u, L = x_ref.shape[1:]
    t, c = t2 // 2, L // 2
    xf = x_ref[0].astype(jnp.float32)  # (2t, u, 2C)
    # fold the relu predicate into the compared value (one comparison,
    # no boolean combine — Mosaic i1 relayout limits, see pallas_pool):
    # z = x>0 ? x : -1 never equals y (y >= 0, and a kept x must be > 0)
    z = jnp.where(xf > 0.0, xf, jnp.full_like(xf, -1.0))
    y2 = y_ref[0].astype(jnp.float32)  # (t, u, C)
    ct2 = ct_ref[0].astype(jnp.float32)
    # lane-duplicate to both W-halves, then row-pair to both H rows
    yb = jnp.concatenate([y2, y2], axis=-1)[:, None]  # (t, 1, u, 2C)
    ctb = jnp.concatenate([ct2, ct2], axis=-1)[:, None]
    yb = jnp.broadcast_to(yb, (t, 2, u, L)).reshape(t2, u, L)
    ctb = jnp.broadcast_to(ctb, (t, 2, u, L)).reshape(t2, u, L)
    g = ctb * (z == yb).astype(jnp.float32)
    g_ref[0] = g.astype(g_ref.dtype)


# f32 strip temporaries the Mosaic workarounds hold live, in units of the
# (2t, u, 2C) x-block: fwd ~2 (xf, pair maxima); bwd ~5 (xf, z, yb, ctb,
# the product).  Priced into the block picker exactly like pallas_pool.
_FWD_STACK_F32 = 2
_BWD_STACK_F32 = 5


def _pick_blocks(h: int, w: int, c: int, itemsize: int, stack_f32: int):
    """(t, u): pooled rows and paired-cols per grid step.

    Block shapes: x/g (1, 2t, u, 2C), y/ct (1, t, u, C).  The last dim is
    the full lane span of its array (2C resp. C); u is the second-minor
    for all four, so it must be a multiple of 8 or the full W/2.  Budget:
    double-buffered blocks + f32 stack temps <= VMEM_BUDGET."""
    w2 = w // 2
    u_opts = [w2] + [u for u in (256, 128, 64, 32, 16, 8) if u < w2 and w2 % u == 0]
    for u in u_opts:
        for t in (32, 16, 8, 4, 2, 1):
            if (h // 2) % t:
                continue
            big = 2 * t * u * 2 * c  # x/g block elements
            small = t * u * c
            work = 2 * (2 * big + 2 * small) * itemsize + stack_f32 * big * 4
            if work <= VMEM_BUDGET:
                return t, u
    return None


def supported(x_shape: tuple[int, ...], window: int, itemsize: int = 2) -> bool:
    """2x2 non-overlap relu+pool on even dims with a lane-full paired
    view: 2C a 128-multiple, C <= MAX_C, a VMEM-feasible block, TPU."""
    if window != 2 or len(x_shape) != 4:
        return False
    b, h, w, c = x_shape
    return (
        jax.default_backend() == "tpu"
        and h % 2 == 0
        and w % 2 == 0
        and (2 * c) % 128 == 0
        and c <= MAX_C
        and _pick_blocks(h, w, c, itemsize, _BWD_STACK_F32) is not None
    )


@functools.partial(jax.jit, static_argnames=("blocks", "interpret"))
def _fwd_call(xp, blocks, interpret: bool = False):
    b, h, w2, L = xp.shape
    t, u = blocks
    grid = (b, (h // 2) // t, w2 // u)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2 * t, u, L), lambda i, j, k: (i, j, k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, u, L // 2), lambda i, j, k: (i, j, k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, w2, L // 2), xp.dtype),
        interpret=interpret,
    )(xp)


@functools.partial(jax.jit, static_argnames=("blocks", "interpret"))
def _bwd_call(xp, y, ct, blocks, interpret: bool = False):
    b, h, w2, L = xp.shape
    t, u = blocks
    grid = (b, (h // 2) // t, w2 // u)
    pooled = pl.BlockSpec((1, t, u, L // 2), lambda i, j, k: (i, j, k, 0),
                          memory_space=pltpu.VMEM)
    full = pl.BlockSpec((1, 2 * t, u, L), lambda i, j, k: (i, j, k, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[full, pooled, pooled],
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct((b, h, w2, L), ct.dtype),
        interpret=interpret,
    )(xp, y, ct)


def relu_pool_fwd(x: jax.Array, interpret: bool = False) -> jax.Array:
    """``max_pool(relu(x), 2)`` in one pass over the paired-bitcast view
    (no transpose at any batch size; lane-full at C = 64)."""
    b, h, w, c = x.shape
    blocks = _pick_blocks(h, w, c, x.dtype.itemsize, _FWD_STACK_F32)
    assert blocks is not None, "caller must gate on supported()"
    xp = x.reshape(b, h, w // 2, 2 * c)  # row-major bitcast
    yp = _fwd_call(xp, blocks, interpret=interpret)
    # yp (B, H/2, W/2, C): the pooled-W index is yp's third axis and the
    # channel its lanes — ALREADY the natural NHWC pooled tensor
    return yp


def relu_pool_bwd(
    x: jax.Array, y: jax.Array, ct: jax.Array, interpret: bool = False
) -> jax.Array:
    """Gradient of ``max_pool(relu(x), 2)`` from the forward input x,
    pooled output y and pooled cotangent ct; tie-to-all-through-relu
    semantics identical to ``layers.relu_max_pool``."""
    b, h, w, c = x.shape
    blocks = _pick_blocks(h, w, c, x.dtype.itemsize, _BWD_STACK_F32)
    assert blocks is not None, "caller must gate on supported()"
    xp = x.reshape(b, h, w // 2, 2 * c)
    gp = _bwd_call(xp, y, ct.astype(x.dtype), blocks, interpret=interpret)
    return gp.reshape(b, h, w, c)


# ---------------------------------------------------------------------------
# Transposed-domain kernels — the second round-5 formulation.
#
# The paired-view kernels above measured 0.937x at bs64 / 0.978x at 512px
# (2026-08-20, tools/probe.py nst): the probe9 trace shows the kernels
# themselves BEAT XLA's forms ~6x (bwd custom-call 1.83 ms vs 10.1, fwd
# 0.92 vs 5.6) but the win is eaten by ~7 ms/closure of layout copies at
# the custom-call boundary plus a de-fused relu1_1 backward (+4.95 ms):
# XLA's preferred layout for every block-1 tensor at bs64 is {2,3,1,0}
# — physically (B, H, C, W), W in lanes — while a pallas_call forces
# default row-major operands, and the "bitcast" paired view is a real
# repack of that physical layout.
#
# The fix is to hand the kernel operands whose DEFAULT layout IS the
# physical truth: logically transpose every operand to (B, H, C, W)
# (XLA lowers transpose-into-matching-layout as a bitcast) and do the
# W-pair work in-register behind the minor-dims transpose unit, which
# Mosaic supports natively (capability probes 2026-08-20: minor 2-D/3-D
# transposes and sublane-pair reshape max compile and are exact; strided
# lane slices and jnp.repeat do not).
# ---------------------------------------------------------------------------


def _fwd_kernel_t(x_ref, y_ref):
    # x block (1, 2t, C, W), y block (1, t, C, W/2)
    t2, c, w = x_ref.shape[1:]
    t = t2 // 2
    x = x_ref[0].astype(jnp.float32).reshape(t, 2, c, w)
    xh = jnp.maximum(x[:, 0], x[:, 1])  # H-pair max (t, C, W)
    xT = jnp.swapaxes(xh, 1, 2)  # (t, W, C) — transpose unit
    xw = jnp.max(xT.reshape(t, w // 2, 2, c), axis=2)  # W-pair (sublanes)
    y = jnp.maximum(xw, 0.0)
    y_ref[0] = jnp.swapaxes(y, 1, 2).astype(y_ref.dtype)  # (t, C, W/2)


def _expand_t(p, t, c, w):
    """(t, C, W/2) pooled -> (2t, C, W) full broadcast: lane interleave
    via transpose + sublane duplicate, then H-pair duplicate."""
    pT = jnp.swapaxes(p, 1, 2)  # (t, W/2, C)
    pW = jnp.broadcast_to(pT[:, :, None, :], (t, w // 2, 2, c)).reshape(t, w, c)
    pF = jnp.swapaxes(pW, 1, 2)  # (t, C, W)
    return jnp.broadcast_to(pF[:, None], (t, 2, c, w)).reshape(2 * t, c, w)


def _bwd_kernel_t(x_ref, y_ref, ct_ref, g_ref):
    t2, c, w = x_ref.shape[1:]
    t = t2 // 2
    xf = x_ref[0].astype(jnp.float32)
    z = jnp.where(xf > 0.0, xf, jnp.full_like(xf, -1.0))
    yb = _expand_t(y_ref[0].astype(jnp.float32), t, c, w)
    ctb = _expand_t(ct_ref[0].astype(jnp.float32), t, c, w)
    g = ctb * (z == yb).astype(jnp.float32)
    g_ref[0] = g.astype(g_ref.dtype)


# transposed-domain stack temps (f32, in x-block units): fwd ~3 (xf, xh,
# the transposed pair); bwd ~6 (xf, z, yb, ctb, mask-product, g)
_FWD_T_STACK_F32 = 3
_BWD_T_STACK_F32 = 6


def _pick_t(h: int, w: int, c: int, itemsize: int, stack_f32: int):
    """t: pooled rows per grid step; blocks always span full (C, W)."""
    for t in (16, 8, 4, 2, 1):
        if (h // 2) % t:
            continue
        big = 2 * t * c * w
        small = t * c * (w // 2)
        work = 2 * (2 * big + 2 * small) * itemsize + stack_f32 * big * 4
        if work <= VMEM_BUDGET:
            return t
    return None


def supported_t(x_shape: tuple[int, ...], window: int, itemsize: int = 2) -> bool:
    if window != 2 or len(x_shape) != 4:
        return False
    b, h, w, c = x_shape
    return (
        jax.default_backend() == "tpu"
        and h % 2 == 0
        and w % 2 == 0
        and c % 8 == 0  # sublane dim of the transposed blocks
        and c <= MAX_C
        and _pick_t(h, w, c, itemsize, _BWD_T_STACK_F32) is not None
    )


@functools.partial(jax.jit, static_argnames=("t", "interpret"))
def _fwd_call_t(xt, t, interpret: bool = False):
    b, h, c, w = xt.shape
    grid = (b, (h // 2) // t)
    return pl.pallas_call(
        _fwd_kernel_t,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2 * t, c, w), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, c, w // 2), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, c, w // 2), xt.dtype),
        interpret=interpret,
    )(xt)


@functools.partial(jax.jit, static_argnames=("t", "interpret"))
def _bwd_call_t(xt, yt, ctt, t, interpret: bool = False):
    b, h, c, w = xt.shape
    grid = (b, (h // 2) // t)
    full = pl.BlockSpec((1, 2 * t, c, w), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    pooled = pl.BlockSpec((1, t, c, w // 2), lambda i, j: (i, j, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bwd_kernel_t,
        grid=grid,
        in_specs=[full, pooled, pooled],
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct((b, h, c, w), ctt.dtype),
        interpret=interpret,
    )(xt, yt, ctt)


def relu_pool_fwd_t(x: jax.Array, interpret: bool = False) -> jax.Array:
    """``max_pool(relu(x), 2)`` with every custom-call operand logically
    (B, H, C, W): the outer transposes are BITCASTS of XLA's preferred
    {2,3,1,0} block-1 layout, so no copy crosses the kernel boundary."""
    b, h, w, c = x.shape
    t = _pick_t(h, w, c, x.dtype.itemsize, _FWD_T_STACK_F32)
    assert t is not None, "caller must gate on supported_t()"
    xt = jnp.swapaxes(x, 2, 3)
    yt = _fwd_call_t(xt, t, interpret=interpret)
    return jnp.swapaxes(yt, 2, 3)


def relu_pool_bwd_t(
    x: jax.Array, y: jax.Array, ct: jax.Array, interpret: bool = False
) -> jax.Array:
    """Transposed-domain gradient of ``max_pool(relu(x), 2)``; semantics
    identical to :func:`relu_pool_bwd`."""
    b, h, w, c = x.shape
    t = _pick_t(h, w, c, x.dtype.itemsize, _BWD_T_STACK_F32)
    assert t is not None, "caller must gate on supported_t()"
    xt = jnp.swapaxes(x, 2, 3)
    yt = jnp.swapaxes(y, 2, 3)
    ctt = jnp.swapaxes(ct.astype(x.dtype), 2, 3)
    gt = _bwd_call_t(xt, yt, ctt, t, interpret=interpret)
    return jnp.swapaxes(gt, 2, 3)


# ---------------------------------------------------------------------------
# Lane-paired-view kernels — the third and winning round-5 formulation.
#
# The transposed-domain kernels above ALSO measured 0.935x at bs64: their
# trace still shows 5.1 ms/closure of copies, because the assumption
# behind them was wrong.  The optimized HLO (2026-08-20, nst_hlo dump)
# shows XLA's layout for every bf16 block-1 activation at BOTH serving
# configs is ``{3,0,2,1:T(8,128)(2,1)}`` — physically [H][W][B][C],
# batch-in-sublanes — not {2,3,1,0}.  The view that bitcasts THAT layout
# is the lane view, W-PAIRED into the lane axis:
#
#     x (B,H,W,C) --transpose(1,2,0,3)+reshape--> (H, W/2, 2*B*C)
#
# where lane m = (w%2)*BC + b*C + c: the W-pair split is a lane-half
# split at BC (a 128-multiple), every op is lane-aligned, and a compiled
# probe of this exact pattern shows ZERO copies — the view lowers as
# ``bitcast`` straight into the custom call (tools note: the round-4
# lane-view kernels used the UNPAIRED (H, W, B*C) view, which forced the
# W-pair work back into low-occupancy (2, bcb)-minor in-kernel slices;
# pairing in the VIEW removes that too).
# ---------------------------------------------------------------------------


def _fwd_kernel_l(x_ref, y_ref):
    # x block (2t, u, 2BC), y block (t, u, BC)
    t2, u, L = x_ref.shape
    t, bc = t2 // 2, L // 2
    x = x_ref[...].astype(jnp.float32).reshape(t, 2, u, L)
    xh = jnp.maximum(x[:, 0], x[:, 1])  # H-pair max (t, u, 2BC)
    xw = jnp.maximum(xh[..., :bc], xh[..., bc:])  # W-pair (lane halves)
    y_ref[...] = jnp.maximum(xw, 0.0).astype(y_ref.dtype)


def _bwd_kernel_l(x_ref, y_ref, ct_ref, g_ref):
    t2, u, L = x_ref.shape
    t, bc = t2 // 2, L // 2
    xf = x_ref[...].astype(jnp.float32)
    z = jnp.where(xf > 0.0, xf, jnp.full_like(xf, -1.0))
    y2 = y_ref[...].astype(jnp.float32)
    ct2 = ct_ref[...].astype(jnp.float32)
    yb = jnp.concatenate([y2, y2], axis=-1)[:, None]  # (t, 1, u, 2BC)
    ctb = jnp.concatenate([ct2, ct2], axis=-1)[:, None]
    yb = jnp.broadcast_to(yb, (t, 2, u, L)).reshape(t2, u, L)
    ctb = jnp.broadcast_to(ctb, (t, 2, u, L)).reshape(t2, u, L)
    g = ctb * (z == yb).astype(jnp.float32)
    g_ref[...] = g.astype(g_ref.dtype)


_FWD_L_STACK_F32 = 2
_BWD_L_STACK_F32 = 5


def _pick_l(h: int, w: int, bc2: int, itemsize: int, stack_f32: int):
    """(t, u): pooled rows / paired cols per grid step; lanes always span
    the full 2*B*C (the W-pair split needs both halves in-block).  Wide
    (sublane-tiled) u first — a u=1 block would put a single sublane per
    vreg — then as many row-pairs as the budget allows."""
    w2 = w // 2
    u_opts = [w2] + [u for u in (64, 32, 16, 8) if u < w2 and w2 % u == 0]
    for u in u_opts:
        for t in (8, 4, 2, 1):
            if (h // 2) % t:
                continue
            big = 2 * t * u * bc2
            small = t * u * (bc2 // 2)
            work = 2 * (2 * big + 2 * small) * itemsize + stack_f32 * big * 4
            if work <= VMEM_BUDGET:
                return t, u
    return None


def supported_l(x_shape: tuple[int, ...], window: int, itemsize: int = 2) -> bool:
    """Lane-paired applicability: 2x2 pool on even dims, 2*B*C a
    128-multiple (always true for B*C >= 64), a VMEM-feasible block,
    TPU.  No MAX_C gate: the view is lane-full at every block."""
    if window != 2 or len(x_shape) != 4:
        return False
    b, h, w, c = x_shape
    return (
        jax.default_backend() == "tpu"
        and h % 2 == 0
        and w % 2 == 0
        and (2 * b * c) % 128 == 0
        and c <= MAX_C
        and _pick_l(h, w, 2 * b * c, itemsize, _BWD_L_STACK_F32) is not None
    )


@functools.partial(jax.jit, static_argnames=("blocks", "interpret"))
def _fwd_call_l(xv, blocks, interpret: bool = False):
    h, w2, L = xv.shape
    t, u = blocks
    grid = ((h // 2) // t, w2 // u)
    return pl.pallas_call(
        _fwd_kernel_l,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2 * t, u, L), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, u, L // 2), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h // 2, w2, L // 2), xv.dtype),
        interpret=interpret,
    )(xv)


@functools.partial(jax.jit, static_argnames=("blocks", "interpret"))
def _bwd_call_l(xv, yv, ctv, blocks, interpret: bool = False):
    h, w2, L = xv.shape
    t, u = blocks
    grid = ((h // 2) // t, w2 // u)
    full = pl.BlockSpec((2 * t, u, L), lambda i, j: (i, j, 0),
                        memory_space=pltpu.VMEM)
    pooled = pl.BlockSpec((t, u, L // 2), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bwd_kernel_l,
        grid=grid,
        in_specs=[full, pooled, pooled],
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct((h, w2, L), ctv.dtype),
        interpret=interpret,
    )(xv, yv, ctv)


def _lane_paired_view(a: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (H, W/2, 2*B*C): a BITCAST of XLA's {3,0,2,1}
    activation layout (compile-verified: zero copies in the lowered HLO)."""
    b, h, w, c = a.shape
    return jnp.transpose(a, (1, 2, 0, 3)).reshape(h, w // 2, 2 * b * c)


def _lane_unview(v: jax.Array, b: int) -> jax.Array:
    """(H, W', BC) -> (B, H, W', C) for the pooled output (W' = W/2)."""
    h, w2, bcc = v.shape
    return jnp.transpose(v.reshape(h, w2, b, bcc // b), (2, 0, 1, 3))


def relu_pool_fwd_l(x: jax.Array, interpret: bool = False) -> jax.Array:
    """``max_pool(relu(x), 2)`` over the lane-paired bitcast view."""
    b, h, w, c = x.shape
    blocks = _pick_l(h, w, 2 * b * c, x.dtype.itemsize, _FWD_L_STACK_F32)
    assert blocks is not None, "caller must gate on supported_l()"
    yv = _fwd_call_l(_lane_paired_view(x), blocks, interpret=interpret)
    # yv (H/2, W/2, B*C): pooled natural tensor's own lane view
    return _lane_unview(yv, b)


def relu_pool_bwd_l(
    x: jax.Array, y: jax.Array, ct: jax.Array, interpret: bool = False
) -> jax.Array:
    """Lane-paired-view gradient of ``max_pool(relu(x), 2)``; semantics
    identical to :func:`relu_pool_bwd`."""
    b, h, w, c = x.shape
    blocks = _pick_l(h, w, 2 * b * c, x.dtype.itemsize, _BWD_L_STACK_F32)
    assert blocks is not None, "caller must gate on supported_l()"
    yv = jnp.transpose(y, (1, 2, 0, 3)).reshape(h // 2, w // 2, b * c)
    ctv = jnp.transpose(ct.astype(x.dtype), (1, 2, 0, 3)).reshape(
        h // 2, w // 2, b * c
    )
    gv = _bwd_call_l(_lane_paired_view(x), yv, ctv, blocks, interpret=interpret)
    return jnp.transpose(
        gv.reshape(h, w // 2, 2, b, c), (3, 0, 1, 2, 4)
    ).reshape(b, h, w, c)


# ---------------------------------------------------------------------------
# 4-D (H, W, B, C) "leading-dims" kernels — the fourth round-5 formulation.
#
# The lane-paired kernels still measured 0.930x: their trace shows XLA
# DID transpose conv1_2 to emit (H, W, B, C) directly (the producing
# convolution_add_fusion's output is bf16[224,224,64,64]) — but the 3-D
# RESHAPE (H, W, B, C) -> (H, W/2, 2BC) still materializes as real
# copies (2.7 + 2.4 + 2.2 ms/closure): merging the C-minor dim across
# tile boundaries changes the physical tiling.  So: no reshape at all.
# Operands stay 4-D (H, W, B, C) — the exact shape XLA already produces
# — and both pool pair-axes (H and W) are LEADING dims: every op in the
# kernel is a leading-dim reshape/slice/broadcast over untouched (B, C)
# minors.  No in-kernel transposes, rolls, or minor reshapes at all.
# ---------------------------------------------------------------------------


def _fwd_kernel_4d(x_ref, y_ref):
    # x block (2t, 2u, B, Cb), y block (t, u, B, Cb)
    t2, u2, bb, cb = x_ref.shape
    t, u = t2 // 2, u2 // 2
    x = x_ref[...].astype(jnp.float32).reshape(t, 2, u, 2, bb, cb)
    m = jnp.maximum(
        jnp.maximum(x[:, 0, :, 0], x[:, 0, :, 1]),
        jnp.maximum(x[:, 1, :, 0], x[:, 1, :, 1]),
    )
    y_ref[...] = jnp.maximum(m, 0.0).astype(y_ref.dtype)


def _bwd_kernel_4d(x_ref, y_ref, ct_ref, g_ref):
    t2, u2, bb, cb = x_ref.shape
    t, u = t2 // 2, u2 // 2
    xf = x_ref[...].astype(jnp.float32)
    z = jnp.where(xf > 0.0, xf, jnp.full_like(xf, -1.0)).reshape(
        t, 2, u, 2, bb, cb
    )
    y4 = y_ref[...].astype(jnp.float32)[:, None, :, None]  # (t,1,u,1,B,Cb)
    ct4 = ct_ref[...].astype(jnp.float32)[:, None, :, None]
    yb = jnp.broadcast_to(y4, (t, 2, u, 2, bb, cb))
    ctb = jnp.broadcast_to(ct4, (t, 2, u, 2, bb, cb))
    g = ctb * (z == yb).astype(jnp.float32)
    g_ref[...] = g.reshape(t2, u2, bb, cb).astype(g_ref.dtype)


_FWD_4D_STACK_F32 = 2
_BWD_4D_STACK_F32 = 5


def _pick_4d(h: int, w: int, b: int, c: int, itemsize: int, stack_f32: int):
    """(t, u): pooled rows/cols per grid step; (B, C) minors untouched."""
    for t in (8, 4, 2, 1):
        if (h // 2) % t:
            continue
        for u in (8, 4, 2, 1):
            if (w // 2) % u:
                continue
            big = 4 * t * u * b * c
            small = t * u * b * c
            work = 2 * (2 * big + 2 * small) * itemsize + stack_f32 * big * 4
            if work <= VMEM_BUDGET:
                return t, u
    return None


def supported_4d(x_shape: tuple[int, ...], window: int, itemsize: int = 2) -> bool:
    if window != 2 or len(x_shape) != 4:
        return False
    b, h, w, c = x_shape
    return (
        jax.default_backend() == "tpu"
        and h % 2 == 0
        and w % 2 == 0
        and b % 8 == 0  # sublane dim of the (B, C) minors
        and c <= MAX_C
        and _pick_4d(h, w, b, c, itemsize, _BWD_4D_STACK_F32) is not None
    )


@functools.partial(jax.jit, static_argnames=("blocks", "interpret"))
def _fwd_call_4d(xt, blocks, interpret: bool = False):
    h, w, b, c = xt.shape
    t, u = blocks
    grid = ((h // 2) // t, (w // 2) // u)
    return pl.pallas_call(
        _fwd_kernel_4d,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2 * t, 2 * u, b, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, u, b, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h // 2, w // 2, b, c), xt.dtype),
        interpret=interpret,
    )(xt)


@functools.partial(jax.jit, static_argnames=("blocks", "interpret"))
def _bwd_call_4d(xt, yt, ctt, blocks, interpret: bool = False):
    h, w, b, c = xt.shape
    t, u = blocks
    grid = ((h // 2) // t, (w // 2) // u)
    full = pl.BlockSpec((2 * t, 2 * u, b, c), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    pooled = pl.BlockSpec((t, u, b, c), lambda i, j: (i, j, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bwd_kernel_4d,
        grid=grid,
        in_specs=[full, pooled, pooled],
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct((h, w, b, c), ctt.dtype),
        interpret=interpret,
    )(xt, yt, ctt)


def relu_pool_fwd_4d(x: jax.Array, interpret: bool = False) -> jax.Array:
    """``max_pool(relu(x), 2)`` on 4-D (H, W, B, C) operands — the shape
    XLA's layout assignment already gives the producing conv at block 1;
    the outer transposes carry no reshape so no tiling change."""
    b, h, w, c = x.shape
    blocks = _pick_4d(h, w, b, c, x.dtype.itemsize, _FWD_4D_STACK_F32)
    assert blocks is not None, "caller must gate on supported_4d()"
    xt = jnp.transpose(x, (1, 2, 0, 3))
    yt = _fwd_call_4d(xt, blocks, interpret=interpret)
    return jnp.transpose(yt, (2, 0, 1, 3))


def relu_pool_bwd_4d(
    x: jax.Array, y: jax.Array, ct: jax.Array, interpret: bool = False
) -> jax.Array:
    """4-D-domain gradient of ``max_pool(relu(x), 2)``; semantics
    identical to :func:`relu_pool_bwd`."""
    b, h, w, c = x.shape
    blocks = _pick_4d(h, w, b, c, x.dtype.itemsize, _BWD_4D_STACK_F32)
    assert blocks is not None, "caller must gate on supported_4d()"
    xt = jnp.transpose(x, (1, 2, 0, 3))
    yt = jnp.transpose(y, (1, 2, 0, 3))
    ctt = jnp.transpose(ct.astype(x.dtype), (1, 2, 0, 3))
    gt = _bwd_call_4d(xt, yt, ctt, blocks, interpret=interpret)
    return jnp.transpose(gt, (2, 0, 1, 3))
