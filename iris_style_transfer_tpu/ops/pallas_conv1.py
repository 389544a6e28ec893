"""Pallas kernel: the C_in=3 first conv (conv1_1) in the image's own
W-in-lanes layout.

Round-5 trace re-attribution (BASELINE.md): XLA lowers conv1_1 forward
at (64, 224, 224, 3)->(.., 64) with its `EmitOutputBatchInSublanes`
emitter at ~2.2 TFLOP/s effective — 4.95 ms/closure, the largest single
op left in the NST closure after the accepted pool kernel.  The
structural reason is a layout conflict: the image x lives in
{2,3,1,0} ([B][H][C][W], W in lanes — the natural layout for C=3, which
would waste 125/128 lanes) while conv outputs at C=64 prefer {3,0,2,1}
([H][W][B][C]) — so any implementation transposes batch from a major
dim into sublanes somewhere.

This kernel sidesteps the transposition by keeping the OUTPUT in the
input's family too: operands and result are logical (B, H, C, W) — the
default layout of that shape IS the {2,3,1,0} bytes of the natural
(B, H, W, C) tensors, so both boundaries are bitcast transposes.  The
gamble (measured, not assumed) is the consumer side: XLA must adapt
conv1_2 / the relu1_1 style-stats reduction to the [B][H][C][W] form
the way it adapted conv1_2's output in the pool-kernel graph.

In-kernel, per (B-block, H-strip) grid step on a zero-padded input:

    for (kh, kw) in 3x3:
        x_tap = roll(x_rows[kh], 226 - kw, lanes)[..., :W]   # W-shift
        acc  += dot(x_tap, W1[kh, kw])      # contract C_in=4 (padded)
    out = swapaxes(acc + bias, -1, -2)      # (.., W, 64) -> (.., 64, W)

All slices are leading-dim, the W-shifts are positive lane rolls into
the zero border (never wrapping real data), the per-tap contraction is
a K=4 matmul, and the single minor-2 transpose per block runs on the
hardware transpose unit (capability-verified 2026-08-20).

Reference anchor: torchvision vgg19 features[0]
(``/root/reference/models/vgg/vgg.py:43-48``) inside the NST closure
(``/root/reference/pipelines.py:86-90``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lane_view import VMEM_BUDGET


def _kernel(x_ref, w_ref, b_ref, y_ref):
    # x block (Bb, t+2, Cp, W+2); w (9, Cp, Co); b (1, Co);
    # y block (Bb, t, Co, W)
    bb, t2, cp, w2 = x_ref.shape
    t = t2 - 2
    w = w2 - 2
    co = y_ref.shape[2]
    x = x_ref[...].astype(jnp.float32)
    acc = jnp.zeros((bb, t, w, co), jnp.float32)
    for kh in range(3):
        rows = x[:, kh : kh + t]  # (Bb, t, Cp, W+2) leading slice
        for kw in range(3):
            # positive circular roll by (W+2-kw) == left-shift by kw;
            # lanes [0, w) then read x[.., w+kw], all inside the zero
            # border (no wrapped real data reaches them)
            shifted = pltpu.roll(rows, w2 - kw, 3) if kw else rows
            x_tap = shifted[..., :w]  # (Bb, t, Cp, W)
            wk = w_ref[kh * 3 + kw].astype(jnp.float32)  # (Cp, Co)
            # contract Cp: (Bb, t, Cp, W) x (Cp, Co) -> (Bb, t, W, Co)
            acc = acc + jax.lax.dot_general(
                x_tap, wk,
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc = acc + b_ref[0].astype(jnp.float32)
    y_ref[...] = jnp.swapaxes(acc, 2, 3).astype(y_ref.dtype)


# f32 stack temps in x-block units are small (the big live value is the
# (Bb, t, W, Co) accumulator — priced explicitly below)
def _pick(bq: int, h: int, w: int, cp: int, co: int, itemsize: int):
    """(Bb, t): images and output rows per grid step."""
    for bb in (8, 16, 4, 2, 1):
        if bq % bb:
            continue
        for t in (8, 4, 2, 1):
            if h % t:
                continue
            xblk = bb * (t + 2) * cp * (w + 2)
            yblk = bb * t * co * w
            accf32 = bb * t * w * co * 4 * 3  # acc + dot temps
            work = 2 * (xblk + yblk) * itemsize * 2 + accf32 + xblk * 4
            if work <= VMEM_BUDGET:
                return bb, t
    return None


def supported(x_shape: tuple[int, ...], w_shape: tuple[int, ...],
              itemsize: int = 2) -> bool:
    """3x3 stride-1 pad-1 conv, C_in <= 4, on TPU with a feasible block."""
    if len(x_shape) != 4 or w_shape[:2] != (3, 3):
        return False
    b, h, w, ci = x_shape
    co = w_shape[3]
    return (
        jax.default_backend() == "tpu"
        and ci <= 4
        and co % 8 == 0
        and _pick(b, h, w, 4, co, itemsize) is not None
    )


@functools.partial(jax.jit, static_argnames=("h", "blocks", "interpret"))
def _call(xt, wf, bias, h, blocks, interpret: bool = False):
    # xt is the strip-expanded (B, (H/t)*(t+2), Cp, W+2) tensor
    bq, _, cp, w2 = xt.shape
    w = w2 - 2
    co = wf.shape[2]
    bb, t = blocks
    grid = (bq // bb, h // t)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            # BlockSpec cannot express overlapping (haloed) blocks, so
            # the caller pre-expands the padded x into disjoint
            # (t+2)-row strips; block index j on the strip axis lands
            # exactly on strip j
            pl.BlockSpec((bb, t + 2, cp, w2), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cp, co), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, t, co, w), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bq, h, co, w), xt.dtype),
        interpret=interpret,
    )(xt, wf, bias)


def conv1_fwd(x: jax.Array, w: jax.Array, b: jax.Array,
              interpret: bool = False) -> jax.Array:
    """3x3 stride-1 pad-1 conv for tiny C_in, NHWC x HWIO -> NHWC,
    computed in the [B][H][C][W] layout family (bitcast boundaries).

    The H-halo is materialized by an XLA gather-free expansion: the
    padded (B, H+2, Cp, W+2) tensor is restacked as (B, H/t, t+2, ...)
    overlapping strips via two cheap strided slices (XLA concat) —
    ~2/t extra bytes of a 19 MB tensor.
    """
    bq, h, wd, ci = x.shape
    co = w.shape[3]
    blocks = _pick(bq, h, wd, 4, co, x.dtype.itemsize)
    assert blocks is not None, "caller must gate on supported()"
    bb, t = blocks
    # (B, H, W, C) -> (B, H, C, W) logical == bitcast of {2,3,1,0}
    xt = jnp.transpose(x, (0, 1, 3, 2))
    # pad C to 4 (zero channel), H and W by 1 (conv border)
    xt = jnp.pad(xt, ((0, 0), (1, 1), (0, 4 - ci), (1, 1)))
    # overlapping H strips: strip j needs rows [j*t, j*t+t+2) of the
    # padded H+2 axis; build (B, (H/t)*(t+2), Cp, W+2) by stacking
    n = h // t
    strips = [
        jax.lax.slice_in_dim(xt, j * t, j * t + t + 2, axis=1)
        for j in range(n)
    ]
    xs = jnp.concatenate(strips, axis=1)
    wf = w.astype(x.dtype)
    wf = jnp.pad(wf, ((0, 0), (0, 0), (0, 4 - ci), (0, 0)))
    wf = wf.reshape(9, 4, co)
    bias = b.reshape(1, co).astype(x.dtype)
    # the strip axis folds into the grid: view (B, n*(t+2), Cp, W+2)
    # with block (bb, t+2, ..) at index j*(t+2) — consecutive blocks now
    # ARE disjoint in this expanded tensor
    yt = _call(xs, wf, bias, h, blocks, interpret=interpret)
    # yt (B, H, Co, W) logical -> (B, H, W, Co)
    return jnp.transpose(yt, (0, 1, 3, 2))
