"""Pallas kernel: fused relu + per-channel (sum, sum-of-squares) for the
NST style taps, forward and backward.

Motivation (round-3 trace, tools/perf_probe9.py): at the 512px bs4 config
the relu1_1 tap costs 1.70 ms/closure forward — XLA correctly fuses the
relu with the style-stats reductions into one two-output fusion, but the
whole fusion runs in the batch-in-sublanes layout it picks at bs4
((8, 128) vector registers 4/8 x 64/128 = 25% occupied), ~5x the
bandwidth roofline.  The backward (relu mask + d(mean)/d(std) cotangent
injection) pays the same layout tax inside the conv1_2 dx chain.

Same remedy as :mod:`pallas_pool`: run over the LANE-FULL bitcast view

    x (B, H, W, C)  -->  transpose(1,2,0,3) + reshape  -->  (H, W, B*C)

whose default layout is byte-identical to the ``{3,0,2,1}`` layout XLA
already stores these tensors in, and where B*C >= 256 fills both lane
tiles.  Each lane is one (b, c) pair, so the per-(B, C) style statistics
are per-lane reductions — no cross-lane traffic at all:

    forward:  y = max(x, 0);  s1 = sum_hw y;  s2 = sum_hw y*y
    backward: g = (x > 0) ? ct_y + a + 2*x*b2 : 0
              (a = dL/ds1, b2 = dL/ds2 broadcast per lane)

The grid walks H strips; s1/s2 accumulate in an f32 output block pinned
to grid step 0's slot (TPU grids are sequential, so read-modify-write of
a constant-index output block is well-defined).

Reference anchor: the stats being produced are the reference's BN style
statistics (``utils.py:324-355``, per-channel spatial mean / Bessel std),
whose sum/sumsq form lives in ``ops/losses.py:style_stats``.

Sharding caveat (same as :mod:`pallas_gram` / :mod:`pallas_pool`): a
``pallas_call`` has no SPMD partitioning rule, so under a mesh with
SHARDED operands (e.g. spatial NST with ``--model_parallel > 1``) XLA
must replicate around it — correct but slow.  This is ENFORCED, not
just documented: ``transfer.nst.make_nst_fn(model_sharded=True)``
resolves both Pallas gates to their numerically-identical XLA forms
(tests/test_pallas_gates.py), and the IST workloads pass
``model_sharded=n_model > 1``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lane_view import pick_rows, unview, view


def _fwd_kernel(x_ref, y_ref, s1_ref, s2_ref):
    i = pl.program_id(0)
    x = x_ref[:]  # (T, W, BC)
    y = jnp.maximum(x, jnp.zeros((), x.dtype))
    y_ref[:] = y
    yf = y.astype(jnp.float32)
    ps1 = jnp.sum(yf, axis=(0, 1))[None, :]  # (1, BC)
    ps2 = jnp.sum(yf * yf, axis=(0, 1))[None, :]

    @pl.when(i == 0)
    def _init():
        s1_ref[:] = ps1
        s2_ref[:] = ps2

    @pl.when(i > 0)
    def _acc():
        s1_ref[:] += ps1
        s2_ref[:] += ps2


def _bwd_kernel(x_ref, cty_ref, a_ref, b_ref, g_ref):
    x = x_ref[:]  # (T, W, BC)
    ct = cty_ref[:].astype(jnp.float32)
    a = a_ref[:].astype(jnp.float32)  # (1, BC) = dL/ds1
    b2 = b_ref[:].astype(jnp.float32)  # (1, BC) = dL/ds2
    xf = x.astype(jnp.float32)
    g = ct + a[None, :, :] + 2.0 * xf * b2[None, :, :]
    # compare in f32: Mosaic on v5e rejects bf16 vector cmpf (and
    # bf16->f32 is exact, so the predicate is unchanged)
    zero = jnp.zeros((), g_ref.dtype)
    g_ref[:] = jnp.where(xf > 0.0, g.astype(g_ref.dtype), zero)


def _rows_per_step(h: int, w: int, bc: int, itemsize: int) -> int:
    # worst case is the backward: x + ct + g strips (the forward holds
    # x + y), double-buffered, plus ~3 strip-sized f32 stack temporaries
    # (ct, xf, g in f32 — Mosaic puts live vector intermediates on its
    # scoped-vmem stack); budget the whole set against VMEM
    t = pick_rows(h, w, bc, itemsize, n_strips=3, stack_f32=3)
    assert t is not None, "caller must gate on supported()"
    return t


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fwd_view(xv: jax.Array, interpret: bool = False):
    h, w, bc = xv.shape
    t = _rows_per_step(h, w, bc, xv.dtype.itemsize)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(h // t,),
        in_specs=[
            pl.BlockSpec((t, w, bc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t, w, bc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h, w, bc), xv.dtype),
            jax.ShapeDtypeStruct((1, bc), jnp.float32),
            jax.ShapeDtypeStruct((1, bc), jnp.float32),
        ],
        interpret=interpret,
    )(xv)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bwd_view(xv, ctyv, a, b2, interpret: bool = False):
    h, w, bc = xv.shape
    t = _rows_per_step(h, w, bc, xv.dtype.itemsize)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(h // t,),
        in_specs=[
            pl.BlockSpec((t, w, bc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, w, bc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (t, w, bc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((h, w, bc), xv.dtype),
        interpret=interpret,
    )(xv, ctyv, a, b2)


def supported(x_shape: tuple[int, ...], itemsize: int = 2) -> bool:
    """Applicability: 4-d NHWC, lane dim (B*C) a multiple of 128, TPU,
    and a strip height whose VMEM working set fits (``lane_view.pick_rows``
    — without the bound, scaled-up configs like the bs64 production shape
    would fail at compile time instead of falling back to XLA)."""
    if len(x_shape) != 4:
        return False
    b, h, w, c = x_shape
    return (
        jax.default_backend() == "tpu"
        and (b * c) % 128 == 0
        and w % 8 == 0
        and pick_rows(h, w, b * c, itemsize, n_strips=3, stack_f32=3) is not None
    )


def relu_stats_fwd(x: jax.Array, interpret: bool = False):
    """y = relu(x); per-(B, C) f32 s1 = sum(y), s2 = sum(y*y) over (H, W).

    Layout note: the (B,H,W,C)->(H,W,B*C) rearrangement is a bitcast when
    the operand layout is XLA's bs4 choice ``{3,0,2,1}``; on other layouts
    XLA inserts real transposes and the probe harness (perf_probe15)
    decides whether the kernel still wins.
    """
    b = x.shape[0]
    yv, s1v, s2v = _fwd_view(view(x), interpret=interpret)
    y = unview(yv, b)
    s1 = s1v.reshape(b, x.shape[3])
    s2 = s2v.reshape(b, x.shape[3])
    return y, s1, s2


def relu_stats_bwd(
    x: jax.Array, ct_y: jax.Array, ct_s1: jax.Array, ct_s2: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """dx for (y, s1, s2) = relu_stats(x) given the three cotangents."""
    b, h, w, c = x.shape
    a = ct_s1.astype(jnp.float32).reshape(1, b * c)
    b2 = ct_s2.astype(jnp.float32).reshape(1, b * c)
    gv = _bwd_view(view(x), view(ct_y.astype(x.dtype)), a, b2, interpret=interpret)
    return unview(gv, b)
