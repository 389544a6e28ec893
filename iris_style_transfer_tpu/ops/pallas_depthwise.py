"""Pallas kernel: fused depthwise-conv + BN + SiLU for the B7 encoder.

Motivation (tools/perf_probe13.py): the full-res EfficientNet-B7
segmentation path gained only +16% from bfloat16 — nothing like the
MXU's f32/bf16 ratio — because MBConv blocks are bound by their
DEPTHWISE convs and the elementwise BN/SiLU around them
(``models/efficientnet.py:_mbconv``), which are bandwidth ops: a k x k
depthwise conv does 2k^2 FLOPs per element read, far below the MXU
ratio, so its cost is HBM traffic.  XLA executes the depthwise conv,
the BN multiply-add and the SiLU as separate reads/writes of the
(B, H, W, mid) activation (mid up to 3,840 channels).

This kernel does the whole ``silu(bn(dwconv(x)))`` in ONE pass: read an
H strip (plus its k-1 halo rows) HBM->VMEM once, apply all k^2 taps
in-register with per-lane weights (channels ride the 128-wide lane
dimension — depthwise never mixes channels, so the lanes never
communicate), fold the eval-mode BN into a per-lane multiply-add, and
write the activated strip once.  Traffic: read x once (+ halo rows),
write y once — the roofline for this op.

Halo handling: overlapping input windows can't be expressed as
``BlockSpec`` blocks, so the input stays in HBM (``memory_space=ANY``)
and each grid step issues a manual ``make_async_copy`` of its
(T + k - 1)-row window into VMEM scratch; the H padding is done once in
XLA (cheap relative to the fusion win at B7's channel counts) so window
indexing never clamps.  Column halos are in-register shifts.

The grid covers (batch, H strips) ONLY — the channel axis is never
sliced — and the kernel requires C % 128 == 0 AND W % 8 == 0.  Mosaic
stages ``memory_space=ANY`` inputs as memrefs whose minor (lane) and
second-minor (sublane) dimensions are padded to the (8, 128) tile, and
every ``memref_slice`` of such a ref — including a full-extent one —
must be tile-aligned on those axes.  Three on-chip compile attempts
established this empirically (saved/probe_logs_r3b/probe17.log,
probe17_fixed.log, probe17_aligned.log): slicing C=64 of a 128-padded
lane axis fails, and so does the full-extent W=20 of a 24-padded
sublane axis.  Relayout workarounds (pre-padding C or W in XLA, merging
W·C into one lane axis, batch-into-lanes bitcasts) each cost at least
one extra full memory pass or 5-100% zero padding traffic — more than
the ~50% traffic the fusion saves.  Of B7's stride-1 depthwise shapes,
only blocks 6-7 (C = 2304, 3840) pass the lane gate, and at every real
pipeline resolution their stride-32 spatial width (20 at 640-wide
inputs, 7 at 224) fails the sublane gate — so NO production shape
qualifies and the kernel is a documented dead end, kept for the
interpret-mode equivalence test and for hardware where the alignment
rules differ.  Full-C strips always fit VMEM because B7 grows channels
only as the spatial extent shrinks.

Forward-only by design: every pipeline runs B7 frozen (the reference
loads and freezes the smp checkpoint, ``models/efficientnet/
efficientnet.py:27-29``), so no VJP is required.

Flag-gated OFF (``models/efficientnet.py:PALLAS_DW``) until measured
on-chip — tools/perf_probe17.py is the harness.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lane_view import VMEM_BUDGET


def _kernel(xp_hbm, w_ref, a_ref, b_ref, o_ref, xs, sem, *, k: int, t: int):
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    p = (k - 1) // 2
    cb = xs.shape[-1]

    # Slices only the two MAJOR axes (batch, H) — the minor/lane axis (C)
    # and second-minor (W) are taken whole, so no 128/8 tile-alignment
    # constraint applies to this DMA.
    copy = pltpu.make_async_copy(
        xp_hbm.at[bi, pl.ds(hi * t, t + 2 * p), :, :],
        xs,
        sem,
    )
    copy.start()
    copy.wait()

    x = xs[:]  # (T + 2p, W, Cb)
    wdim = x.shape[1]
    xpad = jnp.pad(x, ((0, 0), (p, p), (0, 0)))
    acc = jnp.zeros((t, wdim, cb), jnp.float32)
    for dy in range(k):
        for dx in range(k):
            tap = jax.lax.slice(
                xpad, (dy, dx, 0), (dy + t, dx + wdim, cb)
            ).astype(jnp.float32)
            acc = acc + tap * w_ref[dy, dx][None, None, :].astype(jnp.float32)
    y = acc * a_ref[0][None, None, :] + b_ref[0][None, None, :]
    o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)  # SiLU


def _pick_rows(h: int, w: int, c: int, itemsize: int, k: int = 3) -> int | None:
    """T rows per strip (full C — see module docstring) such that the
    kernel's WHOLE working set fits VMEM: the (T + k - 1)-row halo scratch
    (single-buffered — the DMA is manual), the T-row output block
    double-buffered by the pipeline, and the f32 stack temporaries; None
    if even T=1 is too large (caller falls back to XLA)."""
    halo = k - 1
    for t in (8, 4, 2, 1):
        if h % t:
            continue
        need = (
            (t + halo) * w * c * itemsize  # halo scratch
            + (t + halo) * (w + halo) * c * itemsize  # in-register xpad
            + 2 * t * w * c * itemsize  # output block, double-buffered
            + 3 * t * w * c * 4  # f32 stack: accumulator + tap + y
        )
        if need <= VMEM_BUDGET:
            return t
    return None


def supported(x_shape: tuple[int, ...], k: int, stride: int, itemsize: int = 2) -> bool:
    """Stride-1 odd-k depthwise on TPU with a workable (T, Cb) tiling.
    ``itemsize`` must be the ACTUAL activation dtype's — the tiling that
    fits for bf16 can exceed VMEM for f32."""
    if stride != 1 or k % 2 == 0 or len(x_shape) != 4:
        return False
    b, h, w, c = x_shape
    if c % 128 or w % 8:
        return False  # Mosaic: DMA slice extents must be (8, 128)-tile-aligned
    if jax.default_backend() != "tpu":
        return False
    return _pick_rows(h, w, c, itemsize, k) is not None


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def dw_conv_bn_silu(
    x: jax.Array,
    w: jax.Array,
    a: jax.Array,
    b: jax.Array,
    k: int,
    interpret: bool = False,
) -> jax.Array:
    """silu(dwconv(x, w) * a + b), stride 1, symmetric (k-1)/2 padding.

    x: (B, H, W, C); w: (k, k, 1, C) HWIO depthwise; a, b: (C,) f32 —
    the eval-mode BN folded to a per-channel affine
    (a = scale/sqrt(var + eps), b = bias - mean * a).
    """
    bsz, h, wdim, c = x.shape
    p = (k - 1) // 2
    t = _pick_rows(h, wdim, c, x.dtype.itemsize, k)
    assert t is not None, "caller must gate on supported()"

    xp = jnp.pad(x, ((0, 0), (p, p), (0, 0), (0, 0)))
    wk = w.reshape(k, k, c).astype(x.dtype)
    a2 = a.reshape(1, c).astype(jnp.float32)
    b2 = b.reshape(1, c).astype(jnp.float32)

    return pl.pallas_call(
        functools.partial(_kernel, k=k, t=t),
        grid=(bsz, h // t),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # padded x stays in HBM
            pl.BlockSpec((k, k, c), lambda bi, hi: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, hi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, hi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, t, wdim, c), lambda bi, hi: (bi, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wdim, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((t + 2 * p, wdim, c), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, wk, a2, b2)
