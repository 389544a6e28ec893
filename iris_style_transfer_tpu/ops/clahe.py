"""CLAHE — contrast-limited adaptive histogram equalization, on device.

The reference runs OpenCV's CLAHE (clipLimit=1.5, tileGridSize=(8,8)) on the
host, one image at a time, inside the RITnet preprocessing
(``models/ritnet/ritnet.py:71,94`` — a device->cpu->device round trip per
image).  This is a batched JAX reimplementation of cv2's exact algorithm:

  1. per-tile 256-bin histogram,
  2. clip at ``max(int(clip * tile_area / 256), 1)`` and redistribute the
     excess (uniform share + cv2's strided residual distribution),
  3. per-tile LUT = round(cdf * 255 / tile_area),
  4. bilinear interpolation of the four neighboring tile LUTs per pixel.

Requires H and W divisible by the grid (the workloads' 400x640 / 640x400
frames are).  Input/output are float images in [0,1] (quantized to uint8
internally, exactly like the reference's uint8 round trip).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Apply the tile LUTs via per-region one-hot matmuls (MXU) instead of four
# per-pixel gathers (XLA lowers those to slow element gathers on TPU — same
# pathology tools/perf_probe20.py measured for the bilinear resamples).
# Within each *half-tile* region the four interpolating tile indices are
# constant (floor(y/th - 0.5) changes only at half-tile boundaries), so the
# LUT lookup is one (pixels, 256) one-hot x (256, 4-taps) dot per region —
# bitwise-equal to the gather form (u8 LUT values are exact in bf16 and the
# MXU accumulates in f32).  Requires even tile sides; gather is the fallback.
MATMUL_LUT_APPLY = True


def _tile_histograms(img_u8: jax.Array, grid: tuple[int, int]) -> jax.Array:
    """(H, W) uint8 -> (gh*gw, 256) float32 histograms.

    One fused broadcast-compare + reduce (no scatters, which are slow to
    compile and serialize on both XLA CPU and TPU; measured 1.5x over the
    earlier sort+searchsorted form on the real chip, tools/perf_probe21.py,
    identical counts).
    """
    h, w = img_u8.shape
    gh, gw = grid
    th, tw = h // gh, w // gw
    tiles = (
        img_u8.reshape(gh, th, gw, tw).transpose(0, 2, 1, 3).reshape(gh * gw, th * tw)
    ).astype(jnp.int32)
    bins = jnp.arange(256, dtype=jnp.int32)
    return jnp.sum(
        (tiles[:, None, :] == bins[None, :, None]).astype(jnp.float32), axis=-1
    )


def _clip_redistribute(hist: jax.Array, clip_limit: float, tile_area: int) -> jax.Array:
    """cv2's clip + redistribution for one (256,) histogram."""
    limit = jnp.float32(max(int(clip_limit * tile_area / 256.0), 1))
    clipped = jnp.sum(jnp.maximum(hist - limit, 0.0))
    hist = jnp.minimum(hist, limit)
    redist = jnp.floor(clipped / 256.0)
    residual = clipped - redist * 256.0
    hist = hist + redist
    # cv2: step = max(256 // residual, 1); bins 0, step, 2*step, ... get +1,
    # exactly `residual` times.
    step = jnp.maximum(jnp.floor(256.0 / jnp.maximum(residual, 1.0)), 1.0)
    i = jnp.arange(256, dtype=jnp.float32)
    bump = (jnp.floor(i / step) * step == i) & (jnp.floor(i / step) < residual)
    hist = jnp.where(residual > 0, hist + bump.astype(jnp.float32), hist)
    return hist


def _lut_taps_matmul(
    img_u8: jax.Array, luts: jax.Array, grid: tuple[int, int]
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """(H, W) u8 + (gh, gw, 256) LUTs -> four (H, W) f32 tap planes
    (l00, l01, l10, l11), bitwise-equal to the gather form's lookups.

    Half-tile decomposition: pixel rows in half-tile r span
    tyf = y/th - 0.5 in [r/2 - 0.5, (r+1)/2 - 0.5) — a half-open interval
    between consecutive multiples of 0.5, so floor(tyf) is constant within
    the region and equals (r-1)//2 (same for columns).  The four tile LUTs
    per region are therefore selected with *static* indices, and the lookup
    becomes a (pixels, 256) one-hot x (256, 4) dot per region (u8 LUT
    values are exact in bf16; the MXU accumulates in f32).
    """
    h, w = img_u8.shape
    gh, gw = grid
    th, tw = h // gh, w // gw
    hh, ww = th // 2, tw // 2

    r = np.arange(2 * gh)
    c = np.arange(2 * gw)
    ty0u, tx0u = (r - 1) // 2, (c - 1) // 2
    ty0, ty1 = np.clip(ty0u, 0, gh - 1), np.clip(ty0u + 1, 0, gh - 1)
    tx0, tx1 = np.clip(tx0u, 0, gw - 1), np.clip(tx0u + 1, 0, gw - 1)
    lsel = jnp.stack(  # (2gh, 2gw, 4, 256), tap order (00, 01, 10, 11)
        [
            luts[ty0][:, tx0],
            luts[ty0][:, tx1],
            luts[ty1][:, tx0],
            luts[ty1][:, tx1],
        ],
        axis=2,
    )

    v = (
        img_u8.reshape(2 * gh, hh, 2 * gw, ww)
        .transpose(0, 2, 1, 3)
        .reshape(2 * gh, 2 * gw, hh * ww)
    )
    onehot = (v[..., None] == jnp.arange(256, dtype=v.dtype)).astype(jnp.bfloat16)
    taps = jnp.einsum(
        "rcpk,rctk->rctp",
        onehot,
        lsel.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )  # (2gh, 2gw, 4, hh*ww)
    planes = (
        taps.reshape(2 * gh, 2 * gw, 4, hh, ww)
        .transpose(2, 0, 3, 1, 4)
        .reshape(4, h, w)
    )
    return planes[0], planes[1], planes[2], planes[3]


def clahe(
    x: jax.Array,
    clip_limit: float = 1.5,
    grid: tuple[int, int] = (8, 8),
) -> jax.Array:
    """CLAHE on a float (H, W) image in [0,1]; returns float in [0,1]."""
    h, w = x.shape
    gh, gw = grid
    if h % gh or w % gw:
        raise ValueError(f"CLAHE requires H,W divisible by grid; got {x.shape} vs {grid}")
    th, tw = h // gh, w // gw
    tile_area = th * tw

    # round (not truncate): float inputs are u8/255, rounding recovers the
    # original integer exactly despite f32 representation error
    img_u8 = jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    hists = _tile_histograms(img_u8, grid)
    hists = jax.vmap(lambda hh: _clip_redistribute(hh, clip_limit, tile_area))(hists)
    # per-tile LUT: round-half-even(cdf * 255 / tile_area), like cvRound
    cdf = jnp.cumsum(hists, axis=1)
    luts = jnp.clip(jnp.round(cdf * (255.0 / tile_area)), 0.0, 255.0)
    luts = luts.reshape(gh, gw, 256)

    # bilinear interpolation of tile LUTs at each pixel's intensity,
    # cv2's exact coordinate convention (txf = x/tileW - 0.5)
    yy = jnp.arange(h, dtype=jnp.float32)
    xx = jnp.arange(w, dtype=jnp.float32)
    tyf = yy / th - 0.5
    txf = xx / tw - 0.5
    ty0 = jnp.floor(tyf)
    tx0 = jnp.floor(txf)
    wy = (tyf - ty0)[:, None]
    wx = (txf - tx0)[None, :]
    if MATMUL_LUT_APPLY and th % 2 == 0 and tw % 2 == 0:
        l00, l01, l10, l11 = _lut_taps_matmul(img_u8, luts, grid)
    else:
        # cv2 clips base and +1 neighbor independently from the *unclipped*
        # floor, so border pixels use the same tile for both taps
        ty0i = jnp.clip(ty0.astype(jnp.int32), 0, gh - 1)
        ty1i = jnp.clip(ty0.astype(jnp.int32) + 1, 0, gh - 1)
        tx0i = jnp.clip(tx0.astype(jnp.int32), 0, gw - 1)
        tx1i = jnp.clip(tx0.astype(jnp.int32) + 1, 0, gw - 1)

        v = img_u8.astype(jnp.int32)
        ty0g = jnp.broadcast_to(ty0i[:, None], (h, w))
        ty1g = jnp.broadcast_to(ty1i[:, None], (h, w))
        tx0g = jnp.broadcast_to(tx0i[None, :], (h, w))
        tx1g = jnp.broadcast_to(tx1i[None, :], (h, w))
        l00 = luts[ty0g, tx0g, v]
        l01 = luts[ty0g, tx1g, v]
        l10 = luts[ty1g, tx0g, v]
        l11 = luts[ty1g, tx1g, v]
    top = l00 * (1 - wx) + l01 * wx
    bot = l10 * (1 - wx) + l11 * wx
    out = top * (1 - wy) + bot * wy
    return jnp.clip(jnp.round(out), 0.0, 255.0).astype(x.dtype) / 255.0
