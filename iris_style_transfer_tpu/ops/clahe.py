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


def _tile_histograms(img_u8: jax.Array, grid: tuple[int, int]) -> jax.Array:
    """(H, W) uint8 -> (gh*gw, 256) float32 histograms.

    Sort + searchsorted instead of scatter-add: no scatters (slow to compile
    and serialize on both XLA CPU and TPU), just one batched sort and two
    vectorized binary searches.
    """
    h, w = img_u8.shape
    gh, gw = grid
    th, tw = h // gh, w // gw
    tiles = img_u8.reshape(gh, th, gw, tw).transpose(0, 2, 1, 3).reshape(gh * gw, th * tw)
    tiles = jnp.sort(tiles.astype(jnp.int32), axis=1)
    edges = jnp.arange(257, dtype=jnp.int32)

    def hist_one(sorted_tile):
        pos = jnp.searchsorted(sorted_tile, edges, side="left")
        return (pos[1:] - pos[:-1]).astype(jnp.float32)

    return jax.vmap(hist_one)(tiles)


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
