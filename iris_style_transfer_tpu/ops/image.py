"""Static-shape image primitives.

TPU-first design notes
----------------------
The reference does per-image dynamic crops (``utils.py:44-72``,
``pipelines.py:159-161``) and host-side resizes.  XLA requires static shapes,
so every "crop to data-dependent bbox then resize" here is expressed as a
*sampling* op: the bounding box is a traced value, and the output is produced
by bilinear gathers on a fixed-size coordinate grid.  The inverse (resize a
stylized patch back into a full frame, ``iris_style_transfer_openeds2019.py
:116-136``) is likewise one full-frame gather.  Everything is batched with
``vmap`` and shards on the batch axis under ``pjit``.

Layout: images are channel-last ``(..., H, W, C)`` (TPU-native).  The public
CLI surface converts from/to the reference's NCHW at the boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# ImageNet normalization constants used *inside* model forwards, matching the
# reference (``models/vgg/vgg.py:63-67``, ``models/resnet/resnet.py:30-34``).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# torchvision rgb_to_grayscale / ITU-R 601-2 luma weights
# (reference usage: ``iris_style_transfer_openeds2019.py:112``).
_GRAY_WEIGHTS = (0.2989, 0.587, 0.114)


def to_unit_float(x: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8 image -> float in [0,1]; float images pass through.

    Grayscale frames are 8-bit at the source (PNG), so hosts stage them as
    uint8 — 4x less host->device traffic — and the jitted programs
    dequantize here, losslessly (u8/255 is exact in f32).
    """
    if x.dtype == jnp.uint8:
        return x.astype(dtype) / 255.0
    if x.dtype == jnp.uint16:  # see quantize_u16
        return x.astype(dtype) / 65535.0
    return x


def quantize_u8(a):
    """Host-side inverse of :func:`to_unit_float` for u8-quantized float
    images (lossless round trip: the loaders decode 8-bit PNGs)."""
    import numpy as _np

    if a.dtype == _np.uint8:
        return a
    return _np.round(a * 255.0).astype(_np.uint8)


def quantize_u16(x: jax.Array) -> jax.Array:
    """[0,1] float -> uint16 (65536 levels, max error 7.6e-6 — two decades
    below bf16's own rounding).  Halves D2H/H2D vs f32 for resampled crops,
    which are NOT 8-bit-representable (bilinear blends of u8 levels)."""
    return jnp.round(jnp.clip(x, 0.0, 1.0) * 65535.0).astype(jnp.uint16)


def pack_mask_bits(m: jax.Array) -> jax.Array:
    """(..., H, W, 1) bool -> (..., H, W//8, 1) uint8, LSB-first along W.

    8x less device<->host traffic for full-res masks; :func:`unpack_mask_bits`
    inverts on either side."""
    *lead, h, w, c = m.shape
    bits = m.astype(jnp.uint8).reshape(*lead, h, w // 8, 8, c)
    weights = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8)).reshape(8, 1)
    return jnp.sum(bits * weights, axis=-2).astype(jnp.uint8)


def unpack_mask_bits(p: jax.Array) -> jax.Array:
    """Inverse of :func:`pack_mask_bits`: (..., H, W8, 1) u8 -> bool."""
    *lead, h, w8, c = p.shape
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (p[..., :, None, :] >> shifts[None, :, None]) & jnp.uint8(1)
    return bits.reshape(*lead, h, w8 * 8, c).astype(bool)


def pack_labels2(seg):
    """(..., H, W) uint8 class labels < 4 -> (..., H, W//4) uint8, 2 bits
    per label LSB-first along W.  Host-side (numpy) packing for the 4-class
    OpenEDS GT maps: 4x less H2D than raw u8 labels (the tunnel moves
    ~10-30 MB/s, tools/perf_probe22.py).  :func:`unpack_labels2` inverts
    on device."""
    xp = jnp if isinstance(seg, jax.Array) else np
    *lead, h, w = seg.shape
    assert w % 4 == 0, f"pack_labels2 needs a width divisible by 4, got {w}"
    if xp is np:
        # a 5th class would silently bleed into the adjacent 2-bit field
        # and round-trip to WRONG labels, skewing every IoU downstream —
        # fail loudly on the host path (device path stays assert-free for
        # jit; both OpenEDS GT sources are 4-class by construction)
        assert seg.max() < 4, f"pack_labels2 got a label >= 4 (max {seg.max()})"
    quads = seg.astype(xp.uint8).reshape(*lead, h, w // 4, 4)
    weights = (xp.uint8(1) << (2 * xp.arange(4, dtype=xp.uint8)))
    return (quads * weights).sum(axis=-1).astype(xp.uint8)


def unpack_labels2(p: jax.Array) -> jax.Array:
    """Inverse of :func:`pack_labels2`: (..., H, W4) u8 -> (..., H, 4*W4)
    uint8 labels in [0, 4)."""
    *lead, h, w4 = p.shape
    shifts = 2 * jnp.arange(4, dtype=jnp.uint8)
    quads = (p[..., :, None] >> shifts) & jnp.uint8(3)
    return quads.reshape(*lead, h, w4 * 4)


def as_label_map(gt: jax.Array, width: int) -> jax.Array:
    """Accept either a raw (..., H, W) label map or a 2-bit packed
    (..., H, W//4) one (trace-time dispatch on the trailing extent,
    like :func:`as_bool_mask`)."""
    if gt.shape[-1] * 4 == width:
        return unpack_labels2(gt)
    return gt


def as_bool_mask(m: jax.Array) -> jax.Array:
    """Accept either a bool/float mask or a bit-packed u8 mask (trace-time
    dispatch on dtype, like :func:`to_unit_float`)."""
    if m.dtype == jnp.uint8:
        return unpack_mask_bits(m)
    return m.astype(bool)


def imagenet_normalize(x: jax.Array) -> jax.Array:
    """(x - mean) / std over the trailing channel axis (C==3)."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype=x.dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=x.dtype)
    return (x - mean) / std


def rgb_to_grayscale(x: jax.Array, keepdims: bool = True) -> jax.Array:
    """RGB -> grayscale with torchvision weights; channel-last input."""
    w = jnp.asarray(_GRAY_WEIGHTS, dtype=x.dtype)
    y = jnp.tensordot(x, w, axes=[[-1], [0]])
    if keepdims:
        y = y[..., None]
    return y


def gray_to_rgb(x: jax.Array) -> jax.Array:
    """(..., H, W, 1) -> (..., H, W, 3); reference ``pipelines.py:164``."""
    return jnp.repeat(x, 3, axis=-1)


def resize_bilinear(
    x: jax.Array,
    size: tuple[int, int],
    antialias: bool = True,
) -> jax.Array:
    """Bilinear resize of (..., H, W, C) to (..., size[0], size[1], C).

    Matches ``torchvision.transforms.v2.Resize`` semantics (half-pixel
    centers, antialias on by default) to tolerance; reference resizes at
    ``data_preprocessing.py:59-60,157``.
    """
    *lead, h, w, c = x.shape
    out_shape = (*lead, size[0], size[1], c)
    return jax.image.resize(x, out_shape, method="bilinear", antialias=antialias)


def gamma_lut(x: jax.Array, gamma: float = 0.8) -> jax.Array:
    """The RITnet gamma LUT (reference ``models/ritnet/ritnet.py:72,93``).

    The reference builds ``table = 255*(linspace(0,1,256)**0.8)`` and applies
    it with ``cv2.LUT`` to a uint8 image, then truncates back to uint8 for
    CLAHE.  Input here is float in [0,1]; output is float in [0,1] quantized
    identically (uint8-in, truncated-uint8-out).
    """
    # Direct elementwise form of the 256-entry LUT: a per-pixel table gather
    # is ~50 ms per 8 frames on TPU (tools/perf_probe21.py) while the pow is
    # pure VPU work.  ``u * (1/255)`` reproduces jnp.linspace's step
    # multiplication bit-exactly, so trunc(255 * (u/255)**g) equals
    # ``(255*linspace(0,1,256)**g).astype(uint8)[u]`` for every u — asserted
    # exhaustively over all 256 levels in tests/test_image_ops.py.
    u = jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0)  # integer-valued f32
    step = jnp.float32(1.0) / jnp.float32(255.0)
    val = jnp.floor(255.0 * (u * step) ** jnp.float32(gamma))
    # linspace pins its endpoint to exactly 1.0; u*step need not round-trip
    val = jnp.where(u == 255.0, 255.0, val)
    return val.astype(x.dtype) / 255.0


def pad_height(x: jax.Array, top: int, bottom: int, value: float = 0.0) -> jax.Array:
    """Pad the H axis of (..., H, W, C); reference EfficientNet preproc
    pads (0,8,0,8) to take 400x640 -> 416x640 (``efficientnet.py:34``)."""
    pad = [(0, 0)] * (x.ndim - 3) + [(top, bottom), (0, 0), (0, 0)]
    return jnp.pad(x, pad, constant_values=value)


def nonzero_bbox(mask: jax.Array) -> jax.Array:
    """Bounding box of nonzero extent: ``[y_min, x_min, y_max, x_max]``.

    Static-shape recast of ``utils.crop_image(..., return_idx=True)``
    (``utils.py:44-72``; the reference's (x_min, y_min) are row/col mins).
    ``mask`` is (H, W) (bool or numeric).  If the mask is empty the box
    degenerates to the full image (reference would throw; we stay total).
    Returned as int32 array [row_min, col_min, row_max, col_max], inclusive.
    """
    m = mask if mask.dtype == jnp.bool_ else mask != 0
    rows = jnp.any(m, axis=1)
    cols = jnp.any(m, axis=0)
    h, w = m.shape
    ridx = jnp.arange(h, dtype=jnp.int32)
    cidx = jnp.arange(w, dtype=jnp.int32)
    any_nz = jnp.any(rows)
    r_min = jnp.min(jnp.where(rows, ridx, h))
    r_max = jnp.max(jnp.where(rows, ridx, -1))
    c_min = jnp.min(jnp.where(cols, cidx, w))
    c_max = jnp.max(jnp.where(cols, cidx, -1))
    r_min = jnp.where(any_nz, r_min, 0)
    c_min = jnp.where(any_nz, c_min, 0)
    r_max = jnp.where(any_nz, r_max, h - 1)
    c_max = jnp.where(any_nz, c_max, w - 1)
    return jnp.stack([r_min, c_min, r_max, c_max]).astype(jnp.int32)


# Axis-aligned resizes (crop_and_resize / paste_resized) are separable: the
# sample row depends only on the output row and the sample col only on the
# output col.  Expressed as two 2-tap interpolation matrices they become
# batched matmuls (MXU) instead of 4-tap gathers (which XLA lowers to slow
# element gathers on TPU) — measured 10x on the 2019 pre-classify program and
# 54x on the composite post-classify program at production shapes
# (tools/perf_probe20.py, BASELINE.md).  Flag read at trace time; tests A/B
# both paths.
MATMUL_RESIZE = True


def _axis_weights(coords: jax.Array, src_len: int) -> jax.Array:
    """(out_len,) float sample coords -> (out_len, src_len) f32 two-tap
    bilinear weight matrix with the same clamping as :func:`_bilinear_gather`
    (clip into [0, src-1] before floor; +1 neighbor clipped after)."""
    c = jnp.clip(coords.astype(jnp.float32), 0.0, src_len - 1.0)
    c0 = jnp.floor(c)
    w1 = (c - c0)[:, None]
    i0 = c0.astype(jnp.int32)[:, None]
    i1 = jnp.minimum(i0 + 1, src_len - 1)
    cols = jnp.arange(src_len, dtype=jnp.int32)[None, :]
    return (cols == i0) * (1.0 - w1) + (cols == i1) * w1


def _separable_resample(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Sample (H, W, C) at the axis-aligned grid ys x xs via two matmuls."""
    h, w, _ = img.shape
    wy = _axis_weights(ys, h)
    wx = _axis_weights(xs, w)
    out = jnp.einsum(
        "oh,hwc,pw->opc", wy, img.astype(jnp.float32), wx,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.astype(img.dtype)


def _bilinear_gather(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Sample img (H, W, C) at float coords (out_h, out_w); edge-replicated.

    Coords are clamped into [0, dim-1] *before* the floor so out-of-range
    samples replicate the edge row/col with full weight (clipping the +1
    neighbor after clipping the base would skew the weights instead).
    """
    h, w, _ = img.shape
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    x0i = x0.astype(jnp.int32)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    v00 = img[y0i, x0i]
    v01 = img[y0i, x1i]
    v10 = img[y1i, x0i]
    v11 = img[y1i, x1i]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def crop_and_resize(
    img: jax.Array,
    bbox: jax.Array,
    out_size: tuple[int, int],
) -> jax.Array:
    """Crop (H, W, C) image to traced inclusive ``bbox`` and resize to
    ``out_size`` with bilinear sampling (half-pixel convention).

    Replaces the reference's dynamic ``x[:, x_min:x_max+1, y_min:y_max+1]``
    followed by ``Resize((224,224))`` (``pipelines.py:159-164``,
    ``iris_style_transfer_openeds2019.py:69-75``) with one static-shape
    gather so it vmaps over the batch and runs entirely on device.
    """
    r_min, c_min, r_max, c_max = bbox[0], bbox[1], bbox[2], bbox[3]
    crop_h = (r_max - r_min + 1).astype(img.dtype)
    crop_w = (c_max - c_min + 1).astype(img.dtype)
    oh, ow = out_size
    ys = (jnp.arange(oh, dtype=img.dtype) + 0.5) * (crop_h / oh) - 0.5 + r_min
    xs = (jnp.arange(ow, dtype=img.dtype) + 0.5) * (crop_w / ow) - 0.5 + c_min
    # clamp into the crop so edges replicate exactly like crop-then-resize
    ys = jnp.clip(ys, r_min.astype(img.dtype), r_max.astype(img.dtype))
    xs = jnp.clip(xs, c_min.astype(img.dtype), c_max.astype(img.dtype))
    if MATMUL_RESIZE:
        return _separable_resample(img, ys, xs)
    ys2 = jnp.broadcast_to(ys[:, None], (oh, ow))
    xs2 = jnp.broadcast_to(xs[None, :], (oh, ow))
    return _bilinear_gather(img, ys2, xs2)


def paste_resized(
    frame_shape: tuple[int, int],
    patch: jax.Array,
    bbox: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Resize ``patch`` (h, w, C) into the traced inclusive ``bbox`` of a
    (H, W) frame.  Returns ``(pasted, inside)`` where ``pasted`` is
    (H, W, C) with the resized patch placed at the bbox (zeros elsewhere)
    and ``inside`` is the (H, W, 1) bbox indicator.

    Inverse of :func:`crop_and_resize`: the static-shape equivalent of the
    reference's per-image ``transforms.Resize(raw_shape)`` + in-place
    composite (``iris_style_transfer_openeds2019.py:116-136``).
    """
    fh, fw = frame_shape
    r_min, c_min, r_max, c_max = bbox[0], bbox[1], bbox[2], bbox[3]
    crop_h = (r_max - r_min + 1).astype(patch.dtype)
    crop_w = (c_max - c_min + 1).astype(patch.dtype)
    ph, pw, _ = patch.shape
    fy = jnp.arange(fh, dtype=patch.dtype)
    fx = jnp.arange(fw, dtype=patch.dtype)
    # map frame pixel centers into patch coordinates
    ys = (fy - r_min + 0.5) * (ph / crop_h) - 0.5
    xs = (fx - c_min + 0.5) * (pw / crop_w) - 0.5
    if MATMUL_RESIZE:
        sampled = _separable_resample(patch, ys, xs)
    else:
        ys2 = jnp.broadcast_to(ys[:, None], (fh, fw))
        xs2 = jnp.broadcast_to(xs[None, :], (fh, fw))
        sampled = _bilinear_gather(patch, ys2, xs2)
    ri = jnp.arange(fh, dtype=jnp.int32)
    ci = jnp.arange(fw, dtype=jnp.int32)
    inside = (
        (ri[:, None] >= r_min)
        & (ri[:, None] <= r_max)
        & (ci[None, :] >= c_min)
        & (ci[None, :] <= c_max)
    )[..., None]
    return sampled * inside, inside


def composite_iris(
    frame: jax.Array,
    stylized: jax.Array,
    iris_mask: jax.Array,
    bbox: jax.Array,
) -> jax.Array:
    """Replace the iris region of ``frame`` (H, W, 1) with ``stylized``
    (ph, pw, 1; e.g. the 224x224 NST output already converted to grayscale),
    resized back into ``bbox`` and gated by the full-frame ``iris_mask``
    (H, W, 1 bool).

    Reference semantics (``iris_style_transfer_openeds2019.py:121-130``):
    ``frame[bbox] *= ~mask; frame[bbox] += resize(stylized) * mask``.
    """
    pasted, inside = paste_resized(frame.shape[:2], stylized, bbox)
    m = iris_mask.astype(frame.dtype) * inside.astype(frame.dtype)
    return frame * (1.0 - m) + pasted * m


# ---------------------------------------------------------------------------
# Geometric augmentation (rotation / perspective), on-device.
# Reference: torchvision RandomRotation / RandomPerspective applied on GPU in
# dataset construction (``data_preprocessing.py:59-65``).
# ---------------------------------------------------------------------------


def _warp(img: jax.Array, inv_coeffs: jax.Array, mode: str, fill: float = 0.0) -> jax.Array:
    """Warp (H, W, C) by the *inverse* homography ``inv_coeffs`` (8,) mapping
    output pixel coords -> input pixel coords: (a,b,c,d,e,f,g,h) with
    x_src = (a x + b y + c) / (g x + h y + 1), y_src = (d x + e y + f)/(...)."""
    h, w, c = img.shape
    a, b, cc, d, e, f, g, hh = [inv_coeffs[i] for i in range(8)]
    ys = jnp.arange(h, dtype=img.dtype)
    xs = jnp.arange(w, dtype=img.dtype)
    X = jnp.broadcast_to(xs[None, :], (h, w))
    Y = jnp.broadcast_to(ys[:, None], (h, w))
    denom = g * X + hh * Y + 1.0
    xsrc = (a * X + b * Y + cc) / denom
    ysrc = (d * X + e * Y + f) / denom
    if mode == "nearest":
        xi = jnp.round(xsrc).astype(jnp.int32)
        yi = jnp.round(ysrc).astype(jnp.int32)
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi = jnp.clip(xi, 0, w - 1)
        yi = jnp.clip(yi, 0, h - 1)
        out = img[yi, xi]
        return jnp.where(valid[..., None], out, fill)
    # bilinear with zero fill outside
    valid = (xsrc >= -0.5) & (xsrc <= w - 0.5) & (ysrc >= -0.5) & (ysrc <= h - 0.5)
    out = _bilinear_gather(img, ysrc, xsrc)
    return jnp.where(valid[..., None], out, fill)


def rotate(img: jax.Array, angle_deg: jax.Array, mode: str = "nearest") -> jax.Array:
    """Rotate (H, W, C) about its center by ``angle_deg`` (counterclockwise,
    torchvision convention), same output size, fill 0.  Default nearest to
    match torchvision RandomRotation's default interpolation."""
    h, w, _ = img.shape
    theta = angle_deg * (jnp.pi / 180.0)  # inverse map of a CCW rotation
    cx = (w - 1) / 2.0
    cy = (h - 1) / 2.0
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    # x_src = cos*(x-cx) - sin*(y-cy) + cx ; y_src = sin*(x-cx) + cos*(y-cy) + cy
    coeffs = jnp.stack(
        [
            cos,
            -sin,
            -cos * cx + sin * cy + cx,
            sin,
            cos,
            -sin * cx - cos * cy + cy,
            jnp.zeros_like(cos),
            jnp.zeros_like(cos),
        ]
    ).astype(img.dtype)
    return _warp(img, coeffs, mode)


def _perspective_coeffs(startpoints: jax.Array, endpoints: jax.Array) -> jax.Array:
    """Solve for homography coefficients mapping endpoints -> startpoints
    (the inverse warp used when sampling), torchvision-style.  Points are
    (4, 2) arrays of (x, y)."""
    # For each point: x_s = (a x_e + b y_e + c)/(g x_e + h y_e + 1) etc.
    xe, ye = endpoints[:, 0], endpoints[:, 1]
    xs_, ys_ = startpoints[:, 0], startpoints[:, 1]
    zeros = jnp.zeros_like(xe)
    ones = jnp.ones_like(xe)
    rows_x = jnp.stack([xe, ye, ones, zeros, zeros, zeros, -xs_ * xe, -xs_ * ye], axis=1)
    rows_y = jnp.stack([zeros, zeros, zeros, xe, ye, ones, -ys_ * xe, -ys_ * ye], axis=1)
    A = jnp.concatenate([rows_x, rows_y], axis=0)
    bvec = jnp.concatenate([xs_, ys_], axis=0)
    return jnp.linalg.solve(A, bvec)


def perspective_warp(
    img: jax.Array,
    startpoints: jax.Array,
    endpoints: jax.Array,
    mode: str = "bilinear",
) -> jax.Array:
    """Perspective transform (H, W, C): the four ``startpoints`` corners map
    to ``endpoints`` (torchvision convention), bilinear, fill 0."""
    coeffs = _perspective_coeffs(startpoints, endpoints).astype(img.dtype)
    return _warp(img, coeffs, mode)


def random_rotation_params(key: jax.Array, degrees: float) -> jax.Array:
    """angle ~ U(-degrees, degrees), as torchvision RandomRotation."""
    return jax.random.uniform(key, (), minval=-degrees, maxval=degrees)


def random_perspective_params(
    key: jax.Array, height: int, width: int, distortion_scale: float
) -> tuple[jax.Array, jax.Array]:
    """Sample start/end points as torchvision RandomPerspective.get_params:
    each output corner is displaced inward by U{0, .., distortion*half}-ish
    integer offsets."""
    half_h = height // 2
    half_w = width // 2
    dx = int(distortion_scale * half_w) + 1
    dy = int(distortion_scale * half_h) + 1
    keys = jax.random.split(key, 8)
    u = [jax.random.randint(keys[i], (), 0, dx if i % 2 == 0 else dy) for i in range(8)]
    topleft = jnp.stack([u[0], u[1]])
    topright = jnp.stack([width - 1 - u[2], u[3]])
    botright = jnp.stack([width - 1 - u[4], height - 1 - u[5]])
    botleft = jnp.stack([u[6], height - 1 - u[7]])
    startpoints = jnp.array(
        [[0, 0], [width - 1, 0], [width - 1, height - 1], [0, height - 1]],
        dtype=jnp.float32,
    )
    endpoints = jnp.stack([topleft, topright, botright, botleft]).astype(jnp.float32)
    return startpoints, endpoints
