"""Masked-iris extraction and recomposition as batched XLA programs.

Reference: ``pipelines.mask_and_crop_iris`` (``pipelines.py:112-166``) and
its inline EfficientNet variant (``iris_style_transfer_openeds2020.py:
78-99``): segment -> iris mask (class==2) x glint mask (x <= 0.8) -> mask
the image -> crop to the nonzero bbox -> grayscale->RGB.  The reference
does this one image at a time with dynamic shapes and host round trips;
here every step is a fixed-shape batched op (segmentation is batched, the
crop+resize is one gather), so the whole pre/post-NST pipeline is a single
jitted, shardable program.

``area_opening`` blob removal is available but off by default, matching the
commented-out call sites (``pipelines.py:155``).
"""

from __future__ import annotations

from typing import Callable

import jax

from ..models.ritnet import RITnet
from ..ops.connected import area_opening as _area_opening
from ..ops.image import (
    composite_iris,
    crop_and_resize,
    gray_to_rgb,
    nonzero_bbox,
    rgb_to_grayscale,
)

IRIS_CLASS = 2  # pipelines.py:148


def iris_mask_from_seg(
    seg: jax.Array,
    img: jax.Array,
    glint_threshold: float = 0.8,
    open_area: int = 0,
    connectivity: int = 2,
) -> jax.Array:
    """(B, H, W) seg labels + (B, H, W, 1) image -> (B, H, W, 1) bool iris
    mask: (seg == 2) & (img <= glint_threshold) (``pipelines.py:147-154``)."""
    m = (seg == IRIS_CLASS)[..., None] & (img <= glint_threshold)
    if open_area > 0:
        m = jax.vmap(lambda mm: _area_opening(mm, open_area, connectivity))(m[..., 0])[
            ..., None
        ]
    return m


def extract_iris_batch(
    imgs: jax.Array,
    segs: jax.Array,
    glint_threshold: float = 0.8,
    out_size: tuple[int, int] = (224, 224),
    rgb: bool = True,
    open_area: int = 0,
    connectivity: int = 2,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Batched iris extraction: images (B, H, W, 1) + seg labels (B, H, W)
    -> (irises (B, *out_size, 3 or 1), masks (B, H, W, 1), bboxes (B, 4)).

    The bbox is the nonzero extent of the masked image, exactly like
    ``crop_image`` on ``x * m`` (``pipelines.py:154-161``); resize to
    ``out_size`` is folded into the crop as one bilinear gather.
    """
    masks = iris_mask_from_seg(
        segs, imgs, glint_threshold, open_area=open_area, connectivity=connectivity
    )
    masked = imgs * masks.astype(imgs.dtype)
    bboxes = jax.vmap(lambda m: nonzero_bbox(m[..., 0]))(masked)
    irises = jax.vmap(lambda im, bb: crop_and_resize(im, bb, out_size))(masked, bboxes)
    if rgb:
        irises = gray_to_rgb(irises)
    return irises, masks, bboxes


def mask_and_crop_iris(
    x: jax.Array,
    ritnet_params: dict,
    glint_threshold: float = 0.8,
    area_threshold: int = 500,
    connectivity: int = 2,
    out_size: tuple[int, int] = (224, 224),
    use_area_opening: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """The ``mask_and_crop_iris`` entry point (``pipelines.py:112-166``),
    RITnet-backed and batched.

    x: (B, H, W, 1) eye images in [0,1].  Returns ``(iris_rgb, mask,
    bbox)``: the RGB iris crop resized to ``out_size`` (the reference
    returns the dynamic-shape crop; XLA needs static shapes, so the resize
    every caller performs next is folded in), the full-frame iris mask, and
    the int32 bbox ``[r_min, c_min, r_max, c_max]`` (the reference's
    (x_min, y_min, x_max, y_max) row/col convention).
    """
    seg = RITnet.apply(ritnet_params, x)
    # one shared mask->crop pipeline (a second copy here would silently
    # diverge from the workloads' extract_iris_batch path)
    return extract_iris_batch(
        x,
        seg,
        glint_threshold,
        out_size=out_size,
        rgb=True,
        open_area=area_threshold if use_area_opening else 0,
        connectivity=connectivity,
    )


def composite_batch(
    frames: jax.Array,
    stylized_rgb: jax.Array,
    masks: jax.Array,
    bboxes: jax.Array,
) -> jax.Array:
    """Batched recomposition (``iris_style_transfer_openeds2019.py:
    112-136``): RGB->grayscale, resize each stylized iris back into its
    bbox, re-mask, and composite into the original frame."""
    gray = rgb_to_grayscale(stylized_rgb)
    return jax.vmap(composite_iris)(frames, gray, masks, bboxes)


def make_ist_fn(nst_fn: Callable) -> Callable:
    """Fuse extraction -> NST -> recomposition into one jittable program.

    ``fn(vgg_params, frames, segs, s_irises_rgb) -> (new_frames, irises,
    result)`` where ``result`` is the NSTResult for the batch.
    """

    def fn(vgg_params, frames, segs, s_irises_rgb, glint_threshold=0.8):
        irises, masks, bboxes = extract_iris_batch(frames, segs, glint_threshold)
        result = nst_fn(vgg_params, irises, s_irises_rgb)
        new_frames = composite_batch(frames, result.x, masks, bboxes)
        return new_frames, irises, result

    return fn
