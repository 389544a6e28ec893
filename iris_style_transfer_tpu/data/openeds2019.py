"""OpenEDS2019 loading and dataset construction.

Reference: ``data_preprocessing.py``
  * ``load_data_openeds2019`` (``:253-347``): reads 3 splits' image folders
    + user->image JSON mappings (dataset's own ``'semantic_segmenation_
    images'`` typo key, ``:308``), skips users with <=2 images
    (``:309-310``), splits each user's images 80/20, one class per user
    with ``class_count`` accumulating across splits (``:316``), grayscale
    float [0,1] decode, optional ``.npy`` seg labels (``:332-336``).
  * ``OpenEDS2019IRDataset`` (``:15-108``): per image RITnet iris mask x
    glint mask -> crop -> resize 224^2 -> optional random rotation /
    perspective — the reference runs this one image at a time with host
    round trips; :func:`build_ir_dataset` runs it as chunked batched
    device programs.
  * ``OpenEDS2019ISTDataset`` (``:110-235``): full seg + pre-NST IoUs +
    iris mask/bbox + cross-user style donor sampling (``sample_other``
    rejection sampling, ``:237-251``).

RNG note (SURVEY.md §7.6): split and donor sampling use the host
``random`` module seeded by ``utils.seed`` — same semantics as the
reference, not the same streams.
"""

from __future__ import annotations

import json
import math
import os
import random
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..models.ritnet import RITnet
from ..ops.image import (
    as_label_map,
    crop_and_resize,
    nonzero_bbox,
    pack_labels2,
    pack_mask_bits,
    quantize_u8,
    quantize_u16,
    to_unit_float,
    perspective_warp,
    random_perspective_params,
    random_rotation_params,
    rotate,
)
from ..ops.metrics import iou_per_class
from ..pipelines.iris import iris_mask_from_seg
from .native_loader import decode_gray_batch

MAPPING_KEY = "semantic_segmenation_images"  # dataset's own typo (:308)


def _test_split_size(n: int, test_ratio: float) -> int:
    """Per-user test-set size with ``torch.utils.data.random_split``'s
    fractional semantics (reference ``data_preprocessing.py:312``:
    ``random_split(imgs, [1 - r, r])`` floors each fraction and hands the
    remainder out round-robin starting with the train part) — e.g. 9
    images at r=0.2 give 1 test image, not ``round(1.8) = 2``."""
    lengths = [math.floor(n * (1.0 - test_ratio)), math.floor(n * test_ratio)]
    for i in range(n - sum(lengths)):
        lengths[i % 2] += 1
    return lengths[1]


def load_data_openeds2019(
    test_split_ratio: float = 0.2,
    load_seg: bool = False,
    data_dir: str = "../data/openeds2019",
    image_paths: list[str] | None = None,
    json_paths: list[str] | None = None,
    seg_paths: list[str] | None = None,
):
    """Returns (train_x, train_y, train_m, test_x, test_y, test_m,
    class_count); images are (H, W, 1) uint8 numpy arrays (the files'
    native depth — kept compact on host and across H2D; device programs
    dequantize via ``ops.image.to_unit_float``, losslessly)."""
    from PIL import Image

    if image_paths is None:
        base = os.path.join(data_dir, "Semantic_Segmentation_Dataset")
        image_paths = [os.path.join(base, s, "images") for s in ("train", "validation", "test")]
        seg_paths = [os.path.join(base, s, "labels") for s in ("train", "validation", "test")]
        json_paths = [
            os.path.join(data_dir, f"OpenEDS_{s}_userID_mapping_to_images.json")
            for s in ("train", "validation", "test")
        ]

    train_x, train_y, train_m = [], [], []
    test_x, test_y, test_m = [], [], []
    class_count = 0

    for i_folder, j_path, m_folder in zip(image_paths, json_paths, seg_paths):
        with open(j_path) as fh:
            mappings = json.load(fh)

        img_class, img_train = {}, {}
        for m in mappings:
            imgs = m[MAPPING_KEY]
            if len(imgs) <= 2:  # skip users with too few samples (:309)
                continue
            n_test = _test_split_size(len(imgs), test_split_ratio)
            test_idx = set(random.sample(range(len(imgs)), n_test))
            for i, name in enumerate(imgs):
                img_class[name] = class_count
                img_train[name] = i not in test_idx
            class_count += 1

        names = [p for p in os.listdir(i_folder) if p in img_class]
        paths = [os.path.join(i_folder, p) for p in names]
        if not names:
            continue
        # probe dimensions once, then bulk-decode through the native
        # threaded loader (PIL fallback inside)
        h, w = np.asarray(Image.open(paths[0]).convert("L")).shape
        arrs = decode_gray_batch(paths, h, w, dtype=np.uint8)
        for i_path, arr in zip(names, arrs):
            if load_seg:
                seg = np.load(os.path.join(m_folder, i_path[:-4] + ".npy"))
            else:
                seg = None
            if img_train[i_path]:
                train_x.append(arr); train_y.append(img_class[i_path]); train_m.append(seg)
            else:
                test_x.append(arr); test_y.append(img_class[i_path]); test_m.append(seg)

    return train_x, train_y, train_m, test_x, test_y, test_m, class_count


def sample_other(label: int, labels: list[int]) -> int:
    """Rejection-sample an index of another class (``:237-251``)."""
    idx = random.randrange(len(labels))
    while labels[idx] == label:
        idx = random.randrange(len(labels))
    return idx


# ---------------------------------------------------------------------------
# device-side dataset builders (chunked batched replacements for the
# reference's eager per-image GPU preprocessing at Dataset construction)
# ---------------------------------------------------------------------------


def _augment_one(img, key, rotation_prob, rotation_degree, perspect_prob, perspect_degree):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    h, w, _ = img.shape

    def do_rot(im):
        ang = random_rotation_params(k2, rotation_degree)
        return rotate(im, ang, mode="nearest")

    img = jax.lax.cond(
        jax.random.uniform(k1) < rotation_prob, do_rot, lambda im: im, img
    )

    def do_persp(im):
        sp, ep = random_perspective_params(k4, h, w, perspect_degree)
        return perspective_warp(im, sp, ep, mode="bilinear")

    img = jax.lax.cond(
        jax.random.uniform(k3) < perspect_prob, do_persp, lambda im: im, img
    )
    return img


def build_ir_dataset(
    xs: list[np.ndarray],
    ys: list[int],
    ritnet_params: dict,
    key: jax.Array,
    rotation_prob: float = 0.0,
    rotation_degree: float = 180.0,
    perspect_prob: float = 0.0,
    perspect_degree: float = 0.3,
    glint_threshold: float = 0.8,
    out_size: tuple[int, int] = (224, 224),
    chunk: int = 32,  # ~50MB of RITnet activations per image; 32 is 1.5x
    # the img/s of 8 on the real chip (tools/perf_probe19.py) and well
    # under HBM
) -> tuple[np.ndarray, np.ndarray]:
    """IRDataset equivalent (``data_preprocessing.py:15-108``): per image,
    iris mask x glint mask -> crop -> resize 224^2 -> augment; batched on
    device in chunks.  Returns (N, 224, 224, 1) uint16 crops in
    [0,1]-quantized form (dequantize with ``ops.image.to_unit_float``;
    max error 7.6e-6 — this halves the D2H fetch and every training
    epoch's H2D staging) + (N,) int32 labels."""
    assert len(xs) == len(ys)

    @jax.jit
    def process(batch, keys):
        batch = to_unit_float(batch)  # staged uint8 (4x less H2D)
        seg = RITnet.apply(ritnet_params, batch)
        masks = iris_mask_from_seg(seg, batch, glint_threshold)
        masked = batch * masks.astype(batch.dtype)
        bboxes = jax.vmap(lambda m: nonzero_bbox(m[..., 0]))(masked)
        crops = jax.vmap(lambda im, bb: crop_and_resize(im, bb, out_size))(masked, bboxes)
        if rotation_prob > 0 or perspect_prob > 0:
            crops = jax.vmap(
                lambda im, k: _augment_one(
                    im, k, rotation_prob, rotation_degree, perspect_prob, perspect_degree
                )
            )(crops, keys)
        return quantize_u16(crops)

    n = len(xs)
    # dispatch every chunk (async: H2D and compute pipeline behind the
    # python loop), then ONE device-side concat + ONE fetch — each
    # np.asarray costs ~150 ms of tunnel latency regardless of size
    # (tools/perf_probe22.py), so per-chunk fetches are latency-bound
    parts: list[jax.Array] = []
    for i in range(0, n, chunk):
        batch_list = xs[i : i + chunk]
        pad = chunk - len(batch_list)
        batch = quantize_u8(np.stack(batch_list + [batch_list[-1]] * pad))
        keys = jax.random.split(jax.random.fold_in(key, i), chunk)
        parts.append(process(jnp.asarray(batch), keys))
    crops = np.asarray(jnp.concatenate(parts))[:n] if parts else np.zeros((0,) + out_size + (1,), np.uint16)
    return crops, np.asarray(ys, np.int32)


@dataclass
class ISTDataset:
    """ISTDataset equivalent (``data_preprocessing.py:110-235``); arrays
    over the whole split, indexable by batch slices.

    The image-shaped fields are DEVICE-RESIDENT by default (jax arrays;
    ``build_ist_dataset(device_resident=False)`` gives host numpy): the
    build already staged every frame to the device, so keeping them there
    removes both the build's big D2H fetches and the batch loop's
    re-staging H2D — on the tunneled 1-chip host each of those transfer
    streams costs ~150 ms latency + ~10 MB/s (tools/perf_probe22.py).
    Labels and the pre-NST IoUs stay host numpy (they feed np.save and
    sklearn-parity metric math).  A 2,552-image split holds ~1.9 GB on
    device — trivial next to the 16 GB HBM."""

    c_imgs: np.ndarray | jax.Array  # (N, H, W, 1) uint8 (dequantized on device)
    c_labels: np.ndarray  # (N,)
    c_masks_iris: np.ndarray | jax.Array  # (N, H, W//8, 1) uint8 bit-packed
    c_iris_bbs: np.ndarray | jax.Array  # (N, 4)
    c_masks_gt: np.ndarray | jax.Array  # (N, H, W//4) uint8 2-bit-packed class labels (ops.image.as_label_map)
    s_irises: np.ndarray | jax.Array  # (N, 224, 224, 1) uint16 [0,1]-quantized
    s_labels: np.ndarray  # (N,)
    ious_dev: object = None  # (4, N) pre-NST per-class IoUs, device array
    _ious_cache: np.ndarray | None = None

    def __len__(self):
        return len(self.c_labels)

    # the IoU fetch is LAZY: it is the only D2H the build would otherwise
    # force, and fetching it eagerly would serialize the whole (async)
    # build pipeline — staging H2D, seg chunks, crops — before the batch
    # loop's first NST scan could overlap them.  First access blocks on
    # the seg chunks and caches the (4, N) block.
    @property
    def ious(self) -> np.ndarray:
        if self._ious_cache is None:
            self._ious_cache = np.asarray(self.ious_dev)
        return self._ious_cache

    @property
    def mious(self) -> np.ndarray:
        # miou is the plain class-mean of the per-class IoUs
        # (ops/metrics.py:iou_per_class); f32 accumulation keeps it
        # bit-comparable to the on-device mean
        return np.mean(self.ious, axis=0, dtype=np.float32)


def build_ist_dataset(
    c_imgs: list[np.ndarray],
    c_labels: list[int],
    c_masks_gt: list[np.ndarray],
    ritnet_params: dict,
    glint_threshold: float = 0.8,
    out_size: tuple[int, int] = (224, 224),
    chunk: int = 32,  # see build_ir_dataset
    device_resident: bool = True,
) -> ISTDataset:
    """Per content image: RITnet seg, pre-NST IoUs vs GT, iris mask + bbox;
    cross-user style donor sampling + donor iris crop (``:160-199``).

    ``device_resident=True`` (default) keeps every image-shaped output on
    device — see :class:`ISTDataset` — so the only D2H fetch is the small
    (4, N) IoU block; ``False`` materializes every field as numpy instead
    (host analysis / serialization use).  In BOTH modes ``c_masks_gt`` is
    held 2-bit packed ((N, H, W//4) uint8, ``ops.image.pack_labels2``) and
    masks bit-packed — host consumers of raw labels must unpack via
    ``ops.image.unpack_labels2`` / ``as_label_map``."""
    n = len(c_imgs)
    assert n == len(c_labels) == len(c_masks_gt)

    @jax.jit
    def process(batch, seg_gt):
        batch = to_unit_float(batch)  # staged uint8 (4x less H2D)
        seg = RITnet.apply(ritnet_params, batch)
        seg_gt = as_label_map(seg_gt, seg.shape[-1])  # staged 2-bit packed
        ious, _ = iou_per_class(seg, seg_gt)  # miou re-derived on host
        masks = iris_mask_from_seg(seg, batch, glint_threshold)
        masked = batch * masks.astype(batch.dtype)
        bboxes = jax.vmap(lambda m: nonzero_bbox(m[..., 0]))(masked)
        crops = jax.vmap(lambda im, bb: crop_and_resize(im, bb, out_size))(masked, bboxes)
        # compact D2H (the tunnel moves ~10 MB/s device->host,
        # tools/perf_probe22.py): masks as bitfields (8x), crops as u16
        # (2x, error 7.6e-6); the loop's programs unpack/dequantize
        return ious, pack_mask_bits(masks), bboxes, quantize_u16(crops)

    # dispatch every chunk (async), then ONE device-side concat + ONE fetch
    # per output — per-chunk np.asarray costs ~150 ms of tunnel latency
    # each regardless of size (tools/perf_probe22.py); only the final chunk
    # is padded, so the first n rows of each concatenation are the valid ones
    parts: list[tuple] = []
    staged_frames: list[jax.Array] = []
    staged_gts: list[jax.Array] = []
    for i in range(0, n, chunk):
        batch_list = c_imgs[i : i + chunk]
        gt_list = c_masks_gt[i : i + chunk]
        pad = chunk - len(batch_list)
        batch = jnp.asarray(quantize_u8(np.stack(batch_list + [batch_list[-1]] * pad)))
        # GT class maps cross H2D 2-bit packed (4 classes -> 4x less
        # traffic); in-program unpack is a shift+mask
        gts = jnp.asarray(pack_labels2(np.stack(gt_list + [gt_list[-1]] * pad).astype(np.uint8)))
        parts.append(process(batch, gts))
        staged_frames.append(batch)
        staged_gts.append(gts)
    # NOTHING here blocks: the IoU block (the only host-bound output; it
    # fed np.save + logging) stays on device behind ISTDataset's lazy
    # ``.ious`` property, so the entire build — H2D staging, seg chunks,
    # crops, donor gather — streams behind the batch loop's first NST scans
    ious = jnp.concatenate([p[0] for p in parts], axis=1)[:, :n]
    masks = jnp.concatenate([p[1] for p in parts])[:n]
    bbs = jnp.concatenate([p[2] for p in parts])[:n]
    crops = jnp.concatenate([p[3] for p in parts])[:n]
    # the frames/GT were already staged for the seg pass — reuse those
    # device buffers instead of a second H2D (and, with device_resident,
    # instead of ANY further image-sized transfer in either direction)
    frames = jnp.concatenate(staged_frames)[:n]
    gt_arr = jnp.concatenate(staged_gts)[:n]
    # style donor: another user's masked iris crop (already computed above)
    s_idx = np.asarray([sample_other(l, c_labels) for l in c_labels])
    s_irises = jnp.take(crops, jnp.asarray(s_idx), axis=0)
    if not device_resident:
        masks, bbs, crops, frames, gt_arr, s_irises, ious = (
            np.asarray(a) for a in (masks, bbs, crops, frames, gt_arr, s_irises, ious)
        )
    return ISTDataset(
        # frames/GT cross H2D compact (u8 / 2-bit packed); the jitted
        # programs dequantize (ops.image.to_unit_float / as_label_map)
        c_imgs=frames,
        c_labels=np.asarray(c_labels, np.int32),
        c_masks_iris=masks,
        c_iris_bbs=bbs,
        c_masks_gt=gt_arr,
        s_irises=s_irises,
        s_labels=np.asarray(c_labels, np.int32)[s_idx],
        ious_dev=ious,
    )
