"""Tests for static-shape image primitives: bbox/crop/composite/warp/CLAHE."""

import cv2
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from iris_style_transfer_tpu.ops import (
    clahe,
    composite_iris,
    crop_and_resize,
    gamma_lut,
    gray_to_rgb,
    nonzero_bbox,
    paste_resized,
    resize_bilinear,
    rgb_to_grayscale,
    rotate,
)


def test_nonzero_bbox_matches_reference_crop():
    # reference crop_image (utils.py:44-72): min/max of nonzero indices
    img = np.zeros((20, 30), np.float32)
    img[5:12, 8:25] = 1.0
    bb = np.asarray(nonzero_bbox(jnp.asarray(img)))
    assert list(bb) == [5, 8, 11, 24]


def test_nonzero_bbox_empty_mask_total():
    bb = np.asarray(nonzero_bbox(jnp.zeros((10, 12))))
    assert list(bb) == [0, 0, 9, 11]


def test_resize_bilinear_close_to_torch():
    rng = np.random.default_rng(0)
    x = rng.random((1, 64, 48, 1)).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), (224, 224)))
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = torch.nn.functional.interpolate(
        tx, size=(224, 224), mode="bilinear", antialias=True
    ).permute(0, 2, 3, 1).numpy()
    assert np.abs(got - want).mean() < 5e-3


def test_resize_downscale_close_to_torch():
    rng = np.random.default_rng(1)
    x = rng.random((1, 300, 200, 1)).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), (100, 100)))
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = torch.nn.functional.interpolate(
        tx, size=(100, 100), mode="bilinear", antialias=True
    ).permute(0, 2, 3, 1).numpy()
    assert np.abs(got - want).mean() < 5e-3


def test_crop_and_resize_matches_crop_then_resize():
    rng = np.random.default_rng(2)
    img = rng.random((60, 80, 1)).astype(np.float32)
    bbox = jnp.asarray([10, 20, 39, 59])  # 30x40 crop
    got = np.asarray(crop_and_resize(jnp.asarray(img), bbox, (224, 224)))
    crop = img[10:40, 20:60]
    want = torch.nn.functional.interpolate(
        torch.from_numpy(crop).permute(2, 0, 1)[None],
        size=(224, 224),
        mode="bilinear",
        antialias=False,
    )[0].permute(1, 2, 0).numpy()
    # plain bilinear sampling: identical on upscale
    assert np.abs(got - want).max() < 1e-4


def test_paste_resized_roundtrip():
    rng = np.random.default_rng(3)
    patch = rng.random((224, 224, 1)).astype(np.float32)
    bbox = jnp.asarray([5, 7, 34, 46])  # 30x40 region
    pasted, inside = paste_resized((60, 80), jnp.asarray(patch), bbox)
    pasted = np.asarray(pasted)
    inside = np.asarray(inside)
    assert pasted.shape == (60, 80, 1)
    assert inside[:, :, 0].sum() == 30 * 40
    assert np.all(pasted[~inside[:, :, 0].astype(bool)] == 0)
    # values inside come from the patch value range
    assert pasted[inside[:, :, 0].astype(bool)].min() >= patch.min() - 1e-5


def test_matmul_resize_matches_gather_path():
    # the separable-matmul resample must agree with the 4-tap gather form
    # on every bbox shape incl. edge-clamped and degenerate 1-px crops
    from iris_style_transfer_tpu.ops import image as image_mod

    rng = np.random.default_rng(7)
    img = rng.random((60, 80, 1)).astype(np.float32)
    patch = rng.random((32, 32, 1)).astype(np.float32)
    bboxes = [
        [10, 20, 39, 59],
        [0, 0, 59, 79],     # full frame
        [0, 0, 0, 0],       # 1-px crop (edge replicate everywhere)
        [58, 78, 59, 79],   # bottom-right corner
    ]
    assert image_mod.MATMUL_RESIZE
    for bb in bboxes:
        bbox = jnp.asarray(bb)
        a_crop = np.asarray(crop_and_resize(jnp.asarray(img), bbox, (48, 48)))
        a_paste = np.asarray(paste_resized((60, 80), jnp.asarray(patch), bbox)[0])
        image_mod.MATMUL_RESIZE = False
        try:
            b_crop = np.asarray(crop_and_resize(jnp.asarray(img), bbox, (48, 48)))
            b_paste = np.asarray(paste_resized((60, 80), jnp.asarray(patch), bbox)[0])
        finally:
            image_mod.MATMUL_RESIZE = True
        assert np.abs(a_crop - b_crop).max() < 1e-5, bb
        assert np.abs(a_paste - b_paste).max() < 1e-5, bb


def test_mask_bitpack_and_u16_roundtrip():
    from iris_style_transfer_tpu.ops.image import (
        as_bool_mask,
        pack_mask_bits,
        quantize_u16,
        to_unit_float,
        unpack_mask_bits,
    )

    rng = np.random.default_rng(3)
    m = rng.random((2, 40, 64, 1)) > 0.5
    p = pack_mask_bits(jnp.asarray(m))
    assert p.shape == (2, 40, 8, 1) and p.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(unpack_mask_bits(p)), m)
    # as_bool_mask dispatches on dtype: packed u8, bool, float all work
    np.testing.assert_array_equal(np.asarray(as_bool_mask(p)), m)
    np.testing.assert_array_equal(np.asarray(as_bool_mask(jnp.asarray(m))), m)
    np.testing.assert_array_equal(
        np.asarray(as_bool_mask(jnp.asarray(m, jnp.float32))), m
    )
    # u16 quantize: max error bounded by half a level
    x = rng.random((33, 17, 1)).astype(np.float32)
    back = np.asarray(to_unit_float(quantize_u16(jnp.asarray(x))))
    assert np.abs(back - x).max() <= 0.5 / 65535 + 1e-9


def test_gamma_direct_matches_lut_exhaustively():
    # the gather-free gamma must equal the reference's uint8-truncated
    # 256-entry LUT (255*linspace(0,1,256)**g).astype(uint8) at EVERY level
    from iris_style_transfer_tpu.ops.image import gamma_lut

    for g in (0.8, 0.45, 1.2):
        # comparator is the prior implementation's jnp f32 table (it differs
        # from a float64 numpy table by one level at g=0.45/idx 128 — that
        # f32 semantics is the contract the direct form preserves; the cv2
        # golden at the production gamma 0.8 is asserted separately below)
        table = np.asarray(
            (255.0 * jnp.linspace(0.0, 1.0, 256) ** g).astype(jnp.uint8)
        )
        x = jnp.asarray(np.arange(256, dtype=np.float32) / 255.0)
        got = np.round(np.asarray(gamma_lut(x, g)) * 255.0).astype(np.uint8)
        mism = np.nonzero(got != table)[0]
        assert mism.size == 0, (g, mism[:10], got[mism[:10]], table[mism[:10]])


def test_composite_iris_semantics():
    # frame * (1-m) + stylized_resized * m, m = iris_mask & bbox
    frame = np.full((40, 50, 1), 0.25, np.float32)
    stylized = np.full((224, 224, 1), 0.75, np.float32)
    mask = np.zeros((40, 50, 1), bool)
    mask[10:20, 15:30] = True
    bbox = jnp.asarray([10, 15, 19, 29])
    out = np.array(
        composite_iris(jnp.asarray(frame), jnp.asarray(stylized), jnp.asarray(mask), bbox)
    )
    assert np.allclose(out[10:20, 15:30], 0.75, atol=1e-5)
    out[10:20, 15:30] = 0.25
    assert np.allclose(out, 0.25)


def test_grayscale_matches_torchvision_weights():
    rng = np.random.default_rng(4)
    x = rng.random((8, 8, 3)).astype(np.float32)
    got = np.asarray(rgb_to_grayscale(jnp.asarray(x)))
    want = (0.2989 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])[..., None]
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert gray_to_rgb(jnp.asarray(want)).shape == (8, 8, 3)


def test_gamma_lut_matches_cv2():
    table = 255.0 * (np.linspace(0, 1, 256) ** 0.8)  # ritnet.py:72
    rng = np.random.default_rng(5)
    u8 = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    want = cv2.LUT(u8, table).astype(np.uint8)
    x = u8.astype(np.float32) / 255.0
    got = (np.asarray(gamma_lut(jnp.asarray(x))) * 255.0).round().astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_clahe_matches_cv2():
    rng = np.random.default_rng(6)
    u8 = rng.integers(0, 256, size=(400, 640), dtype=np.uint8)
    # add structure so histograms are non-uniform
    yy, xx = np.mgrid[0:400, 0:640]
    u8 = ((u8 * 0.3) + 80 * np.exp(-(((yy - 200) ** 2 + (xx - 320) ** 2) / 20000.0))).astype(
        np.uint8
    )
    want = cv2.createCLAHE(clipLimit=1.5, tileGridSize=(8, 8)).apply(u8)
    x = u8.astype(np.float32) / 255.0
    got = (np.asarray(clahe(jnp.asarray(x))) * 255.0).round().astype(np.int32)
    diff = np.abs(got - want.astype(np.int32))
    # bit-level parity modulo cv2's fixed-point interpolation: allow <=1 LSB
    # on a small fraction of pixels
    assert (diff > 1).mean() < 0.01, f"max={diff.max()}, frac>1={(diff > 1).mean()}"


def test_clahe_matmul_apply_matches_gather():
    # the per-region one-hot-matmul LUT apply must equal the 4-gather form
    # (it's the same blend; u8 LUT values are exact in bf16 + f32 accum);
    # also cover an odd-tile shape that falls back to the gather path
    import importlib

    # ops.__init__ re-exports the clahe *function*, shadowing the submodule
    clahe_mod = importlib.import_module("iris_style_transfer_tpu.ops.clahe")

    rng = np.random.default_rng(11)
    assert clahe_mod.MATMUL_LUT_APPLY
    for shape in ((400, 640), (128, 192)):  # th,tw even in both
        x = (rng.integers(0, 256, size=shape).astype(np.float32)) / 255.0
        a = np.asarray(clahe_mod.clahe(jnp.asarray(x)))
        clahe_mod.MATMUL_LUT_APPLY = False
        try:
            b = np.asarray(clahe_mod.clahe(jnp.asarray(x)))
        finally:
            clahe_mod.MATMUL_LUT_APPLY = True
        np.testing.assert_array_equal(a, b, err_msg=str(shape))
    # odd tile sides (75//8 etc.) must route to the gather fallback, not crash
    x = (rng.integers(0, 256, size=(72, 104)).astype(np.float32)) / 255.0
    out = np.asarray(clahe_mod.clahe(jnp.asarray(x)))
    assert out.shape == (72, 104)


def test_rotate_identity_and_90():
    rng = np.random.default_rng(7)
    img = rng.random((21, 21, 1)).astype(np.float32)
    out0 = np.asarray(rotate(jnp.asarray(img), jnp.float32(0.0)))
    np.testing.assert_allclose(out0, img, atol=1e-5)
    out90 = np.asarray(rotate(jnp.asarray(img), jnp.float32(90.0)))
    np.testing.assert_allclose(out90[:, :, 0], np.rot90(img[:, :, 0], 1), atol=1e-4)


def test_pack_labels2_roundtrip_and_dispatch():
    """2-bit GT label packing (4-class OpenEDS maps, 4x less H2D): numpy
    host pack -> device unpack must be exact, and as_label_map must
    dispatch on the packed-vs-raw trailing extent."""
    from iris_style_transfer_tpu.ops.image import (
        as_label_map,
        pack_labels2,
        unpack_labels2,
    )

    rng = np.random.default_rng(11)
    seg = rng.integers(0, 4, size=(3, 40, 64)).astype(np.uint8)
    packed = pack_labels2(seg)  # host-side numpy
    assert isinstance(packed, np.ndarray) and packed.shape == (3, 40, 16)
    np.testing.assert_array_equal(np.asarray(unpack_labels2(jnp.asarray(packed))), seg)
    # jax-side packing agrees with the numpy pack
    np.testing.assert_array_equal(np.asarray(pack_labels2(jnp.asarray(seg))), packed)
    # dispatch: packed input unpacks, raw input passes through
    np.testing.assert_array_equal(np.asarray(as_label_map(jnp.asarray(packed), 64)), seg)
    np.testing.assert_array_equal(np.asarray(as_label_map(jnp.asarray(seg), 64)), seg)
