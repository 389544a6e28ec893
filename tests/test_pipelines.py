"""Pipeline tests: iris extraction, composition, end-to-end IST on
synthetic eyes with known ground-truth segmentation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iris_style_transfer_tpu.data import synthetic_eye_batch
from iris_style_transfer_tpu.ops.image import crop_and_resize, nonzero_bbox
from iris_style_transfer_tpu.pipelines import composite_batch, extract_iris_batch
from iris_style_transfer_tpu.pipelines.iris import iris_mask_from_seg


@pytest.fixture(scope="module")
def eyes():
    imgs, segs, users = synthetic_eye_batch(4, height=96, width=128, seed=3)
    return jnp.asarray(imgs), jnp.asarray(segs), users


def test_iris_mask_semantics(eyes):
    imgs, segs, _ = eyes
    masks = iris_mask_from_seg(segs, imgs, 0.8)
    m = np.asarray(masks)
    seg = np.asarray(segs)
    img = np.asarray(imgs)
    # mask == (seg==2) & (img <= 0.8)  (pipelines.py:147-154)
    want = (seg == 2)[..., None] & (img <= 0.8)
    np.testing.assert_array_equal(m, want)


def test_extract_iris_batch_shapes_and_content(eyes):
    imgs, segs, _ = eyes
    irises, masks, bboxes = extract_iris_batch(imgs, segs, out_size=(64, 64))
    assert irises.shape == (4, 64, 64, 3)
    assert masks.shape == imgs.shape
    assert bboxes.shape == (4, 4)
    # the crop is non-trivial (iris region found) and non-black
    assert float(irises.max()) > 0.05
    bb = np.asarray(bboxes)
    assert np.all(bb[:, 2] > bb[:, 0]) and np.all(bb[:, 3] > bb[:, 1])


def test_composite_preserves_outside_region(eyes):
    imgs, segs, _ = eyes
    irises, masks, bboxes = extract_iris_batch(imgs, segs, out_size=(64, 64))
    stylized = jnp.ones_like(irises) * 0.5  # constant gray "stylized" iris
    out = composite_batch(imgs, stylized, masks, bboxes)
    out_np = np.asarray(out)
    img_np = np.asarray(imgs)
    m = np.asarray(masks)
    # outside the iris mask the frame is untouched
    np.testing.assert_allclose(out_np[~m], img_np[~m], atol=1e-6)
    # inside, the new value is the stylized gray
    assert np.abs(out_np[m] - 0.5).max() < 1e-2


def test_crop_resize_paste_roundtrip(eyes):
    """Cropping then pasting back at the same bbox approximates identity
    inside the bbox (up to resample error)."""
    imgs, segs, _ = eyes
    img = imgs[0]
    seg = segs[0]
    mask = iris_mask_from_seg(seg[None], img[None], 0.8)[0]
    masked = img * mask
    bb = nonzero_bbox(masked[..., 0])
    crop = crop_and_resize(masked, bb, (224, 224))
    crop_rgb = jnp.repeat(crop, 3, axis=-1)
    out = composite_batch(img[None], crop_rgb[None], mask[None], bb[None])
    inside = np.asarray(mask[..., 0]).astype(bool)
    err = np.abs(np.asarray(out[0])[inside] - np.asarray(img)[inside])
    assert err.mean() < 0.05
