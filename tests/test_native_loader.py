"""Native C++ decode stage vs PIL (skipped when the .so isn't built)."""

import os
import tempfile

import numpy as np
import pytest
from PIL import Image

from iris_style_transfer_tpu.data import native_loader


@pytest.fixture(scope="module")
def image_files():
    tmp = tempfile.mkdtemp()
    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        arr = rng.integers(0, 256, size=(64, 80), dtype=np.uint8)
        p = os.path.join(tmp, f"g{i}.png")
        Image.fromarray(arr, "L").save(p)
        paths.append((p, arr))
    # an RGB png and a jpeg too
    rgb = rng.integers(0, 256, size=(64, 80, 3), dtype=np.uint8)
    p = os.path.join(tmp, "rgb.png")
    Image.fromarray(rgb, "RGB").save(p)
    paths.append((p, np.asarray(Image.open(p).convert("L"))))
    pj = os.path.join(tmp, "g.jpg")
    Image.fromarray(rng.integers(0, 256, size=(64, 80), dtype=np.uint8), "L").save(pj, quality=95)
    paths.append((pj, np.asarray(Image.open(pj).convert("L"))))
    return paths


@pytest.mark.skipif(not native_loader.available(), reason="native lib not built")
def test_native_decode_matches_pil(image_files):
    paths = [p for p, _ in image_files]
    want = np.stack([a for _, a in image_files]).astype(np.float32) / 255.0
    got = native_loader.decode_gray_batch(paths, 64, 80, threads=4)[..., 0]
    # grayscale PNGs must be exact; RGB->L and JPEG within 1-2 levels
    np.testing.assert_allclose(got, want, atol=2.5 / 255.0)
    np.testing.assert_allclose(got[:6], want[:6], atol=1e-6)


def test_u8_decode_matches_f32(image_files):
    # dtype=uint8 must be the same decode without the /255 (native or PIL)
    paths = [p for p, _ in image_files]
    f = native_loader.decode_gray_batch(paths, 64, 80)[..., 0]
    u = native_loader.decode_gray_batch(paths, 64, 80, dtype=np.uint8)[..., 0]
    assert u.dtype == np.uint8
    np.testing.assert_array_equal(u, np.round(f * 255.0).astype(np.uint8))


def test_pil_fallback_path(image_files, monkeypatch):
    monkeypatch.setattr(native_loader, "_load", lambda: None)
    paths = [p for p, _ in image_files[:3]]
    want = np.stack([a for _, a in image_files[:3]]).astype(np.float32) / 255.0
    got = native_loader.decode_gray_batch(paths, 64, 80)[..., 0]
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.skipif(not native_loader.available(), reason="native lib not built")
def test_native_decode_size_mismatch_raises(image_files):
    with pytest.raises(IOError):
        native_loader.decode_gray_batch([image_files[0][0]], 32, 32)


@pytest.mark.skipif(not native_loader.available(), reason="native lib not built")
def test_native_decode_corrupt_jpeg_fails_without_killing_process(image_files):
    """libjpeg's DEFAULT error handler calls exit() on a corrupt file — one
    bad frame in a 550K-frame dataset would take down the whole training
    process.  The loader installs a setjmp trap instead; a truncated JPEG
    must surface as the documented IOError, with the process intact."""
    import tempfile as tf

    tmp = tf.mkdtemp()
    rng = np.random.default_rng(3)
    good = os.path.join(tmp, "good.jpg")
    Image.fromarray(
        rng.integers(0, 256, size=(64, 80), dtype=np.uint8), "L"
    ).save(good, quality=95)
    data = open(good, "rb").read()
    # truncation: libjpeg pads with gray and calls it a WARNING — the
    # loader must fail it like PIL does, not return silently-corrupt data
    trunc = os.path.join(tmp, "trunc.jpg")
    open(trunc, "wb").write(data[: len(data) // 3])
    # garbage body: drives libjpeg's error_exit (the path that would have
    # exit()'d the process under the default handler)
    garbage = os.path.join(tmp, "garbage.jpg")
    open(garbage, "wb").write(data[:4] + b"\x00" * 256)

    with pytest.raises(IOError, match="failed"):
        native_loader.decode_gray_batch([good, trunc], 64, 80)
    with pytest.raises(IOError, match="failed"):
        native_loader.decode_gray_batch([good, garbage], 64, 80)
    # process alive, and the good file still decodes
    out = native_loader.decode_gray_batch([good], 64, 80)
    assert out.shape == (1, 64, 80, 1)


@pytest.mark.skipif(not native_loader.available(), reason="native lib not built")
def test_native_decode_gray_alpha_png_matches_pil():
    """Gray+alpha PNGs (including tRNS-derived alpha) must decode to PIL
    'L' values — the alpha is discarded, never misread as a color
    channel."""
    import tempfile as tf

    tmp = tf.mkdtemp()
    rng = np.random.default_rng(4)
    la = rng.integers(0, 256, size=(32, 40, 2), dtype=np.uint8)
    p = os.path.join(tmp, "la.png")
    Image.fromarray(la, "LA").save(p)
    want = np.asarray(Image.open(p).convert("L"), np.float32) / 255.0

    out = native_loader.decode_gray_batch([p], 32, 40)
    np.testing.assert_allclose(out[0, ..., 0], want, atol=1 / 255.0)
