"""Model zoo tests: shapes, ported RITnet weights, behavioral checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iris_style_transfer_tpu.data import synthetic_eye_batch
from iris_style_transfer_tpu.models import (
    Classifier1,
    Classifier2,
    GazeEstimator1,
    GazeEstimator1Complicated,
    GazeEstimator2,
    RITnet,
    VGG19,
)
from iris_style_transfer_tpu.models.classifiers import STYLE_FEATURE_DIM


def test_vgg19_tap_shapes():
    params = VGG19.init(jax.random.PRNGKey(0))
    x = jnp.ones((1, 224, 224, 3)) * 0.5
    final, content, style = VGG19.apply(params, x)
    assert final.shape == (1, 7, 7, 512)  # pool5 output for the classifier
    assert content[0].shape == (1, 28, 28, 512)  # relu4_2
    assert [s.shape[-1] for s in style] == [64, 128, 256, 512]
    assert [s.shape[1] for s in style] == [224, 112, 56, 28]


def test_vgg19_truncate_consistent():
    params = VGG19.init(jax.random.PRNGKey(0))
    x = jnp.ones((1, 64, 64, 3)) * 0.3
    _, c1, s1 = VGG19.apply(params, x)
    _, c2, s2 = VGG19.apply(params, x, truncate=True)
    for a, b in zip(c1 + s1, c2 + s2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_vgg19_mask_multiply():
    params = VGG19.init(jax.random.PRNGKey(0))
    x = jnp.ones((1, 64, 64, 3)) * 0.5
    mask = jnp.zeros((1, 64, 64, 1))
    f_masked, _, _ = VGG19.apply(params, x, mask=mask)
    f_zero, _, _ = VGG19.apply(params, jnp.zeros_like(x) - 100.0, mask=jnp.zeros((1, 64, 64, 1)))
    # masked input == zeroed normalized input (vgg.py:84-85)
    np.testing.assert_allclose(np.asarray(f_masked), np.asarray(f_zero), atol=1e-5)


def test_ritnet_pretrained_segments_synthetic_eye():
    params = RITnet.pretrained()
    imgs, segs, _ = synthetic_eye_batch(2, height=192, width=256, seed=1)
    out = RITnet.apply(params, jnp.asarray(imgs))
    assert out.shape == (2, 192, 256)
    labels = np.asarray(out)
    assert set(np.unique(labels)).issubset({0, 1, 2, 3})
    # the network is trained on real eyes; on synthetic eyes we only require
    # that it produces a non-degenerate multi-class segmentation
    assert len(np.unique(labels)) >= 2


def test_classifier_heads():
    k = jax.random.PRNGKey(0)
    c1 = Classifier1.init(k, num_class=10)
    c2 = Classifier2.init(k, num_class=10)
    feats = jnp.ones((3, 7, 7, 512)) * 0.1
    style = [jnp.ones((3, 16, 16, c)) * 0.1 for c in (64, 128, 256, 512)]
    assert Classifier1.apply(c1, feats).shape == (3, 10)
    assert Classifier2.apply(c2, style).shape == (3, 10)
    assert Classifier2.features(style).shape == (3, STYLE_FEATURE_DIM)


def test_classifier2_style_features_mean_std_order():
    # per layer: concat([mean, std], 1), layers concatenated (classifiers.py:71)
    rng = np.random.default_rng(0)
    f = rng.random((2, 8, 8, 4)).astype(np.float32)
    out = np.asarray(Classifier2.features([jnp.asarray(f)]))
    want_mean = f.mean(axis=(1, 2))
    want_std = f.std(axis=(1, 2), ddof=1)
    np.testing.assert_allclose(out[:, :4], want_mean, atol=1e-5)
    np.testing.assert_allclose(out[:, 4:], want_std, atol=1e-5)


def test_gaze_estimators_normalized_output():
    k = jax.random.PRNGKey(0)
    g1 = GazeEstimator1.init(k)
    out = GazeEstimator1.apply(g1, jnp.ones((5, 19)))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1), 1.0, atol=1e-5)
    g2 = GazeEstimator2.init(k)
    out = GazeEstimator2.apply(g2, jnp.ones((5, 2048)))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1), 1.0, atol=1e-5)


def test_gaze_estimator1_from_segmentation():
    k = jax.random.PRNGKey(0)
    g1 = GazeEstimator1.init(k)
    _, segs, _ = synthetic_eye_batch(2, height=400, width=640, seed=2)
    out = GazeEstimator1.apply(g1, jnp.asarray(segs), extract_feature=True)
    assert out.shape == (2, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_gaze_estimator1_complicated():
    k = jax.random.PRNGKey(0)
    g = GazeEstimator1Complicated.init(k)
    _, segs, _ = synthetic_eye_batch(2, height=96, width=128, seed=2)
    lm = jnp.ones((2, 19))
    out = GazeEstimator1Complicated.apply(g, jnp.asarray(segs), lm)
    assert out.shape == (2, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1), 1.0, atol=1e-5)


def test_mbconv_pallas_dw_matches_xla(monkeypatch):
    """The PALLAS_DW wiring in _mbconv (flag-gated off by default) must be
    numerically equivalent to the XLA composition; interpret mode + a
    shape-only supported() gate stand in for the TPU backend here."""
    import functools

    from iris_style_transfer_tpu.models import efficientnet as eff
    from iris_style_transfer_tpu.ops import pallas_depthwise as pdw

    key = jax.random.PRNGKey(9)
    expand, k, cin, cout = 6, 3, 32, 32
    p = eff._init_mbconv(key, expand, k, cin, cout, jnp.float32)
    x = jax.random.uniform(jax.random.fold_in(key, 1), (2, 16, 20, cin))

    want = eff._mbconv(p, x, expand, k, 1, cin, cout)

    monkeypatch.setattr(
        pdw, "supported",
        lambda shape, kk, stride, itemsize=2: stride == 1 and kk % 2 == 1
        and len(shape) == 4
        and pdw._pick_rows(shape[1], shape[2], shape[3], itemsize) is not None,
    )
    monkeypatch.setattr(
        pdw, "dw_conv_bn_silu",
        functools.partial(pdw.dw_conv_bn_silu.__wrapped__, interpret=True),
    )
    monkeypatch.setattr(eff, "PALLAS_DW", True)
    got = eff._mbconv(p, x, expand, k, 1, cin, cout)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3
    )
