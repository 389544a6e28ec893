"""Golden tests: metric suite vs sklearn/torch (the reference's backends)."""

import numpy as np
import pytest
import torch
from sklearn.metrics import (
    accuracy_score,
    f1_score,
    matthews_corrcoef,
    precision_score,
    recall_score,
    roc_auc_score,
)

import jax.numpy as jnp

from iris_style_transfer_tpu.ops import (
    angular_distance,
    classification_metrics,
    cosine_embedding_loss,
    cross_entropy,
    iou_per_class,
    roc_auc_ovr,
)


def _logits_labels(n=64, k=7, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((n, k)).astype(np.float32) * 2
    labels = rng.integers(0, k, size=n)
    return logits, labels


def test_classification_metrics_match_sklearn():
    logits, labels = _logits_labels()
    k = logits.shape[1]
    m = classification_metrics(jnp.asarray(labels), jnp.asarray(logits), num_class=k)

    want_loss = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(labels)
    ).item()
    assert float(m["loss"]) == pytest.approx(want_loss, rel=1e-5)

    preds = logits.argmax(axis=1)
    assert float(m["accu"]) == pytest.approx(accuracy_score(labels, preds), abs=1e-6)
    assert float(m["mcc"]) == pytest.approx(matthews_corrcoef(labels, preds), abs=1e-6)
    assert float(m["prec"]) == pytest.approx(
        precision_score(labels, preds, average="macro", zero_division=0), abs=1e-6
    )
    assert float(m["recl"]) == pytest.approx(
        recall_score(labels, preds, average="macro", zero_division=0), abs=1e-6
    )
    assert float(m["f1"]) == pytest.approx(
        f1_score(labels, preds, average="macro", zero_division=0), abs=1e-6
    )

    probs = torch.softmax(torch.from_numpy(logits), dim=1).numpy()
    want_auc = roc_auc_score(labels, probs, multi_class="ovr")
    assert float(m["auc"]) == pytest.approx(want_auc, abs=1e-5)


def test_auc_fallback_matches_reference():
    # a class with zero positives -> sklearn raises -> reference logs -1
    logits, labels = _logits_labels(n=32, k=5, seed=1)
    labels[labels == 3] = 2  # class 3 absent
    probs = jnp.asarray(torch.softmax(torch.from_numpy(logits), dim=1).numpy())
    assert float(roc_auc_ovr(jnp.asarray(labels), probs)) == -1.0


def test_auc_with_ties():
    rng = np.random.default_rng(2)
    probs = rng.integers(0, 3, size=(50, 3)).astype(np.float64) + 1.0  # heavy ties
    probs = probs / probs.sum(axis=1, keepdims=True)
    labels = rng.integers(0, 3, size=50)
    if len(np.unique(labels)) == 3:
        want = roc_auc_score(labels, probs, multi_class="ovr")
        got = float(roc_auc_ovr(jnp.asarray(labels), jnp.asarray(probs)))
        assert got == pytest.approx(want, abs=1e-5)


def test_iou_matches_reference_formula():
    rng = np.random.default_rng(3)
    preds = rng.integers(0, 4, size=(5, 16, 20))
    targs = rng.integers(0, 4, size=(5, 16, 20))
    ious, miou = iou_per_class(jnp.asarray(preds), jnp.asarray(targs))
    # reference formula (utils.py:163-194) in numpy:
    per = []
    for cls in range(4):
        p = (preds == cls).astype(np.float32)
        t = (targs == cls).astype(np.float32)
        inter = (p * t).sum(axis=(1, 2))
        union = np.clip(p + t, 0, 1).sum(axis=(1, 2))
        per.append(inter / (union + 1e-6))
    per = np.stack(per)
    np.testing.assert_allclose(np.asarray(ious), per, atol=1e-6)
    np.testing.assert_allclose(np.asarray(miou), per.mean(axis=0), atol=1e-6)


def test_angular_distance_matches_torch():
    rng = np.random.default_rng(4)
    v1 = rng.standard_normal((10, 3)).astype(np.float32)
    v2 = rng.standard_normal((10, 3)).astype(np.float32)
    v1 /= np.linalg.norm(v1, axis=1, keepdims=True)
    v2 /= np.linalg.norm(v2, axis=1, keepdims=True)
    rad, deg = angular_distance(jnp.asarray(v1), jnp.asarray(v2))
    dot = np.clip((v1 * v2).sum(axis=1), -1, 1)
    np.testing.assert_allclose(np.asarray(rad), np.arccos(dot), atol=1e-5)
    np.testing.assert_allclose(np.asarray(deg), np.degrees(np.arccos(dot)), atol=1e-3)


def test_cosine_embedding_loss_matches_torch():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((12, 3)).astype(np.float32)
    y = rng.standard_normal((12, 3)).astype(np.float32)
    got = float(cosine_embedding_loss(jnp.asarray(x), jnp.asarray(y)))
    want = torch.nn.CosineEmbeddingLoss()(
        torch.from_numpy(x), torch.from_numpy(y), torch.tensor([1])
    ).item()
    assert got == pytest.approx(want, rel=1e-5)
