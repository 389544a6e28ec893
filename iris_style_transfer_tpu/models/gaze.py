"""Gaze estimators.

Reference: ``models/gaze_estimators/gaze_estimators.py``
  * GazeEstimator1 (``:8-53``): model-based — 19-d landmark vector -> MLP
    (64) -> 3-d gaze, L2-normalized; can internally extract landmarks from
    segmentation maps (the reference loops one image at a time on the host
    through OpenCV; here it is a vmapped on-device landmark extractor).
  * GazeEstimator2 (``:180-223``): appearance-based — ResNet50 2048-d ->
    MLP(64) -> normalized 3-d gaze; optionally owns a (frozen or trainable)
    ResNet50.
  * GazeEstimator1_complicated (``:225-301``): CNN-on-segmap + landmark-MLP
    fusion head — exported for API parity, experimental/unused by scripts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.ellipse import extract_eye_landmarks
from . import layers as L
from .resnet import ResNet50


def _normalize(x: jax.Array) -> jax.Array:
    return x / jnp.linalg.norm(x, axis=1, keepdims=True)


def find_ellipse_features(mask, select_largest: bool = True):
    """Reference API (``gaze_estimators.py:55-83``): fit an ellipse to a
    binary mask, returning ``(cx, cy, major_axis, minor_axis, angle)`` or
    all-None when no valid fit.  Host-convenience wrapper around the
    jittable :func:`iris_style_transfer_tpu.ops.ellipse.fit_ellipse_mask`
    (moment-based on the largest component, replacing cv2 contours)."""
    from ..ops.ellipse import fit_ellipse_mask

    out = fit_ellipse_mask(jnp.asarray(mask).astype(bool), select_largest)
    cx, cy, major, minor, angle, valid = (float(v) for v in out)
    if valid == 0.0:
        return None, None, None, None, None
    return cx, cy, major, minor, angle


def find_eye_corners(mask):
    """Reference API (``gaze_estimators.py:85-106``): sclera-mask extents
    ``(left, right, bottom, top)`` or all-None when empty."""
    from ..ops.ellipse import eye_corners

    out = eye_corners(jnp.asarray(mask).astype(bool))
    left, right, bottom, top, valid = (float(v) for v in out)
    if valid == 0.0:
        return None, None, None, None
    return int(left), int(right), int(bottom), int(top)


def _mlp_init(key, din, hidden, dout, dtype):
    k0, k1, k2 = jax.random.split(key, 3)
    return {
        "fc0": L.init_linear(k0, din, hidden, dtype),
        "fc1": L.init_linear(k1, hidden, hidden, dtype),
        "fc2": L.init_linear(k2, hidden, dout, dtype),
    }


def _mlp_apply(params, x, train=False, dropout_key=None):
    k0, k1 = jax.random.split(dropout_key) if dropout_key is not None else (None, None)
    x = jax.nn.relu(L.linear(x, params["fc0"]))
    x = L.dropout(x, 0.5, k0, train)
    x = jax.nn.relu(L.linear(x, params["fc1"]))
    x = L.dropout(x, 0.5, k1, train)
    return L.linear(x, params["fc2"])


class GazeEstimator1:
    LANDMARK_DIM = 19

    @staticmethod
    def init(key, landmark_dim: int = 19, hidden_dim: int = 64, dtype=jnp.float32):
        return _mlp_init(key, landmark_dim, hidden_dim, 3, dtype)

    @staticmethod
    def apply(
        params: dict,
        x: jax.Array,
        extract_feature: bool = False,
        train: bool = False,
        dropout_key: jax.Array | None = None,
    ) -> jax.Array:
        """x: (B, 19) landmarks, or (B, H, W) segmentation maps when
        ``extract_feature`` (reference ``gaze_estimators.py:36-53``)."""
        if extract_feature:
            x = jax.vmap(extract_eye_landmarks)(x)
        out = _mlp_apply(params, x, train, dropout_key)
        return _normalize(out)


class GazeEstimator2:
    @staticmethod
    def init(
        key,
        hidden_dim: int = 64,
        extract_feature: bool = False,
        dtype=jnp.float32,
    ):
        k_mlp, k_res = jax.random.split(key)
        params = {"head": _mlp_init(k_mlp, 2048, hidden_dim, 3, dtype)}
        if extract_feature:
            params["resnet"] = ResNet50.init(k_res, dtype)
        return params

    @staticmethod
    def apply(
        params: dict,
        x: jax.Array,
        extract_feature: bool = False,
        train: bool = False,
        dropout_key: jax.Array | None = None,
        compute_dtype=jnp.float32,
    ) -> jax.Array:
        """x: (B, 2048) features, or (B, H, W, C) images when
        ``extract_feature`` (reference ``gaze_estimators.py:210-223``).
        ``compute_dtype`` reaches the ResNet backbone (bf16 runs the
        full-res feature extraction on the MXU's fast path, f32 head)."""
        if extract_feature:
            x = ResNet50.apply(params["resnet"], x, compute_dtype=compute_dtype)
        out = _mlp_apply(params["head"], x, train, dropout_key)
        return _normalize(out)


class GazeEstimator1Complicated:
    """CNN-on-segmap + landmark-MLP fusion (``gaze_estimators.py:225-301``).
    Exported for API parity; unused by the reference's scripts."""

    @staticmethod
    def init(key, landmark_dim: int = 19, hidden_dim: int = 64, dtype=jnp.float32):
        ks = jax.random.split(key, 9)
        return {
            "conv0": L.init_conv(ks[0], 3, 3, 1, hidden_dim, dtype),
            "bn0": L.init_batchnorm(hidden_dim, dtype),
            "conv1": L.init_conv(ks[1], 3, 3, hidden_dim, hidden_dim, dtype),
            "bn1": L.init_batchnorm(hidden_dim, dtype),
            "conv2": L.init_conv(ks[2], 1, 1, hidden_dim, hidden_dim, dtype),
            "bn2": L.init_batchnorm(hidden_dim, dtype),
            "lm_fc0": L.init_linear(ks[3], landmark_dim, hidden_dim, dtype),
            "lm_fc1": L.init_linear(ks[4], hidden_dim, hidden_dim, dtype),
            "proj_fc0": L.init_linear(ks[5], 2 * hidden_dim, hidden_dim, dtype),
            "proj_fc1": L.init_linear(ks[6], hidden_dim, 3, dtype),
        }

    @staticmethod
    def apply(
        params: dict,
        segmap: jax.Array,
        landmarks: jax.Array | None = None,
        extract_feature: bool = False,
        train: bool = False,
        dropout_key: jax.Array | None = None,
    ) -> jax.Array:
        if extract_feature:
            landmarks = jax.vmap(extract_eye_landmarks)(segmap)
        x1 = segmap.astype(jnp.float32)[..., None]  # (B, H, W, 1)
        x1 = jax.nn.relu(L.batchnorm(L.conv2d(x1, params["conv0"], padding=1), params["bn0"]))
        x1 = L.max_pool(x1, 2, 2)
        x1 = jax.nn.relu(L.batchnorm(L.conv2d(x1, params["conv1"], padding=1), params["bn1"]))
        x1 = L.max_pool(x1, 2, 2)
        # reference uses kernel 1 with padding 1 (gaze_estimators.py:252)
        x1 = jax.nn.relu(L.batchnorm(L.conv2d(x1, params["conv2"], padding=1), params["bn2"]))
        x1 = jnp.mean(x1, axis=(1, 2))  # AdaptiveAvgPool (1,1) + flatten

        k0, k1 = (
            jax.random.split(dropout_key) if dropout_key is not None else (None, None)
        )
        x2 = jax.nn.relu(L.linear(landmarks, params["lm_fc0"]))
        x2 = L.dropout(x2, 0.5, k0, train)
        x2 = L.linear(x2, params["lm_fc1"])

        x = jnp.concatenate([x1, x2], axis=1)
        x = jax.nn.relu(L.linear(x, params["proj_fc0"]))
        x = L.dropout(x, 0.5, k1, train)
        x = L.linear(x, params["proj_fc1"])
        return _normalize(x)
