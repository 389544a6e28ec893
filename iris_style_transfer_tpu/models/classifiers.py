"""Iris classifier heads.

Reference: ``models/classifiers/classifiers.py``
  * Classifier1 (``:3-36``): AdaptiveAvgPool(7,7) -> Flatten -> MLP
    25088 -> 4096 -> 4096 -> num_class over the final VGG CNN features.
  * Classifier2 (``:38-72``): style features as per-layer channel-wise
    (mean ‖ std) concat -> (64+128+256+512)*2 = 1920-d -> MLP 4096 -> 4096
    -> num_class.  std is Bessel-corrected (torch.std).

Both use ReLU + Dropout(0.5) between linears.  Default num_class=152
(OpenEDS2019 user count).

TPU notes: the 25088x4096 / 4096x4096 matmuls are the natural tensor-
parallel shards — ``parallel.shard_params`` splits fc0/fc1 column-wise over
the ``model`` mesh axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.losses import style_stats
from . import layers as L

STYLE_FEATURE_DIM = (64 + 128 + 256 + 512) * 2  # classifiers.py:43


class Classifier1:
    @staticmethod
    def init(key: jax.Array, num_class: int = 152, dtype=jnp.float32) -> dict:
        k0, k1, k2 = jax.random.split(key, 3)
        return {
            "fc0": L.init_linear(k0, 512 * 7 * 7, 4096, dtype),
            "fc1": L.init_linear(k1, 4096, 4096, dtype),
            "fc2": L.init_linear(k2, 4096, num_class, dtype),
        }

    @staticmethod
    def apply(
        params: dict,
        feats: jax.Array,
        train: bool = False,
        dropout_key: jax.Array | None = None,
    ) -> jax.Array:
        """feats: (B, H, W, 512) final VGG features -> (B, num_class) logits."""
        x = L.adaptive_avg_pool(feats, (7, 7))
        # flatten matching torch's NCHW Flatten: (B, C, 7, 7) -> B, C*49
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        k0, k1 = (
            jax.random.split(dropout_key) if dropout_key is not None else (None, None)
        )
        x = jax.nn.relu(L.linear(x, params["fc0"]))
        x = L.dropout(x, 0.5, k0, train)
        x = jax.nn.relu(L.linear(x, params["fc1"]))
        x = L.dropout(x, 0.5, k1, train)
        return L.linear(x, params["fc2"])


class Classifier2:
    @staticmethod
    def init(
        key: jax.Array,
        in_features: int = STYLE_FEATURE_DIM,
        num_class: int = 152,
        dtype=jnp.float32,
    ) -> dict:
        k0, k1, k2 = jax.random.split(key, 3)
        return {
            "fc0": L.init_linear(k0, in_features, 4096, dtype),
            "fc1": L.init_linear(k1, 4096, 4096, dtype),
            "fc2": L.init_linear(k2, 4096, num_class, dtype),
        }

    @staticmethod
    def features(style_feats: list[jax.Array]) -> jax.Array:
        """Per-layer (mean ‖ std) concat, reference ``classifiers.py:71``:
        ``cat([cat([mean, std], 1) for each layer], 1)`` -> (B, 1920)."""
        parts = []
        for f in style_feats:
            mean, std = style_stats(f)
            parts.append(jnp.concatenate([mean, std], axis=1))
        return jnp.concatenate(parts, axis=1)

    @staticmethod
    def apply(
        params: dict,
        style_feats: list[jax.Array],
        train: bool = False,
        dropout_key: jax.Array | None = None,
    ) -> jax.Array:
        x = Classifier2.features(style_feats)
        k0, k1 = (
            jax.random.split(dropout_key) if dropout_key is not None else (None, None)
        )
        x = jax.nn.relu(L.linear(x, params["fc0"]))
        x = L.dropout(x, 0.5, k0, train)
        x = jax.nn.relu(L.linear(x, params["fc1"]))
        x = L.dropout(x, 0.5, k1, train)
        return L.linear(x, params["fc2"])
