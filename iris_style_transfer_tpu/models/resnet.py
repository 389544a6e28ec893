"""ResNet50 feature extractor (2048-d), functional.

Reference: ``models/resnet/resnet.py`` — torchvision resnet50
(IMAGENET1K_V2) with ``fc = Identity`` (``:18-21``), optional freeze,
ImageNet normalization inside the forward (``:30-34,45``), auto-unsqueeze
of 3-dim input (``:48-49``).

Standard torchvision topology: conv7x7/2 + BN + ReLU + maxpool3x3/2, then
bottleneck stages [3, 4, 6, 3] (stride 2 on the first block of stages 2-4,
stride on the 3x3 conv), global average pool -> 2048.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.image import imagenet_normalize
from . import layers as L

STAGES = [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]
EXPANSION = 4


def _init_bottleneck(key, cin, width, stride, dtype):
    ks = jax.random.split(key, 4)
    p = {
        "conv1": L.init_conv_he(ks[0], 1, 1, cin, width, dtype),
        "bn1": L.init_batchnorm(width, dtype),
        "conv2": L.init_conv_he(ks[1], 3, 3, width, width, dtype),
        "bn2": L.init_batchnorm(width, dtype),
        "conv3": L.init_conv_he(ks[2], 1, 1, width, width * EXPANSION, dtype),
        "bn3": L.init_batchnorm(width * EXPANSION, dtype),
    }
    if stride != 1 or cin != width * EXPANSION:
        p["downsample"] = {
            "conv": L.init_conv_he(ks[3], 1, 1, cin, width * EXPANSION, dtype),
            "bn": L.init_batchnorm(width * EXPANSION, dtype),
        }
    return p


def _bottleneck(p, x, stride):
    h = jax.nn.relu(L.batchnorm(L.conv2d(x, p["conv1"], padding=0), p["bn1"]))
    h = jax.nn.relu(L.batchnorm(L.conv2d(h, p["conv2"], stride=stride, padding=1), p["bn2"]))
    h = L.batchnorm(L.conv2d(h, p["conv3"], padding=0), p["bn3"])
    if "downsample" in p:
        x = L.batchnorm(
            L.conv2d(x, p["downsample"]["conv"], stride=stride, padding=0),
            p["downsample"]["bn"],
        )
    return jax.nn.relu(h + x)


class ResNet50:
    @staticmethod
    def init(key: jax.Array, dtype=jnp.float32) -> dict:
        """Seeded fallback in torchvision's own random-init distribution
        (kaiming-normal fan_out, bias-free convs — ``layers.init_conv_he``
        zero bias ≡ torchvision's ``bias=False``); the reference always
        loads IMAGENET1K_V2 (``models/resnet/resnet.py:18``)."""
        keys = jax.random.split(key, 20)
        ki = iter(keys)
        params = {
            "conv1": L.init_conv_he(next(ki), 7, 7, 3, 64, dtype),
            "bn1": L.init_batchnorm(64, dtype),
        }
        cin = 64
        for si, (width, blocks, stride) in enumerate(STAGES, start=1):
            stage = []
            for b in range(blocks):
                s = stride if b == 0 else 1
                stage.append(_init_bottleneck(jax.random.fold_in(keys[-1], si * 100 + b), cin, width, s, dtype))
                cin = width * EXPANSION
            params[f"layer{si}"] = stage
        return params

    @staticmethod
    def apply(params: dict, x: jax.Array, compute_dtype=jnp.float32) -> jax.Array:
        """x: (B, H, W, 3) in [0,1] -> (B, 2048) features."""
        if x.ndim == 3:
            x = x[None]
        h = imagenet_normalize(x.astype(jnp.float32)).astype(compute_dtype)
        h = L.conv2d(h, params["conv1"], stride=2, padding=3)
        h = jax.nn.relu(L.batchnorm(h, params["bn1"]))
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        h = L.max_pool(h, 3, 2)
        for si, (width, blocks, stride) in enumerate(STAGES, start=1):
            for b, bp in enumerate(params[f"layer{si}"]):
                h = _bottleneck(bp, h, stride if b == 0 else 1)
        return jnp.mean(h, axis=(1, 2)).astype(jnp.float32)
