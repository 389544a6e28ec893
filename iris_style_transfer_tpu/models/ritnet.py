"""RITnet — DenseNet2D U-Net for 4-class eye segmentation, functional.

Reference: ``models/ritnet/ritnet.py`` — 5 dense down blocks (AvgPool 2x2
downsampling, ``:108,119-120``), 4 dense up blocks (nearest x2 upsample +
skip concat, ``:151-152``), 1x1 output conv (``:186``), LeakyReLU
everywhere, BatchNorm at down-block outputs (``:116,134``); channel_size
32, in 1, out 4 classes (0 bg, 1 sclera, 2 iris, 3 pupil).  Pretrained
weights are bundled (``models/weights/ritnet_pretrained.pkl``) and ported
to a JAX pytree by ``tools/port_ritnet.py`` -> ``models/weights/ritnet.npz``.

Preprocessing (``RITnet_transform``, ``ritnet.py:64-98``): gamma 0.8 LUT +
CLAHE(1.5, 8x8) + normalize(0.5, 0.5).  The reference does this per image
on the host via OpenCV (a device->cpu->device round trip per image,
``:88-97``); here it is batched JAX running on device.

Dropout (p=0.2) exists in the reference but the model always runs frozen in
eval mode (``ritnet.py:33-35``), so inference here is deterministic.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..ops.clahe import clahe
from ..ops.image import gamma_lut
from . import layers as L

CHANNELS = 32
NUM_CLASSES = 4


def _init_down_block(key, cin, cout, dtype):
    ks = jax.random.split(key, 5)
    return {
        "conv1": L.init_conv(ks[0], 3, 3, cin, cout, dtype),
        "conv21": L.init_conv(ks[1], 1, 1, cin + cout, cout, dtype),
        "conv22": L.init_conv(ks[2], 3, 3, cout, cout, dtype),
        "conv31": L.init_conv(ks[3], 1, 1, cin + 2 * cout, cout, dtype),
        "conv32": L.init_conv(ks[4], 3, 3, cout, cout, dtype),
        "bn": L.init_batchnorm(cout, dtype),
    }


def _init_up_block(key, skip, cin, cout, dtype):
    ks = jax.random.split(key, 4)
    return {
        "conv11": L.init_conv(ks[0], 1, 1, skip + cin, cout, dtype),
        "conv12": L.init_conv(ks[1], 3, 3, cout, cout, dtype),
        "conv21": L.init_conv(ks[2], 1, 1, skip + cin + cout, cout, dtype),
        "conv22": L.init_conv(ks[3], 3, 3, cout, cout, dtype),
    }


def _down_block(p, x, down: bool):
    """Reference DenseNet2D_down_block.forward (``ritnet.py:118-134``)."""
    if down:
        x = L.avg_pool(x, 2, 2)
    x1 = L.leaky_relu(L.conv2d(x, p["conv1"], padding=1))
    x21 = jnp.concatenate([x, x1], axis=-1)
    x22 = L.leaky_relu(L.conv2d(L.conv2d(x21, p["conv21"], padding=0), p["conv22"], padding=1))
    x31 = jnp.concatenate([x21, x22], axis=-1)
    out = L.leaky_relu(L.conv2d(L.conv2d(x31, p["conv31"], padding=0), p["conv32"], padding=1))
    return L.batchnorm(out, p["bn"])


def _up_block(p, skip_feat, x):
    """Reference DenseNet2D_up_block_concat.forward (``ritnet.py:150-161``)."""
    x = L.upsample_nearest(x, 2)
    x = jnp.concatenate([x, skip_feat], axis=-1)
    x1 = L.leaky_relu(L.conv2d(L.conv2d(x, p["conv11"], padding=0), p["conv12"], padding=1))
    x21 = jnp.concatenate([x, x1], axis=-1)
    out = L.leaky_relu(L.conv2d(L.conv2d(x21, p["conv21"], padding=0), p["conv22"], padding=1))
    return out


class RITnet:
    """Functional RITnet: ``logits/labels = RITnet.apply(params, x)``."""

    @staticmethod
    def init(key: jax.Array, dtype=jnp.float32) -> dict:
        ks = jax.random.split(key, 10)
        c = CHANNELS
        params = {
            "down1": _init_down_block(ks[0], 1, c, dtype),
            "down2": _init_down_block(ks[1], c, c, dtype),
            "down3": _init_down_block(ks[2], c, c, dtype),
            "down4": _init_down_block(ks[3], c, c, dtype),
            "down5": _init_down_block(ks[4], c, c, dtype),
            "up1": _init_up_block(ks[5], c, c, c, dtype),
            "up2": _init_up_block(ks[6], c, c, c, dtype),
            "up3": _init_up_block(ks[7], c, c, c, dtype),
            "up4": _init_up_block(ks[8], c, c, c, dtype),
            "out_conv": L.init_conv(ks[9], 1, 1, c, NUM_CLASSES, dtype),
        }
        return params

    @staticmethod
    def pretrained(dtype=jnp.float32) -> dict:
        """Load the ported bundled weights (reference ``ritnet.py:17,30``;
        ported by ``tools/port_ritnet.py``)."""
        from .port import load_npz

        path = os.path.join(os.path.dirname(__file__), "weights", "ritnet.npz")
        return jax.tree.map(lambda a: jnp.asarray(a, dtype), load_npz(path))

    @staticmethod
    def transform(x: jax.Array) -> jax.Array:
        """Batched RITnet preprocessing of (B, H, W, 1) images in [0,1]:
        gamma 0.8 LUT -> CLAHE(1.5, 8x8) -> normalize(0.5, 0.5)."""
        y = gamma_lut(x, 0.8)
        y = jax.vmap(clahe)(y[..., 0])[..., None]
        return (y - 0.5) / 0.5

    @staticmethod
    def forward(params: dict, x: jax.Array) -> jax.Array:
        """DenseNet2D on preprocessed input -> (B, H, W, 4) logits."""
        x1 = _down_block(params["down1"], x, down=False)
        x2 = _down_block(params["down2"], x1, down=True)
        x3 = _down_block(params["down3"], x2, down=True)
        x4 = _down_block(params["down4"], x3, down=True)
        x5 = _down_block(params["down5"], x4, down=True)
        x6 = _up_block(params["up1"], x4, x5)
        x7 = _up_block(params["up2"], x3, x6)
        x8 = _up_block(params["up3"], x2, x7)
        x9 = _up_block(params["up4"], x1, x8)
        return L.conv2d(x9, params["out_conv"], padding=0)

    @staticmethod
    def apply(params: dict, x: jax.Array, preprocess: bool = True) -> jax.Array:
        """Full shell (reference ``RITnet.forward``, ``ritnet.py:40-57``):
        transform -> DenseNet2D -> argmax.  x: (B, H, W, 1) in [0,1];
        returns (B, H, W) int32 class labels."""
        if preprocess:
            x = RITnet.transform(x)
        logits = RITnet.forward(params, x)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
