"""EfficientNet-B7 U-Net for 4-class eye segmentation, functional.

Reference: ``models/efficientnet/efficientnet.py`` — ``smp.Unet(
encoder_name='efficientnet-b7', classes=4)`` (``:20``), frozen/eval
(``:27-29``); preprocessing pads height (0,8,0,8) 400->416 and ImageNet-
normalizes (``:32-36``); forward runs horizontal-flip test-time
augmentation averaging (``:54-58``), softmax+argmax (``:61-62``), and crops
the pad back (``:65``).

Topology reproduced from smp / efficientnet-pytorch:
  * encoder: EfficientNet-B7 (width 2.0, depth 3.1): stem conv3x3/2 -> 64,
    MBConv stages with channels (32, 48, 80, 160, 224, 384, 640) and
    repeats (4, 7, 7, 10, 10, 13, 4), SiLU activations, squeeze-excitation
    (ratio 0.25 of block input), TF-"same" padding, BN eps 1e-3.
  * skips at reductions /2 /4 /8 /16 /32: channels (64, 48, 80, 224, 640).
  * decoder: UnetDecoder channels (256, 128, 64, 32, 16): per block
    nearest x2 upsample, skip concat, 2x (conv3x3 + BN + ReLU).
  * head: conv3x3 -> 4 classes.

The pretrained checkpoint is an external download (reference
``readme.md:35``); ``port.convert_efficientnet_unet`` ports it when
available, otherwise the seeded init below is used.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.image import imagenet_normalize, pad_height
from . import layers as L

# probe17 candidate: stride-1 MBConv depthwise+BN+SiLU as one Pallas pass
# (ops/pallas_depthwise.py).  Default OFF until measured on-chip.
PALLAS_DW = False

# B0 base: (expand, kernel, stride, cin, cout, repeats)
_BASE_BLOCKS = [
    (1, 3, 1, 32, 16, 1),
    (6, 3, 2, 16, 24, 2),
    (6, 5, 2, 24, 40, 2),
    (6, 3, 2, 40, 80, 3),
    (6, 5, 1, 80, 112, 3),
    (6, 5, 2, 112, 192, 4),
    (6, 3, 1, 192, 320, 1),
]
_WIDTH, _DEPTH = 2.0, 3.1  # B7
_BN_EPS = 1e-3

DECODER_CHANNELS = (256, 128, 64, 32, 16)
NUM_CLASSES = 4


def _round_filters(c: int) -> int:
    c *= _WIDTH
    new_c = max(8, int(c + 4) // 8 * 8)
    if new_c < 0.9 * c:
        new_c += 8
    return int(new_c)


def _round_repeats(r: int) -> int:
    return int(math.ceil(_DEPTH * r))


def block_args() -> list[tuple[int, int, int, int, int]]:
    """Expanded per-block args for B7: (expand, kernel, stride, cin, cout)."""
    out = []
    for expand, k, s, cin, cout, reps in _BASE_BLOCKS:
        cin, cout = _round_filters(cin), _round_filters(cout)
        for i in range(_round_repeats(reps)):
            out.append((expand, k, s if i == 0 else 1, cin if i == 0 else cout, cout))
    return out


BLOCK_ARGS = block_args()
STEM_CHANNELS = _round_filters(32)  # 64

# encoder skip taps, matching smp's stage splits for efficientnet-b7
# (stage_idxs (11, 18, 38)): the /2 feature is the stem output, then
# features at the ends of base stages 2 (/4, 48ch), 3 (/8, 80ch),
# 5 (/16, 224ch) and 7 (/32, 640ch) — i.e. just before every stride-2
# block except the first, plus the final block.
def _skip_indices() -> list[int]:
    down = [i for i, (_, _, s, _, _) in enumerate(BLOCK_ARGS) if s == 2]
    idxs = [i - 1 for i in down[1:]]  # skip the first downsample (stem is /2 tap)
    idxs.append(len(BLOCK_ARGS) - 1)  # final /32 feature
    return idxs


SKIP_AFTER = _skip_indices()


def _same_pad(in_h: int, in_w: int, k: int, s: int) -> list[tuple[int, int]]:
    def axis(n):
        pad = max((math.ceil(n / s) - 1) * s + k - n, 0)
        return (pad // 2, pad - pad // 2)

    return [axis(in_h), axis(in_w)]


def _init_mbconv(key, expand, k, cin, cout, dtype):
    ks = jax.random.split(key, 6)
    mid = cin * expand
    se = max(1, int(cin * 0.25))
    p = {}
    if expand != 1:
        p["expand_conv"] = {"w": L.init_conv(ks[0], 1, 1, cin, mid, dtype)["w"], "b": jnp.zeros((mid,), dtype)}
        p["bn0"] = L.init_batchnorm(mid, dtype)
    p["dw_conv"] = {"w": L.init_conv(ks[1], k, k, 1, mid, dtype)["w"], "b": jnp.zeros((mid,), dtype)}
    p["bn1"] = L.init_batchnorm(mid, dtype)
    p["se_reduce"] = L.init_conv(ks[2], 1, 1, mid, se, dtype)
    p["se_expand"] = L.init_conv(ks[3], 1, 1, se, mid, dtype)
    p["project_conv"] = {"w": L.init_conv(ks[4], 1, 1, mid, cout, dtype)["w"], "b": jnp.zeros((cout,), dtype)}
    p["bn2"] = L.init_batchnorm(cout, dtype)
    return p


def _mbconv(p, x, expand, k, stride, cin, cout):
    inp = x
    mid = cin * expand
    if expand != 1:
        x = L.conv2d(x, p["expand_conv"], padding=0)
        x = jax.nn.silu(L.batchnorm(x, p["bn0"], eps=_BN_EPS))
    # depthwise, TF-same padding
    from ..ops import pallas_depthwise

    if PALLAS_DW and pallas_depthwise.supported(
        x.shape, k, stride, jnp.dtype(x.dtype).itemsize
    ):
        # one-pass fused dwconv+BN+SiLU over lane-major channels (the
        # MBConv hot path is bandwidth-bound — see ops/pallas_depthwise.py)
        bn = p["bn1"]
        inv = jax.lax.rsqrt(bn["var"].astype(jnp.float32) + _BN_EPS)
        a = bn["scale"].astype(jnp.float32) * inv
        b = bn["bias"].astype(jnp.float32) - bn["mean"].astype(jnp.float32) * a
        x = pallas_depthwise.dw_conv_bn_silu(x, p["dw_conv"]["w"], a, b, k)
    else:
        pad = _same_pad(x.shape[1], x.shape[2], k, stride)
        x = jax.lax.conv_general_dilated(
            x,
            p["dw_conv"]["w"].astype(x.dtype),
            window_strides=(stride, stride),
            padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=mid,
        )
        x = jax.nn.silu(L.batchnorm(x, p["bn1"], eps=_BN_EPS))
    # squeeze-excite
    sq = jnp.mean(x, axis=(1, 2), keepdims=True)
    sq = jax.nn.silu(L.conv2d(sq, p["se_reduce"], padding=0))
    sq = jax.nn.sigmoid(L.conv2d(sq, p["se_expand"], padding=0))
    x = x * sq
    # project
    x = L.conv2d(x, p["project_conv"], padding=0)
    x = L.batchnorm(x, p["bn2"], eps=_BN_EPS)
    if stride == 1 and cin == cout:
        x = x + inp  # drop-connect is identity in eval (model runs frozen)
    return x


def _init_decoder_block(key, cin, skip, cout, dtype):
    k0, k1 = jax.random.split(key)
    return {
        "conv1": {"w": L.init_conv(k0, 3, 3, cin + skip, cout, dtype)["w"], "b": jnp.zeros((cout,), dtype)},
        "bn1": L.init_batchnorm(cout, dtype),
        "conv2": {"w": L.init_conv(k1, 3, 3, cout, cout, dtype)["w"], "b": jnp.zeros((cout,), dtype)},
        "bn2": L.init_batchnorm(cout, dtype),
    }


def _decoder_block(p, x, skip):
    x = L.upsample_nearest(x, 2)
    if skip is not None:
        x = jnp.concatenate([x, skip], axis=-1)
    x = jax.nn.relu(L.batchnorm(L.conv2d(x, p["conv1"], padding=1), p["bn1"]))
    x = jax.nn.relu(L.batchnorm(L.conv2d(x, p["conv2"], padding=1), p["bn2"]))
    return x


class EfficientNet:
    """smp-style Unet(efficientnet-b7) shell, inference-only."""

    @staticmethod
    def init(key: jax.Array, dtype=jnp.float32) -> dict:
        keys = jax.random.split(key, len(BLOCK_ARGS) + 8)
        params = {
            "stem_conv": {
                "w": L.init_conv(keys[0], 3, 3, 3, STEM_CHANNELS, dtype)["w"],
                "b": jnp.zeros((STEM_CHANNELS,), dtype),
            },
            "stem_bn": L.init_batchnorm(STEM_CHANNELS, dtype),
            "blocks": [
                _init_mbconv(keys[1 + i], e, k, cin, cout, dtype)
                for i, (e, k, _, cin, cout) in enumerate(BLOCK_ARGS)
            ],
        }
        # encoder skip channels: stem + taps before each downsample + final
        skip_ch = [STEM_CHANNELS] + [BLOCK_ARGS[i][4] for i in SKIP_AFTER]
        # decoder input: deepest feature; skips shallower, reversed
        enc = skip_ch[::-1]  # [640, 224, 80, 48, 64]
        dec = []
        cin = enc[0]
        skips = enc[1:] + [0]
        for i, cout in enumerate(DECODER_CHANNELS):
            dec.append(
                _init_decoder_block(keys[len(BLOCK_ARGS) + 1 + i], cin, skips[i], cout, dtype)
            )
            cin = cout
        params["decoder"] = dec
        params["head"] = L.init_conv(keys[-1], 3, 3, DECODER_CHANNELS[-1], NUM_CLASSES, dtype)
        return params

    @staticmethod
    def encoder(params: dict, x: jax.Array) -> list[jax.Array]:
        """Returns features at reductions [/2, /4, /8, /16, /32]."""
        pad = _same_pad(x.shape[1], x.shape[2], 3, 2)
        h = jax.lax.conv_general_dilated(
            x,
            params["stem_conv"]["w"].astype(x.dtype),
            window_strides=(2, 2),
            padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        h = jax.nn.silu(L.batchnorm(h, params["stem_bn"], eps=_BN_EPS))
        feats = [h]  # /2
        tap_set = set(SKIP_AFTER)
        for i, (bp, (e, k, s, cin, cout)) in enumerate(zip(params["blocks"], BLOCK_ARGS)):
            h = _mbconv(bp, h, e, k, s, cin, cout)
            if i in tap_set:
                feats.append(h)
        return feats  # [/2, /4, /8, /16, /32]

    @staticmethod
    def logits(params: dict, x: jax.Array) -> jax.Array:
        feats = EfficientNet.encoder(params, x)
        h = feats[-1]
        skips = feats[:-1][::-1] + [None]
        for dp, skip in zip(params["decoder"], skips):
            h = _decoder_block(dp, h, skip)
        return L.conv2d(h, params["head"], padding=1)

    @staticmethod
    def apply(
        params: dict,
        x: jax.Array,
        tta: bool = True,
        compute_dtype=jnp.float32,
    ) -> jax.Array:
        """Full shell (reference ``efficientnet.py:38-67``): grayscale or
        RGB (B, 400, 640, C) in [0,1] -> (B, 400, 640) int32 labels.
        Pads height to 416, ImageNet-normalizes, optional horizontal-flip
        TTA averaging, argmax, crops the pad back."""
        if x.ndim == 3:
            x = x[None]
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        h = pad_height(x, 8, 8)
        h = imagenet_normalize(h.astype(jnp.float32)).astype(compute_dtype)
        o1 = EfficientNet.logits(params, h)
        if tta:
            o2 = jnp.flip(EfficientNet.logits(params, jnp.flip(h, axis=2)), axis=2)
            o = (o1 + o2) / 2.0
        else:
            o = o1
        labels = jnp.argmax(o, axis=-1).astype(jnp.int32)
        return labels[:, 8:-8, :]
