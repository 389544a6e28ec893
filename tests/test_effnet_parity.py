"""Full-forward EfficientNet-B7 U-Net port parity.

Rebuilds the smp ``Unet(efficientnet-b7)`` forward as *functional torch*
driven directly by a synthetic state dict in smp's exact key schema
(``encoder._blocks.N._expand_conv`` / ``decoder.blocks.N.conv1.0`` /
``segmentation_head.0``), and asserts logits parity with our
``EfficientNet.logits`` after ``port.convert_efficientnet_unet`` — so the
converter, the MBConv wiring (SE placement, BN order, skip-add
conditions, TF-same padding) and the U-Net decoder are verified together.
Semantics follow efficientnet-pytorch/smp as documented in
``models/efficientnet.py`` (reference shell:
``/root/reference/models/efficientnet/efficientnet.py:7-67``).
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from iris_style_transfer_tpu.models import port
from iris_style_transfer_tpu.models.efficientnet import (
    BLOCK_ARGS,
    DECODER_CHANNELS,
    EfficientNet,
    SKIP_AFTER,
    _BN_EPS,
    _same_pad,
)
from tests.test_effnet_port import build_fake_smp_state_dict

import pytest

pytestmark = pytest.mark.slow  # full-tier only: see pyproject.toml


def _t(sd, key):
    return torch.from_numpy(sd[key])


def _bn(sd, pre, x, eps):
    return F.batch_norm(
        x, _t(sd, f"{pre}.running_mean"), _t(sd, f"{pre}.running_var"),
        _t(sd, f"{pre}.weight"), _t(sd, f"{pre}.bias"), training=False, eps=eps,
    )


def _same_conv(x, w, stride, groups=1):
    (pt, pb), (pl, pr) = _same_pad(x.shape[2], x.shape[3], w.shape[2], stride)
    x = F.pad(x, (pl, pr, pt, pb))
    return F.conv2d(x, w, stride=stride, groups=groups)


def _torch_mbconv(sd, pre, x, expand, k, stride, cin, cout):
    inp = x
    mid = cin * expand
    if expand != 1:
        x = F.conv2d(x, _t(sd, f"{pre}._expand_conv.weight"))
        x = F.silu(_bn(sd, f"{pre}._bn0", x, _BN_EPS))
    x = _same_conv(x, _t(sd, f"{pre}._depthwise_conv.weight"), stride, groups=mid)
    x = F.silu(_bn(sd, f"{pre}._bn1", x, _BN_EPS))
    sq = x.mean(dim=(2, 3), keepdim=True)
    sq = F.silu(F.conv2d(sq, _t(sd, f"{pre}._se_reduce.weight"),
                         _t(sd, f"{pre}._se_reduce.bias")))
    sq = torch.sigmoid(F.conv2d(sq, _t(sd, f"{pre}._se_expand.weight"),
                                _t(sd, f"{pre}._se_expand.bias")))
    x = x * sq
    x = F.conv2d(x, _t(sd, f"{pre}._project_conv.weight"))
    x = _bn(sd, f"{pre}._bn2", x, _BN_EPS)
    if stride == 1 and cin == cout:
        x = x + inp  # drop-connect is identity in eval
    return x


def _torch_unet_logits(sd, x):
    h = _same_conv(x, _t(sd, "encoder._conv_stem.weight"), 2)
    h = F.silu(_bn(sd, "encoder._bn0", h, _BN_EPS))
    feats = [h]
    for i, (e, k, s, cin, cout) in enumerate(BLOCK_ARGS):
        h = _torch_mbconv(sd, f"encoder._blocks.{i}", h, e, k, s, cin, cout)
        if i in set(SKIP_AFTER):
            feats.append(h)
    h = feats[-1]
    skips = feats[:-1][::-1] + [None]
    for i, skip in zip(range(len(DECODER_CHANNELS)), skips):
        h = F.interpolate(h, scale_factor=2, mode="nearest")
        if skip is not None:
            h = torch.cat([h, skip], dim=1)
        pre = f"decoder.blocks.{i}"
        h = F.relu(_bn(sd, f"{pre}.conv1.1",
                       F.conv2d(h, _t(sd, f"{pre}.conv1.0.weight"), padding=1), 1e-5))
        h = F.relu(_bn(sd, f"{pre}.conv2.1",
                       F.conv2d(h, _t(sd, f"{pre}.conv2.0.weight"), padding=1), 1e-5))
    return F.conv2d(h, _t(sd, "segmentation_head.0.weight"),
                    _t(sd, "segmentation_head.0.bias"), padding=1)


def test_effnet_unet_port_full_forward_parity():
    rng = np.random.default_rng(7)
    sd = build_fake_smp_state_dict(rng)
    params = jax.tree.map(jnp.asarray, port.convert_efficientnet_unet(sd))

    # 64x64: divisible by 32 so the decoder upsamples meet the skips
    x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        want = _torch_unet_logits(sd, torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()))
    want = np.transpose(want.numpy(), (0, 2, 3, 1))

    with jax.default_matmul_precision("highest"):
        got = np.asarray(EfficientNet.logits(params, jnp.asarray(x)))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-3)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))
