"""RITnet numerical-parity fixture against the bundled reference weights.

Rebuilds the reference's ``DenseNet2D`` forward pass as *functional torch*
driven directly by the bundled pretrained state dict
(``/root/reference/models/weights/ritnet_pretrained.pkl``), and asserts
logits parity (tolerance) with our ported ``RITnet.forward`` on
real-shaped inputs — so a silent port bug (conv layout, concat order,
batchnorm stats, pooling) fails pytest.  Semantics from
``/root/reference/models/ritnet/ritnet.py:100-223``; preprocessing path
from ``:64-98``.
"""

import os

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from iris_style_transfer_tpu.data.synthetic import synthetic_eye_batch
from iris_style_transfer_tpu.models import RITnet

PKL = "/root/reference/models/weights/ritnet_pretrained.pkl"

pytestmark = pytest.mark.skipif(
    not os.path.exists(PKL), reason="bundled reference weights not present"
)


def _conv(sd, name, x, pad):
    return F.conv2d(x, sd[f"{name}.weight"], sd[f"{name}.bias"], padding=pad)


def _down_block(sd, pre, x, pool):
    # ritnet.py:118-134 (eval mode: dropout = identity)
    if pool:
        x = F.avg_pool2d(x, 2)
    x1 = F.leaky_relu(_conv(sd, f"{pre}.conv1", x, 1))
    x21 = torch.cat((x, x1), dim=1)
    x22 = F.leaky_relu(_conv(sd, f"{pre}.conv22", _conv(sd, f"{pre}.conv21", x21, 0), 1))
    x31 = torch.cat((x21, x22), dim=1)
    out = F.leaky_relu(_conv(sd, f"{pre}.conv32", _conv(sd, f"{pre}.conv31", x31, 0), 1))
    return F.batch_norm(
        out,
        sd[f"{pre}.bn.running_mean"],
        sd[f"{pre}.bn.running_var"],
        sd[f"{pre}.bn.weight"],
        sd[f"{pre}.bn.bias"],
        training=False,
    )


def _up_block(sd, pre, skip, x):
    # ritnet.py:150-161
    x = F.interpolate(x, scale_factor=2, mode="nearest")
    x = torch.cat((x, skip), dim=1)
    x1 = F.leaky_relu(_conv(sd, f"{pre}.conv12", _conv(sd, f"{pre}.conv11", x, 0), 1))
    x21 = torch.cat((x, x1), dim=1)
    return F.leaky_relu(_conv(sd, f"{pre}.conv22", _conv(sd, f"{pre}.conv21", x21, 0), 1))


def _densenet2d(sd, x):
    # ritnet.py:208-223
    x1 = _down_block(sd, "down_block1", x, pool=False)
    x2 = _down_block(sd, "down_block2", x1, pool=True)
    x3 = _down_block(sd, "down_block3", x2, pool=True)
    x4 = _down_block(sd, "down_block4", x3, pool=True)
    x5 = _down_block(sd, "down_block5", x4, pool=True)
    x6 = _up_block(sd, "up_block1", x4, x5)
    x7 = _up_block(sd, "up_block2", x3, x6)
    x8 = _up_block(sd, "up_block3", x2, x7)
    x9 = _up_block(sd, "up_block4", x1, x8)
    return _conv(sd, "out_conv1", x9, 0)


@pytest.fixture(scope="module")
def state_dict():
    sd = torch.load(PKL, weights_only=True, map_location="cpu")
    return {k: v.float() for k, v in sd.items()}


@pytest.fixture(scope="module")
def eye():
    imgs, _, _ = synthetic_eye_batch(1, height=400, width=640, seed=3)
    return imgs  # (1, 400, 640, 1) float32 [0,1]


def test_ritnet_logits_parity_pretrained(state_dict, eye):
    """Network-only parity (preprocess applied identically on both sides)."""
    pre = np.asarray(RITnet.transform(jnp.asarray(eye)))  # (1, H, W, 1)

    with torch.no_grad():
        want = _densenet2d(
            state_dict, torch.from_numpy(np.transpose(pre, (0, 3, 1, 2)).copy())
        )
    want = np.transpose(want.numpy(), (0, 2, 3, 1))

    params = RITnet.pretrained()
    got = np.asarray(RITnet.forward(params, jnp.asarray(pre)))

    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
    # and the resulting segmentations agree exactly
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_ritnet_full_shell_parity_with_cv2_transform(state_dict, eye):
    """Full shell incl. the preprocessing path: reference per-image cv2
    gamma-LUT + CLAHE + normalize (ritnet.py:64-98) vs our batched on-device
    transform, compared at the predicted-label level (IoU of masks is the
    bar, SURVEY §7 hard part 3)."""
    cv2 = pytest.importorskip("cv2")

    img = eye[0, ..., 0]  # (H, W) float [0,1]
    table = 255.0 * (np.linspace(0, 1, 256) ** 0.8)
    u8 = (img * 255).astype(np.uint8)
    lut = cv2.LUT(u8, table)
    cl = cv2.createCLAHE(clipLimit=1.5, tileGridSize=(8, 8)).apply(
        np.uint8(lut)
    )
    pre_ref = (cl.astype(np.float32) / 255.0 - 0.5) / 0.5

    with torch.no_grad():
        want = _densenet2d(
            state_dict, torch.from_numpy(pre_ref[None, None])
        )
    want_labels = want.numpy()[0].argmax(0)

    params = RITnet.pretrained()
    got_labels = np.asarray(RITnet.apply(params, jnp.asarray(eye)))[0]

    # tolerance-based: CLAHE may differ by <=1 LSB at tile boundaries, so
    # require near-total pixel agreement rather than bit-exactness
    agree = (got_labels == want_labels).mean()
    assert agree > 0.999, f"label agreement {agree:.5f}"
