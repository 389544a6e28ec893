"""Full-stack ResNet50 port parity: a randomly-initialized state dict with
torchvision's exact key schema (``conv1.weight``, ``layer{1-4}.{b}.*``,
``downsample.0/1``) is converted with ``port.convert_resnet50`` and must
produce the same 2048-d features through our ``ResNet50.apply`` as the
equivalent functional-torch forward.  Reference semantics:
``/root/reference/models/resnet/resnet.py:18-49`` (fc = Identity, ImageNet
normalize inside the forward).
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from iris_style_transfer_tpu.models import ResNet50
from iris_style_transfer_tpu.models import port
from iris_style_transfer_tpu.models.resnet import EXPANSION, STAGES

import pytest

pytestmark = pytest.mark.slow  # full-tier only: see pyproject.toml

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _bn_entries(rng, c):
    return {
        "weight": rng.uniform(0.5, 1.5, c).astype(np.float32),
        "bias": (rng.standard_normal(c) * 0.1).astype(np.float32),
        "running_mean": (rng.standard_normal(c) * 0.1).astype(np.float32),
        "running_var": rng.uniform(0.5, 1.5, c).astype(np.float32),
    }


def _random_resnet50_state_dict(seed=0):
    rng = np.random.default_rng(seed)
    sd = {"conv1.weight": (rng.standard_normal((64, 3, 7, 7)) * 0.05).astype(np.float32)}
    for k, v in _bn_entries(rng, 64).items():
        sd[f"bn1.{k}"] = v
    cin = 64
    for si, (width, blocks, stride) in enumerate(STAGES, start=1):
        for b in range(blocks):
            pre = f"layer{si}.{b}"
            cout = width * EXPANSION
            for name, shape in (
                ("conv1", (width, cin, 1, 1)),
                ("conv2", (width, width, 3, 3)),
                ("conv3", (cout, width, 1, 1)),
            ):
                sd[f"{pre}.{name}.weight"] = (
                    rng.standard_normal(shape) * 0.05
                ).astype(np.float32)
            for i, c in (("1", width), ("2", width), ("3", cout)):
                for k, v in _bn_entries(rng, c).items():
                    sd[f"{pre}.bn{i}.{k}"] = v
            if b == 0 and (stride != 1 or cin != cout):
                sd[f"{pre}.downsample.0.weight"] = (
                    rng.standard_normal((cout, cin, 1, 1)) * 0.05
                ).astype(np.float32)
                for k, v in _bn_entries(rng, cout).items():
                    sd[f"{pre}.downsample.1.{k}"] = v
            cin = cout
    return sd


def _t(sd, key):
    return torch.from_numpy(sd[key])


def _bn(sd, pre, x):
    return F.batch_norm(
        x, _t(sd, f"{pre}.running_mean"), _t(sd, f"{pre}.running_var"),
        _t(sd, f"{pre}.weight"), _t(sd, f"{pre}.bias"), training=False,
    )


def _bottleneck(sd, pre, x, stride):
    h = F.relu(_bn(sd, f"{pre}.bn1", F.conv2d(x, _t(sd, f"{pre}.conv1.weight"))))
    h = F.relu(_bn(sd, f"{pre}.bn2",
                   F.conv2d(h, _t(sd, f"{pre}.conv2.weight"), stride=stride, padding=1)))
    h = _bn(sd, f"{pre}.bn3", F.conv2d(h, _t(sd, f"{pre}.conv3.weight")))
    if f"{pre}.downsample.0.weight" in sd:
        x = _bn(sd, f"{pre}.downsample.1",
                F.conv2d(x, _t(sd, f"{pre}.downsample.0.weight"), stride=stride))
    return F.relu(h + x)


def _torch_resnet50(sd, x_nchw):
    mean = torch.from_numpy(IMAGENET_MEAN).view(1, 3, 1, 1)
    std = torch.from_numpy(IMAGENET_STD).view(1, 3, 1, 1)
    h = (x_nchw - mean) / std
    h = F.conv2d(h, _t(sd, "conv1.weight"), stride=2, padding=3)
    h = F.relu(_bn(sd, "bn1", h))
    h = F.max_pool2d(h, 3, 2, padding=1)
    for si, (width, blocks, stride) in enumerate(STAGES, start=1):
        for b in range(blocks):
            h = _bottleneck(sd, f"layer{si}.{b}", h, stride if b == 0 else 1)
    return h.mean(dim=(2, 3))  # avgpool; fc = Identity (resnet.py:18-21)


def test_resnet50_port_full_forward_parity():
    sd = _random_resnet50_state_dict()
    params = jax.tree.map(jnp.asarray, port.convert_resnet50(sd))

    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        want = _torch_resnet50(sd, torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()))
    with jax.default_matmul_precision("highest"):
        got = ResNet50.apply(params, jnp.asarray(x))

    assert got.shape == (2, 2048)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-2, atol=1e-3)


def test_resnet50_port_npz_roundtrip_with_list_stages(tmp_path):
    """ResNet params keep their stages as lists — the npz flatten/unflatten
    must restore them as lists (digit key segments)."""
    sd = _random_resnet50_state_dict(seed=2)
    params = port.convert_resnet50(sd)
    path = str(tmp_path / "resnet50.npz")
    port.save_npz(path, params)
    back = port.load_npz(path)
    assert isinstance(back["layer1"], list) and len(back["layer1"]) == 3
    assert isinstance(back["layer3"], list) and len(back["layer3"]) == 6
    np.testing.assert_array_equal(
        back["layer2"][1]["conv2"]["w"], params["layer2"][1]["conv2"]["w"]
    )
