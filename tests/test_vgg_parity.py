"""Full-stack VGG19 port parity: a randomly-initialized torch ``features``
stack (torchvision cfg-E layout, the exact state-dict key schema of
``vgg19().features`` that ``IMAGENET1K_V1`` ships) is converted with
``port.convert_vgg19`` and must produce the same final/content/style taps
through our ``VGG19.apply`` as the torch forward — so the converter and the
model are verified *together*, end to end.  Reference semantics:
``/root/reference/models/vgg/vgg.py:25-92`` (normalize inside the forward,
taps at relu4_2 / relu{1..4}_1).
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from iris_style_transfer_tpu.models import VGG19
from iris_style_transfer_tpu.models import port
from iris_style_transfer_tpu.models.vgg import _CFG, VGG19_LAYERS

import pytest

pytestmark = pytest.mark.slow  # full-tier only: see pyproject.toml

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _random_vgg19_state_dict(seed=0):
    """State dict shaped exactly like ``torchvision vgg19().features`` —
    keys '<idx>.weight'/'<idx>.bias' at the conv indices of cfg E."""
    rng = np.random.default_rng(seed)
    sd, cin, idx = {}, 3, 0
    for c in _CFG:
        if c == "M":
            idx += 1  # pool
            continue
        sd[f"{idx}.weight"] = torch.from_numpy(
            (rng.standard_normal((c, cin, 3, 3)) * 0.05).astype(np.float32)
        )
        sd[f"{idx}.bias"] = torch.from_numpy(
            (rng.standard_normal(c) * 0.05).astype(np.float32)
        )
        cin = c
        idx += 2  # conv + relu
    return sd


def _torch_forward(sd, x_nchw, content_layers, style_layers):
    """The reference FeatureExtractor semantics (vgg.py:56-92) in
    functional torch: normalize -> conv/relu/pool chain, tap at layers."""
    mean = torch.from_numpy(IMAGENET_MEAN).view(1, 3, 1, 1)
    std = torch.from_numpy(IMAGENET_STD).view(1, 3, 1, 1)
    h = (x_nchw - mean) / std
    name_at = {v: k for k, v in VGG19_LAYERS.items()}
    taps, idx = {}, 0
    for c in _CFG:
        if c == "M":
            h = F.max_pool2d(h, 2, 2)
            idx += 1
        else:
            h = F.conv2d(h, sd[f"{idx}.weight"], sd[f"{idx}.bias"], padding=1)
            idx += 1  # conv
            h = F.relu(h)
            if name_at.get(idx, "").startswith("relu") and (
                name_at[idx] in content_layers or name_at[idx] in style_layers
            ):
                taps[name_at[idx]] = h
            idx += 1  # relu
    return h, [taps[n] for n in content_layers], [taps[n] for n in style_layers]


def _to_nhwc(t):
    return np.transpose(t.numpy(), (0, 2, 3, 1))


def test_vgg19_port_full_forward_parity():
    sd_torch = _random_vgg19_state_dict()
    sd_np = {k: v.numpy() for k, v in sd_torch.items()}
    params = jax.tree.map(jnp.asarray, port.convert_vgg19(sd_np))

    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)

    content_layers = ("relu4_2",)
    style_layers = ("relu1_1", "relu2_1", "relu3_1", "relu4_1")
    with torch.no_grad():
        want_final, want_c, want_s = _torch_forward(
            sd_torch, torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            content_layers, style_layers,
        )

    with jax.default_matmul_precision("highest"):
        got_final, got_c, got_s = VGG19.apply(
            params, jnp.asarray(x),
            content_layers=content_layers, style_layers=style_layers,
        )

    np.testing.assert_allclose(
        np.asarray(got_final), _to_nhwc(want_final), rtol=1e-2, atol=1e-3
    )
    for got, want in zip(got_c, want_c):
        np.testing.assert_allclose(np.asarray(got), _to_nhwc(want), rtol=1e-2, atol=1e-3)
    for got, want in zip(got_s, want_s):
        np.testing.assert_allclose(np.asarray(got), _to_nhwc(want), rtol=1e-2, atol=1e-3)


def test_vgg19_port_roundtrips_through_npz(tmp_path):
    """The ported pytree survives save_npz/load_npz and auto-discovery
    loading (the path workloads actually consume)."""
    from iris_style_transfer_tpu.models.pretrained import load_pretrained

    sd = {k: v.numpy() for k, v in _random_vgg19_state_dict(seed=2).items()}
    params = port.convert_vgg19(sd)
    path = str(tmp_path / "vgg19.npz")
    port.save_npz(path, params)

    back = load_pretrained("vgg19", path)
    for name in ("conv1_1", "conv5_4"):
        np.testing.assert_array_equal(back[name]["w"], params[name]["w"])

    x = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (1, 32, 32, 3)), jnp.float32)
    final, _, _ = VGG19.apply(jax.tree.map(jnp.asarray, back), x)
    assert final.shape == (1, 1, 1, 512)
