"""Weight converter mapping tests: synthetic torch-style state dicts ->
pytrees, checked by applying both sides with plain torch functional ops."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from iris_style_transfer_tpu.models import port
from iris_style_transfer_tpu.models import layers as L
from iris_style_transfer_tpu.models.vgg import CONV_NAMES, VGG19, VGG19_LAYERS

pytestmark = pytest.mark.slow  # full-tier only: see pyproject.toml


def test_convert_vgg19_maps_indices():
    rng = np.random.default_rng(0)
    sd = {}
    cin = 3
    from iris_style_transfer_tpu.models.vgg import _CFG_CHANNELS

    for name in CONV_NAMES:
        cout = _CFG_CHANNELS[name]
        idx = VGG19_LAYERS[name]
        sd[f"features.{idx}.weight"] = rng.standard_normal((cout, cin, 3, 3)).astype(np.float32)
        sd[f"features.{idx}.bias"] = rng.standard_normal(cout).astype(np.float32)
        cin = cout
    params = port.convert_vgg19(sd)
    # first conv: OIHW -> HWIO round trip
    w = sd["features.0.weight"]
    np.testing.assert_array_equal(params["conv1_1"]["w"], np.transpose(w, (2, 3, 1, 0)))
    assert params["conv5_4"]["w"].shape == (3, 3, 512, 512)

    # converted conv must compute the same as torch's conv2d
    x = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    with jax.default_matmul_precision("highest"):
        got = np.asarray(
            L.conv2d(jnp.asarray(x), jax.tree.map(jnp.asarray, params["conv1_1"]), padding=1)
        )
    want = torch.nn.functional.conv2d(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
        torch.from_numpy(w),
        torch.from_numpy(sd["features.0.bias"]),
        padding=1,
    ).numpy()
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 1)), rtol=1e-4, atol=1e-4)


def test_convert_classifier_heads():
    rng = np.random.default_rng(1)
    sd1 = {}
    dims = [(25088, 4096), (4096, 4096), (4096, 152)]
    for i, (din, dout) in zip([2, 5, 8], dims):
        sd1[f"model.{i}.weight"] = rng.standard_normal((dout, din)).astype(np.float32)
        sd1[f"model.{i}.bias"] = rng.standard_normal(dout).astype(np.float32)
    p1 = port.convert_classifier1(sd1)
    assert p1["fc0"]["w"].shape == (25088, 4096)
    assert p1["fc2"]["b"].shape == (152,)
    np.testing.assert_array_equal(p1["fc1"]["w"], sd1["model.5.weight"].T)


def test_convert_ritnet_roundtrip_with_bundled_weights():
    import os

    src = "/root/reference/models/weights/ritnet_pretrained.pkl"
    if not os.path.exists(src):
        pytest.skip("bundled reference weights not present")
    sd = torch.load(src, weights_only=True, map_location="cpu")
    sd = {k: v.numpy() for k, v in sd.items()}
    params = port.convert_ritnet(sd)
    # structure + a weight spot check
    assert params["down1"]["conv1"]["w"].shape == (3, 3, 1, 32)
    np.testing.assert_array_equal(
        params["out_conv"]["w"], np.transpose(sd["out_conv1.weight"], (2, 3, 1, 0))
    )
    np.testing.assert_array_equal(
        params["down3"]["bn"]["mean"], sd["down_block3.bn.running_mean"]
    )


def test_npz_roundtrip(tmp_path):
    params = {"a": {"b": np.arange(6).reshape(2, 3).astype(np.float32)}, "c": np.ones(4)}
    p = str(tmp_path / "x.npz")
    port.save_npz(p, params)
    back = port.load_npz(p)
    np.testing.assert_array_equal(back["a"]["b"], params["a"]["b"])
    np.testing.assert_array_equal(back["c"], params["c"])


def test_vgg19_bn_variant():
    key = jax.random.PRNGKey(0)
    params = VGG19.init(key, bn=True)
    assert "bn1_1" in params and "bn5_4" in params
    x = jnp.ones((1, 64, 64, 3)) * 0.5
    final, content, style = VGG19.apply(params, x, bn=True)
    assert final.shape == (1, 2, 2, 512)
    assert style[0].shape == (1, 64, 64, 64)
