"""Manifest-checked pretrained loads + converter round trips of the
builder's own checkpoints (round-3 VERDICT next-step #7).

The reference reloads its own ``.pth`` head checkpoints at eval time
(``iris_style_transfer_openeds2019.py:234-241``); the equivalents here are
(a) ``runtime.checkpoint`` save -> ``restore_params`` of the builder's own
params, and (b) ``port.convert_*`` of a torch-layout state dict carrying
the SAME weights — both must reproduce the original pytree exactly.  And
since the pretrained npz artifacts arrive by side channel (egress-gated),
``load_pretrained`` validates auto-discovered files against the
``npz_sha256`` recorded in tools/weights_manifest.json.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iris_style_transfer_tpu.models import (
    Classifier2,
    GazeEstimator1,
    load_pretrained,
    port,
    pretrained,
)
from iris_style_transfer_tpu.runtime.checkpoint import restore_params, save_checkpoint


@pytest.fixture()
def tiny_weights_env(tmp_path, monkeypatch):
    """A sandboxed weights dir + manifest so the test never touches the
    real auto-discovery path."""
    wdir = tmp_path / "weights"
    wdir.mkdir()
    manifest = tmp_path / "manifest.json"
    manifest.write_text(json.dumps({
        "artifacts": [{"kind": "vgg19", "out": "weights/vgg19.npz"}]
    }))
    monkeypatch.setattr(pretrained, "WEIGHTS_DIR", str(wdir))
    monkeypatch.setattr(pretrained, "MANIFEST_PATH", str(manifest))
    params = {"conv1_1": {"w": np.arange(12, dtype=np.float32).reshape(1, 1, 3, 4),
                          "b": np.zeros(4, np.float32)}}
    npz = os.path.join(str(wdir), "vgg19.npz")
    port.save_npz(npz, params)
    return npz, params


def test_load_without_recorded_checksum_passes(tiny_weights_env):
    npz, params = tiny_weights_env
    got = load_pretrained("vgg19")
    np.testing.assert_array_equal(got["conv1_1"]["w"], params["conv1_1"]["w"])


def test_recorded_checksum_validates_and_rejects_corruption(tiny_weights_env):
    npz, params = tiny_weights_env
    pretrained.record_npz_checksum("vgg19", npz)
    entry = pretrained._manifest_entry("vgg19")
    assert len(entry["npz_sha256"]) == 64

    got = load_pretrained("vgg19")  # matching checksum loads fine
    np.testing.assert_array_equal(got["conv1_1"]["b"], params["conv1_1"]["b"])

    with open(npz, "ab") as f:  # a corrupted / swapped drop-in fails loudly
        f.write(b"\x00")
    with pytest.raises(ValueError, match="manifest checksum"):
        load_pretrained("vgg19")


def test_explicit_path_bypasses_manifest(tiny_weights_env, tmp_path):
    # a user's own finetuned npz at an explicit path is not subject to the
    # artifact manifest (mirrors the reference's unchecked torch.load)
    npz, params = tiny_weights_env
    other = str(tmp_path / "custom.npz")
    port.save_npz(other, params)
    pretrained.record_npz_checksum("vgg19", npz)
    got = load_pretrained("vgg19", explicit_path=other)
    np.testing.assert_array_equal(got["conv1_1"]["w"], params["conv1_1"]["w"])


def _torch_layout_state_dict(params, linear_indices, prefix="model"):
    """The torch Sequential state dict carrying the same weights as an
    fc0/fc1/... pytree (inverse of port.convert_mlp_head's mapping)."""
    sd = {}
    for j, i in enumerate(linear_indices):
        sd[f"{prefix}.{i}.weight"] = np.asarray(params[f"fc{j}"]["w"]).T
        sd[f"{prefix}.{i}.bias"] = np.asarray(params[f"fc{j}"]["b"])
    return sd


def test_own_classifier_checkpoint_roundtrips_through_save_and_convert(tmp_path):
    key = jax.random.PRNGKey(0)
    params = Classifier2.init(key, num_class=7)

    # leg 1: the builder's own checkpoint save -> exact-file restore
    path = save_checkpoint(str(tmp_path / "ckpt"), 3, {"params": params})
    restored = restore_params(path, None)  # unwraps the "params" entry
    jax.tree.map(np.testing.assert_array_equal, restored, params)

    # leg 2: the same weights in torch Sequential layout -> convert_*
    sd = _torch_layout_state_dict(params, [0, 3, 6])
    converted = port.convert_classifier2(sd)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        converted, dict(params),
    )

    # and the logits agree end to end (style taps at the VGG channel widths)
    rng = np.random.default_rng(0)
    feats = [
        jnp.asarray(rng.random((2, 8, 8, c)), jnp.float32)
        for c in (64, 128, 256, 512)
    ]
    np.testing.assert_allclose(
        np.asarray(Classifier2.apply(converted, feats)),
        np.asarray(Classifier2.apply(params, feats)),
        rtol=1e-6,
    )


def test_own_estimator_checkpoint_roundtrips_through_convert():
    key = jax.random.PRNGKey(1)
    params = GazeEstimator1.init(key)
    sd = _torch_layout_state_dict(params, [0, 3, 6])
    converted = port.convert_gaze_estimator(sd)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        converted, dict(params),
    )
