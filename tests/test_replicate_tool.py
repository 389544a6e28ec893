"""Smoke test for the synthetic-twin replication tool's RITnet stage.

``tools/replicate_synthetic.py`` trains RITnet from scratch on the twin's
ground-truth segmentations (the analog of the reference's bundled
checkpoint, which was trained on real OpenEDS2019 —
``models/ritnet/ritnet.py:17,30``).  This keeps that training loop from
rotting: one epoch on tiny frames must run and produce a finite loss and
a valid mIoU.
"""

import importlib.util
import os

import numpy as np

import pytest

pytestmark = pytest.mark.slow  # full-tier only: see pyproject.toml


def _load_tool():
    path = os.path.join(
        os.path.dirname(__file__), "..", "tools", "replicate_synthetic.py"
    )
    spec = importlib.util.spec_from_file_location("replicate_synthetic", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_replicate_rotation_tiny(tmp_path, monkeypatch):
    """Smoke for the rotation/perspective robustness eval tool
    (``tools/replicate_rotation.py``): tiny twin, fresh heads saved as a
    checkpoint, one small angle grid — must produce accuracies in [0, 1]
    and retention keys for both feature types."""
    import sys

    import jax

    from iris_style_transfer_tpu.models import Classifier1, Classifier2
    from iris_style_transfer_tpu.runtime.checkpoint import save_checkpoint

    path = os.path.join(
        os.path.dirname(__file__), "..", "tools", "replicate_rotation.py"
    )
    spec = importlib.util.spec_from_file_location("replicate_rotation", path)
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)

    key = jax.random.PRNGKey(0)
    heads = {
        "c1": Classifier1.init(key, 4),
        "c2": Classifier2.init(jax.random.fold_in(key, 1), num_class=4),
    }
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), 1, {"params": heads})

    monkeypatch.setattr(sys, "argv", [
        "replicate_rotation", "--ckpt", str(ckpt), "--users", "4",
        "--n_per_user", "6", "--angles", "0,45", "--pers", "0,0.3",
        "--crop_size", "64", "--chunk", "4",
    ])
    results = tool.main()
    for k in ("rot/0/c1", "rot/45/c2", "pers/0.3/c1",
              "rot/45/retention_c1", "rot/45/retention_c2"):
        assert k in results, k
        assert np.isfinite(results[k])
    assert 0.0 <= results["rot/45/c1"] <= 1.0
    assert 0.0 <= results["rot/45/c2"] <= 1.0


def test_train_ritnet_tiny():
    """Feed train_ritnet the UINT8 frames the tool's main actually
    passes (synthetic_openeds2019 keeps load_data_openeds2019's uint8
    image contract since round 3) — the float-frame variant masked the
    round-5 regression where 0-255 inputs hit the [0,1]-domain
    gamma/CLAHE transform and silently collapsed RITnet training."""
    from iris_style_transfer_tpu.data.synthetic import synthetic_eye_batch

    tool = _load_tool()
    imgs, segs, _ = synthetic_eye_batch(8, height=48, width=64, seed=3)
    imgs_u8 = np.round(np.clip(imgs, 0.0, 1.0) * 255.0).astype(np.uint8)
    params, miou = tool.train_ritnet(
        list(imgs_u8), list(segs), epochs=1, bs=4, lr=1e-3
    )
    assert 0.0 <= miou <= 1.0
    flat = [np.asarray(x) for x in __import__("jax").tree.leaves(params)]
    assert all(np.isfinite(a).all() for a in flat)

    # the dequantized path must match training on the float frames: same
    # preprocessed input domain regardless of the staging dtype
    import jax.numpy as jnp

    from iris_style_transfer_tpu.models import RITnet

    t_u8 = np.asarray(RITnet.transform(jnp.asarray(imgs_u8[:2], jnp.float32) / 255.0))
    t_f = np.asarray(RITnet.transform(jnp.asarray(imgs[:2])))
    assert abs(t_u8.mean() - t_f.mean()) < 0.05 and t_u8.min() >= -1.0 - 1e-6
