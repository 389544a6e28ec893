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


def test_train_ritnet_tiny():
    from iris_style_transfer_tpu.data.synthetic import synthetic_eye_batch

    tool = _load_tool()
    imgs, segs, _ = synthetic_eye_batch(8, height=48, width=64, seed=3)
    params, miou = tool.train_ritnet(
        list(imgs), list(segs), epochs=1, bs=4, lr=1e-3
    )
    assert 0.0 <= miou <= 1.0
    flat = [np.asarray(x) for x in __import__("jax").tree.leaves(params)]
    assert all(np.isfinite(a).all() for a in flat)
