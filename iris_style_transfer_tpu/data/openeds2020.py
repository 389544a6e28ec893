"""OpenEDS2020 gaze-subset loading.

Reference: ``load_data_openeds2020`` (``data_preprocessing.py:349-419``):
walks ``sequences/`` dirs sorted, reads per-sequence gaze CSVs (drop index
column), tolerates test-set label files 5 frames longer (``:399``), and
optionally extracts features on the fly — EfficientNet seg + landmarks for
estimator 1, ResNet50 2048-d for estimator 2 (``:378-383,406-412``).

The reference materializes up to 550K frames eagerly in RAM one at a time;
here decode is streamed and feature extraction runs as chunked batched
device programs (the host->device pipeline of SURVEY.md §7 hard-part 5).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from .native_loader import decode_gray_batch


def load_data_openeds2020(
    extract_feature: bool,
    estimator: int = 1,
    data_path: str = "../data/openeds2020/openEDS2020-GazePrediction/",
    postfix: str = "test/",
    efficientnet_params: dict | None = None,
    resnet_params: dict | None = None,
    chunk: int = 32,
    max_sequences: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (images-or-features, gaze labels).  Images are (N, 400, 640,
    1) float32; features are (N, 19) landmarks (estimator 1) or (N, 2048)
    ResNet features (estimator 2)."""
    import pandas as pd
    from PIL import Image

    from ..models.efficientnet import EfficientNet
    from ..models.resnet import ResNet50
    from ..ops.ellipse import extract_eye_landmarks

    if extract_feature:
        if estimator == 1:
            assert efficientnet_params is not None

            @jax.jit
            def extract(batch):
                segs = EfficientNet.apply(efficientnet_params, batch)
                return jax.vmap(extract_eye_landmarks)(segs)

        else:
            assert resnet_params is not None

            @jax.jit
            def extract(batch):
                rgb = jnp.repeat(batch, 3, axis=-1)
                return ResNet50.apply(resnet_params, rgb)

    images, labels = [], []
    seq_dir = os.path.join(data_path, postfix, "sequences")
    sequence_names = sorted(os.listdir(seq_dir))
    if max_sequences:
        sequence_names = sequence_names[:max_sequences]

    pending: list[np.ndarray] = []

    def flush():
        if not pending:
            return
        n = len(pending)
        pad = (-n) % chunk
        batch = np.stack(pending + [pending[-1]] * pad)
        for i in range(0, len(batch), chunk):
            feats = np.asarray(extract(jnp.asarray(batch[i : i + chunk])))
            images.append(feats)
        if pad:
            images[-1] = images[-1][:-pad]
        pending.clear()

    dims = None
    for sequence_name in sequence_names:
        img_names = sorted(os.listdir(os.path.join(seq_dir, sequence_name)))
        label = pd.read_csv(
            os.path.join(data_path, postfix, "labels", sequence_name + ".txt"), header=None
        )
        label = label.iloc[:, 1:].to_numpy(np.float32)  # drop index column
        # train/valid: equal; test: labels 5 frames longer (:399)
        assert len(img_names) == len(label) or len(img_names) == len(label) - 5
        labels.append(label[: len(img_names)])

        seq_paths = [os.path.join(seq_dir, sequence_name, n) for n in img_names]
        if dims is None:
            dims = np.asarray(Image.open(seq_paths[0]).convert("L")).shape
        # native threaded decode of the whole sequence (PIL fallback inside)
        arrs = decode_gray_batch(seq_paths, dims[0], dims[1])
        if extract_feature:
            pending.extend(arrs)
            if len(pending) >= 4 * chunk:
                flush()
        else:
            images.append(arrs)
    if extract_feature:
        flush()

    return np.concatenate(images), np.concatenate(labels)
