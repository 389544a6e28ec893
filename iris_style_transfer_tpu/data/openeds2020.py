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

from ..ops.image import to_unit_float
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
    compute_dtype=None,
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (images-or-features, gaze labels).  Images are (N, 400, 640,
    1) uint8 (native file depth; device programs dequantize via
    ``ops.image.to_unit_float``); features are (N, 19) landmarks
    (estimator 1) or (N, 2048) ResNet features (estimator 2).

    The sequence walk and label-parsing rules (sorted dirs, drop index
    column, the test-set 5-extra-rows tolerance) live in ONE place,
    :func:`_sequence_index` — shared with the streaming loader."""
    from PIL import Image

    from ..models.efficientnet import EfficientNet
    from ..models.resnet import ResNet50
    from ..ops.ellipse import extract_eye_landmarks

    if extract_feature:
        if estimator == 1:
            assert efficientnet_params is not None

            @jax.jit
            def extract(batch):
                batch = to_unit_float(batch)  # frames decode as uint8
                # bf16 B7 is +16% images/s with identical argmax labels
                # (tools/perf_probe13.py)
                segs = EfficientNet.apply(
                    efficientnet_params, batch,
                    compute_dtype=compute_dtype or jnp.float32,
                )
                return jax.vmap(extract_eye_landmarks)(segs)

        else:
            assert resnet_params is not None

            @jax.jit
            def extract(batch):
                rgb = jnp.repeat(to_unit_float(batch), 3, axis=-1)
                return ResNet50.apply(
                    resnet_params, rgb, compute_dtype=compute_dtype or jnp.float32
                )

    seq_paths, labels = _sequence_index(data_path, postfix, max_sequences)

    images: list[np.ndarray] = []
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

    dims = np.asarray(Image.open(seq_paths[0][0]).convert("L")).shape

    # decode in a background thread so the native threaded decoder stays
    # ahead of the chunked device programs instead of alternating serially
    # (reference data_preprocessing.py:378-414 does everything serially)
    from .prefetch import background

    decoded = background(
        (decode_gray_batch(paths, dims[0], dims[1], dtype=np.uint8) for paths in seq_paths),
        size=2,
    )
    for arrs in decoded:
        if extract_feature:
            pending.extend(arrs)
            if len(pending) >= 4 * chunk:
                flush()
        else:
            images.append(arrs)
    if extract_feature:
        flush()

    return np.concatenate(images), np.concatenate(labels)


def _sequence_index(data_path: str, postfix: str, max_sequences: int | None = None):
    """(sequence image-path lists, per-sequence labels) without decoding a
    single frame — labels are tiny CSVs, so they always load eagerly."""
    import pandas as pd

    seq_dir = os.path.join(data_path, postfix, "sequences")
    sequence_names = sorted(os.listdir(seq_dir))
    if max_sequences:
        sequence_names = sequence_names[:max_sequences]

    seq_paths, labels = [], []
    for sequence_name in sequence_names:
        img_names = sorted(os.listdir(os.path.join(seq_dir, sequence_name)))
        label = pd.read_csv(
            os.path.join(data_path, postfix, "labels", sequence_name + ".txt"),
            header=None,
        )
        label = label.iloc[:, 1:].to_numpy(np.float32)
        assert len(img_names) == len(label) or len(img_names) == len(label) - 5
        labels.append(label[: len(img_names)])
        seq_paths.append(
            [os.path.join(seq_dir, sequence_name, n) for n in img_names]
        )
    return seq_paths, labels


def load_labels_openeds2020(
    data_path: str, postfix: str = "test/", max_sequences: int | None = None
) -> np.ndarray:
    """All gaze labels of a split as one (N, 3) array (no image decode)."""
    _, labels = _sequence_index(data_path, postfix, max_sequences)
    return np.concatenate(labels)


def stream_openeds2020(
    data_path: str,
    postfix: str = "test/",
    batch_size: int = 128,
    max_sequences: int | None = None,
    shuffle_seed: int | None = None,
    drop_remainder: bool = False,
    buffer_batches: int = 4,
    stats: dict | None = None,
):
    """Stream a split as (images (B, H, W, 1) uint8, labels (B, 3),
    valid (B,)) batches — the OpenEDS2020 sets hold up to 550K frames
    (``appendix.pdf`` Table 5), far beyond what the reference's eager
    materialization (``data_preprocessing.py:385-417``) allows on modest
    hosts.  Sequences are decoded lazily through the native threaded
    loader, holding O(batch x buffer_batches + two sequences) frames in
    memory (the current sequence's frames in the shuffle buffer plus one
    decoded ahead by the background thread — ``stats['peak_buffer_frames']``
    counts the shuffle buffer only, not the one-sequence lookahead); the
    final short batch is padded by repeating the last row with
    ``valid`` marking real rows (the same contract as
    ``prefetch.batch_iterator``), or dropped with ``drop_remainder``.

    ``shuffle_seed`` turns this into an epoch-reshuffled training stream
    (sequence-order shuffle + within-buffer shuffle — pass
    ``seed + epoch``): every frame is visited exactly once per epoch while
    host RAM stays bounded.  This is the estimator-2 raw-image training
    path (SURVEY §7 hard-part 5); the reference instead materializes the
    whole ~563 GB split.

    ``stats``, when given, records ``peak_buffer_frames`` so tests can
    assert the memory bound.
    """
    from PIL import Image

    seq_paths, labels = _sequence_index(data_path, postfix, max_sequences)
    if not seq_paths:
        return

    rng = np.random.default_rng(shuffle_seed) if shuffle_seed is not None else None
    order = list(range(len(seq_paths)))
    if rng is not None:
        rng.shuffle(order)

    dims = np.asarray(Image.open(seq_paths[0][0]).convert("L")).shape
    buf_imgs: list[np.ndarray] = []
    buf_labs: list[np.ndarray] = []
    hold = max(buffer_batches, 1) * batch_size  # shuffle-buffer size

    def note_peak():
        if stats is not None:
            stats["peak_buffer_frames"] = max(
                stats.get("peak_buffer_frames", 0), len(buf_imgs)
            )

    def take_batch():
        """Pop one batch from the buffer — a uniform sample without
        replacement under shuffle, FIFO otherwise."""
        if rng is not None:
            picks = rng.choice(len(buf_imgs), size=batch_size, replace=False)
            picks = np.sort(picks)[::-1]  # pop descending to keep indices valid
            imgs = np.stack([buf_imgs[i] for i in picks])
            labs = np.stack([buf_labs[i] for i in picks])
            for i in picks:
                buf_imgs.pop(i)
                buf_labs.pop(i)
            return imgs, labs
        imgs = np.stack(buf_imgs[:batch_size])
        labs = np.stack(buf_labs[:batch_size])
        del buf_imgs[:batch_size]
        del buf_labs[:batch_size]
        return imgs, labs

    def drain(final: bool):
        nonlocal buf_imgs, buf_labs
        floor = 0 if final else hold
        while len(buf_imgs) >= max(batch_size, floor + (0 if final else 1)):
            imgs, labs = take_batch()
            yield imgs, labs, np.ones(batch_size, bool)
        if final and buf_imgs and not drop_remainder:
            n = len(buf_imgs)
            pad = batch_size - n
            imgs = np.stack(buf_imgs + [buf_imgs[-1]] * pad)
            labs = np.stack(buf_labs + [buf_labs[-1]] * pad)
            valid = np.zeros(batch_size, bool)
            valid[:n] = True
            buf_imgs, buf_labs = [], []
            yield imgs, labs, valid

    # decode the NEXT sequence in a background thread while the consumer
    # trains on batches drained from the current one (the same
    # decode/device overlap the feature-extraction path uses —
    # prefetch.background; one sequence of lookahead keeps the memory
    # bound at O(batch x buffer_batches + two sequences))
    from .prefetch import background

    def decoded():
        for si in order:
            yield si, decode_gray_batch(seq_paths[si], dims[0], dims[1], dtype=np.uint8)

    for si, frames in background(decoded(), size=1):
        buf_imgs.extend(frames)
        buf_labs.extend(labels[si])
        note_peak()
        yield from drain(final=False)
    note_peak()
    yield from drain(final=True)
