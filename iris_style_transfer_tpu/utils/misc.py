"""Seeding, directory prep, notebook plotting.

Reference: ``utils.seed`` (``utils.py:19-30``) seeds numpy/torch/random at
42; JAX uses explicit keys, so :func:`seed` seeds the host RNGs (used for
dataset splits and style-donor sampling, preserving the reference's
*semantics*, not its streams — SURVEY.md §7 hard-part 6) and returns a
``jax.random`` key for device-side randomness.

``prepare_dir`` (``utils.py:32-42``) deletes and recreates an output dir;
an ``idempotent`` mode keeps existing outputs for resumable sweeps
(SURVEY.md §5.3).
"""

from __future__ import annotations

import json
import os
import random
import shutil

import jax
import numpy as np


def seed(seed_value: int = 42, verbose: bool = True) -> jax.Array:
    """Seed host RNGs and return a JAX PRNG key."""
    if verbose:
        print("\nrandom seed:", seed_value)
    np.random.seed(seed_value)
    random.seed(seed_value)
    return jax.random.PRNGKey(seed_value)


def prepare_dir(path: str, idempotent: bool = False) -> None:
    """Prepare an output directory (reference ``utils.py:32-42`` wipes it;
    ``idempotent=True`` keeps it for resume)."""
    if os.path.isdir(path):
        if idempotent:
            return
        shutil.rmtree(path)
    os.makedirs(path)


def plot_help(images, titles, figsize=None, grayscale: bool = True, axis_off: bool = False):
    """Notebook plotting helper (reference ``utils.py:112-161``); accepts
    numpy/JAX arrays (H, W), (H, W, 1) or (H, W, 3), channel-last."""
    import matplotlib.pyplot as plt  # lazy: not needed on workers

    assert len(titles) == len(images)
    cmap = "gray" if grayscale else None
    if figsize is None:
        figsize = (len(titles) * 3 + 1, 3)
    f, axarr = plt.subplots(nrows=1, ncols=len(titles), figsize=figsize)
    if len(titles) == 1:
        axarr = [axarr]
    for a, t, img in zip(axarr, titles, images):
        a.set_title(t)
        arr = np.asarray(img)
        if arr.ndim == 3 and arr.shape[-1] == 1:
            arr = arr[..., 0]
        a.imshow(arr, cmap=cmap if arr.ndim == 2 else None)
        if axis_off:
            a.axis("off")
    plt.show()


def sweep_done(marker_path: str, config: dict, defaults: dict | None = None) -> bool:
    """True if a sweep-completion marker exists AND was written under the
    same configuration.  A marker from a run with a different seed / batch
    size / weights must NOT cause a skip — it would silently suppress the
    new configuration's results (the combo directory is keyed only by
    (s_loss_weight, nst_epoch, split)).

    ``defaults``: config keys ADDED to the schema after a marker was
    written do not invalidate it while they still hold their default
    value (otherwise every new WorkloadConfig knob would force a one-time
    re-run of all completed combos); any non-default value re-runs."""
    if not os.path.exists(marker_path):
        return False
    try:
        with open(marker_path) as fh:
            data = json.load(fh)
    except (json.JSONDecodeError, OSError):
        return False
    stored = data.get("config")
    if stored == config:
        return True
    if defaults and isinstance(stored, dict):
        added = {k: v for k, v in config.items() if k not in stored}
        if added and all(
            k in defaults and defaults[k] == v for k, v in added.items()
        ):
            return {k: v for k, v in config.items() if k in stored} == stored
    return False


def write_sweep_marker(marker_path: str, config: dict, metrics: dict) -> None:
    """Write a done.json carrying both the completed combo's metrics and
    the configuration identity :func:`sweep_done` checks."""
    with open(marker_path, "w") as fh:
        json.dump(
            {"config": config, "metrics": {k: float(v) for k, v in metrics.items()}},
            fh,
        )
