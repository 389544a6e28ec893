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
