"""Checkpointing — params + optimizer state + step, resumable.

The reference only saves weights (``torch.save(state_dict)`` every
``save_period`` epochs, ``iris_classification.py:111-113``) with no resume.
Here checkpoints carry the full training state — params, optimizer state
and step — as dependency-free npz files, and ``restore_checkpoint`` /
``restore_state`` / ``latest_step`` make sweeps resumable
(SURVEY.md §5.3-5.4).
"""

from __future__ import annotations

import os
import re

import jax
import numpy as np

from ..models.port import flatten_pytree, unflatten_pytree


def _npz_path(ckpt_dir: str, step: int) -> str:
    return os.path.join(ckpt_dir, f"step_{step:08d}.npz")


def save_checkpoint(ckpt_dir: str, step: int, state: dict) -> str:
    """Save a pytree of arrays (params / opt state / counters) at ``step``."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = _npz_path(ckpt_dir, step)
    host_state = jax.tree.map(lambda a: np.asarray(a), state)
    np.savez(path, **flatten_pytree(host_state))
    return path


def latest_step(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        int(m.group(1))
        for f in os.listdir(ckpt_dir)
        if (m := re.match(r"step_(\d+)\.npz$", f))
    ]
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir: str, step: int | None = None) -> tuple[int, dict] | None:
    """Restore the given (or latest) checkpoint; returns (step, state)."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            return None
    with np.load(_npz_path(ckpt_dir, step)) as f:
        flat = {k: f[k] for k in f.files}
    return step, unflatten_pytree(flat)


def restore_checkpoint_file(path: str) -> tuple[int, dict]:
    """Restore the *exact* checkpoint file named.

    The reference loads precisely the epoch file passed on the CLI
    (``iris_style_transfer_openeds2019.py:235-239``) — not the newest file
    in its directory.  The step is parsed from the filename when present.
    """
    m = re.search(r"step_(\d+)\.npz$", os.path.basename(path))
    with np.load(path) as f:
        flat = {k: f[k] for k in f.files}
    return (int(m.group(1)) if m else 0), unflatten_pytree(flat)


def restore_params(path: str | None, default=None):
    """Params from a checkpoint path with reference-faithful semantics:
    an exact file loads that file; a directory loads its latest step; an
    empty path returns ``default``; a named-but-missing path raises (the
    reference's ``torch.load`` would too)."""
    if not path:
        return default
    if os.path.isfile(path):
        return restore_checkpoint_file(path)[1]["params"]
    res = restore_checkpoint(path)
    if res is None:
        raise FileNotFoundError(f"checkpoint not found: {path}")
    return res[1]["params"]


# ---------------------------------------------------------------------------
# arbitrary pytrees (optimizer states contain namedtuples, not just dicts):
# leaves are stored positionally; restore needs a structurally-identical
# template (e.g. a freshly-initialized state).
# ---------------------------------------------------------------------------


def save_state(ckpt_dir: str, step: int, state) -> str:
    """Save any pytree (params + optimizer state + counters) at ``step``."""
    os.makedirs(ckpt_dir, exist_ok=True)
    leaves = [np.asarray(x) for x in jax.tree.leaves(state)]
    path = os.path.join(ckpt_dir, f"state_{step:08d}.npz")
    np.savez(path, **{f"leaf_{i:05d}": a for i, a in enumerate(leaves)})
    return path


def latest_state_step(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        int(m.group(1))
        for f in os.listdir(ckpt_dir)
        if (m := re.match(r"state_(\d+)\.npz$", f))
    ]
    return max(steps) if steps else None


def restore_state(ckpt_dir: str, template, step: int | None = None):
    """Restore a pytree saved by :func:`save_state` into ``template``'s
    structure; returns (step, state) or None."""
    if step is None:
        step = latest_state_step(ckpt_dir)
        if step is None:
            return None
    path = os.path.join(ckpt_dir, f"state_{step:08d}.npz")
    with np.load(path) as f:
        leaves = [f[k] for k in sorted(f.files)]
    treedef = jax.tree.structure(template)
    return step, jax.tree.unflatten(treedef, leaves)
