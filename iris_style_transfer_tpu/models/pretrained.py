"""Pretrained-weight discovery and loading for the workload CLIs.

The reference's science runs on torchvision VGG19 ``IMAGENET1K_V1``
(``/root/reference/models/vgg/vgg.py:39-48``), ResNet50 ``IMAGENET1K_V2``
(``/root/reference/models/resnet/resnet.py:18``) and the downloadable smp
``Unet(efficientnet-b7)`` checkpoint
(``/root/reference/models/efficientnet/efficientnet.py:22-24``,
``readme.md:35``).  Those torch checkpoints are ported once to npz pytrees
with ``tools/port_weights.py``; workloads consume them either via an
explicit ``--vgg_weights / --resnet_weights / --effnet_weights`` flag or by
auto-discovery under ``iris_style_transfer_tpu/models/weights/``.

In zero-egress environments with no ported npz available the models fall
back to their deterministic seeded inits (structural runs only — accuracy
numbers are not scientific without the real weights, see PARITY.md).
"""

from __future__ import annotations

import os

from .port import load_npz

WEIGHTS_DIR = os.path.join(os.path.dirname(__file__), "weights")

# auto-discovery filenames under models/weights/
DEFAULT_NAMES = {
    "vgg19": "vgg19.npz",
    "resnet50": "resnet50.npz",
    "efficientnet_unet": "unet_efficientnet-b7.npz",
    "ritnet": "ritnet.npz",
}


def pretrained_path(kind: str) -> str | None:
    """Auto-discovered npz path for ``kind``, or None when absent."""
    path = os.path.join(WEIGHTS_DIR, DEFAULT_NAMES[kind])
    return path if os.path.exists(path) else None


def load_pretrained(kind: str, explicit_path: str = "", init_fn=None):
    """Load ported pretrained params for ``kind``.

    Priority: an explicitly named npz file (errors if missing — the
    reference's ``torch.load`` would too), then auto-discovery under
    ``models/weights/``, then ``init_fn()`` (seeded init) with a warning.
    """
    if explicit_path:
        if not os.path.exists(explicit_path):
            raise FileNotFoundError(f"{kind} weights not found: {explicit_path}")
        print(f"[weights] {kind} <- {explicit_path}")
        return load_npz(explicit_path)
    path = pretrained_path(kind)
    if path is not None:
        print(f"[weights] {kind} <- {path} (auto-discovered)")
        return load_npz(path)
    if init_fn is None:
        raise FileNotFoundError(f"no pretrained weights for {kind} and no fallback")
    print(f"[weights] {kind}: no ported npz found -> seeded init (structural run)")
    return init_fn()
