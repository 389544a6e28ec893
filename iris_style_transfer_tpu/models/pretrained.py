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

import hashlib
import json
import os

from .port import load_npz

WEIGHTS_DIR = os.path.join(os.path.dirname(__file__), "weights")
MANIFEST_PATH = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "tools", "weights_manifest.json")
)

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


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for block in iter(lambda: f.read(1 << 20), b""):
            h.update(block)
    return h.hexdigest()


def _manifest_entry(kind: str) -> dict | None:
    try:
        with open(MANIFEST_PATH) as f:
            manifest = json.load(f)
    except (OSError, ValueError):
        return None
    for a in manifest.get("artifacts", []):
        if a.get("kind") == kind:
            return a
    return None


def verify_manifest_checksum(kind: str, path: str) -> None:
    """Validate an auto-discovery npz against the ``npz_sha256`` recorded
    in tools/weights_manifest.json (written by ``record_npz_checksum`` when
    ``tools/fetch_and_port.sh`` ports the artifact).  A manually-dropped or
    corrupted npz fails loudly instead of silently skewing the science; an
    entry without a recorded checksum (nothing ported yet) passes."""
    entry = _manifest_entry(kind)
    want = (entry or {}).get("npz_sha256")
    if not want:
        return
    got = _sha256(path)
    if got != want:
        raise ValueError(
            f"{kind} weights at {path} fail the manifest checksum "
            f"(sha256 {got[:12]}… != recorded {want[:12]}…). Re-port with "
            "tools/fetch_and_port.sh, or update tools/weights_manifest.json "
            "if the npz was replaced deliberately."
        )


def record_npz_checksum(kind: str, path: str) -> None:
    """Record ``path``'s sha256 as the manifest's ``npz_sha256`` for
    ``kind`` (called by tools/fetch_and_port.sh after a successful port)."""
    with open(MANIFEST_PATH) as f:
        manifest = json.load(f)
    for a in manifest.get("artifacts", []):
        if a.get("kind") == kind:
            a["npz_sha256"] = _sha256(path)
            break
    else:
        raise KeyError(f"no manifest artifact entry for kind={kind}")
    with open(MANIFEST_PATH, "w") as f:
        json.dump(manifest, f, indent=2)
        f.write("\n")


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
        verify_manifest_checksum(kind, path)
        print(f"[weights] {kind} <- {path} (auto-discovered)")
        return load_npz(path)
    if init_fn is None:
        raise FileNotFoundError(f"no pretrained weights for {kind} and no fallback")
    print(f"[weights] {kind}: no ported npz found -> seeded init (structural run)")
    return init_fn()
