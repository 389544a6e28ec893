"""Measure the decode/device overlap in the OpenEDS2020 feature-extraction
path (round-2 VERDICT weak #7 / next-step #8).

Builds a synthetic multi-sequence tree (PNG frames + label CSVs), then runs
``load_data_openeds2020(extract_feature=True, estimator=1)`` twice — once
with the background decode thread (the wired path, ``openeds2020.py``) and
once with decode forced serial (monkeypatching ``prefetch.background`` to
an identity) — and reports wall times.  The win is bounded by
max(decode, device) / (decode + device); numbers land in BASELINE.md.

    python tools/measure_overlap.py [--seqs 10 --frames 32 --height 192 --width 256]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_tree(root, seqs, frames, h, w):
    from PIL import Image

    rng = np.random.default_rng(0)
    base = os.path.join(root, "openEDS2020-GazePrediction")
    for s in range(seqs):
        sd = os.path.join(base, "validation", "sequences", f"{s:04d}")
        os.makedirs(sd)
        rows = []
        for i in range(frames):
            arr = rng.integers(0, 255, (h, w), dtype=np.uint8)
            Image.fromarray(arr, "L").save(os.path.join(sd, f"{i:03d}.png"))
            rows.append(f"{i},0.0,0.0,1.0")
        ld = os.path.join(base, "validation", "labels")
        os.makedirs(ld, exist_ok=True)
        with open(os.path.join(ld, f"{s:04d}.txt"), "w") as f:
            f.write("\n".join(rows))
    return base + "/"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqs", type=int, default=10)
    ap.add_argument("--frames", type=int, default=32)
    # height + the B7 shell's +16 pad must divide the encoder's 32x
    # downsampling for the decoder skip concats: 176 + 16 = 192 = 6*32
    ap.add_argument("--height", type=int, default=176)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=8)
    args = ap.parse_args()

    import jax

    from iris_style_transfer_tpu.data import openeds2020, prefetch
    from iris_style_transfer_tpu.models.efficientnet import EfficientNet

    with tempfile.TemporaryDirectory() as td:
        data_path = build_tree(td, args.seqs, args.frames, args.height, args.width)
        eff = EfficientNet.init(jax.random.PRNGKey(0))

        def run():
            t0 = time.perf_counter()
            feats, labels = openeds2020.load_data_openeds2020(
                extract_feature=True, estimator=1, data_path=data_path,
                postfix="validation/", efficientnet_params=eff,
                chunk=args.chunk,
            )
            assert feats.shape == (args.seqs * args.frames, 19)
            return time.perf_counter() - t0

        run()  # compile (B7 at this resolution) + page cache warmup

        serial_background = lambda it, size=2: iter(it)  # noqa: E731
        real_background = prefetch.background

        times = {"overlapped": [], "serial": []}
        for _ in range(3):
            prefetch.background = real_background
            times["overlapped"].append(run())
            prefetch.background = serial_background
            times["serial"].append(run())
        prefetch.background = real_background

        ser, ovl = min(times["serial"]), min(times["overlapped"])
        print(
            f"serial {ser:.2f}s  overlapped {ovl:.2f}s  "
            f"speedup {ser / ovl:.2f}x  "
            f"({args.seqs}x{args.frames} frames @ {args.height}x{args.width}, "
            f"chunk {args.chunk}, backend {jax.default_backend()})"
        )


if __name__ == "__main__":
    main()
