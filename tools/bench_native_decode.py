"""One-shot benchmark: native C++ threaded decode vs the PIL fallback.

Round-3 VERDICT weak #2 follow-up: the native loader now auto-builds on
first use (data/native_loader.py), so the measured pipelines actually
exercise the C++ path — this records its margin over PIL once, on
OpenEDS-shaped frames (400x640 grayscale PNGs, the format of all 12.7K
2019 images and 550K 2020 frames; reference decode path:
``data_preprocessing.py:297,326,403``).

Usage: python tools/bench_native_decode.py [--n 256] [--threads 8]
Prints one JSON block; the interpretation lives in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from iris_style_transfer_tpu.data import native_loader  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from PIL import Image

    tmp = tempfile.mkdtemp()
    rng = np.random.default_rng(0)
    h, w = 400, 640
    paths = []
    for i in range(args.n):
        # eye-like smooth content so PNG sizes resemble the dataset's
        base = rng.integers(0, 256, size=(h // 8, w // 8), dtype=np.uint8)
        arr = np.kron(base, np.ones((8, 8), np.uint8))
        p = os.path.join(tmp, f"f{i:04d}.png")
        Image.fromarray(arr, "L").save(p)
        paths.append(p)

    out = {"n": args.n, "threads": args.threads, "shape": [h, w],
           "native_built": native_loader.available()}

    def timed(fn):
        fn()  # warm page cache
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    if native_loader.available():
        t = timed(lambda: native_loader.decode_gray_batch(
            paths, h, w, threads=args.threads, dtype=np.uint8))
        out["native_u8_images_per_sec"] = round(args.n / t, 1)
        t = timed(lambda: native_loader.decode_gray_batch(
            paths, h, w, threads=args.threads))
        out["native_f32_images_per_sec"] = round(args.n / t, 1)

    real_load = native_loader._load
    native_loader._load = lambda: None  # force the PIL fallback
    try:
        t = timed(lambda: native_loader.decode_gray_batch(
            paths, h, w, dtype=np.uint8))
        out["pil_u8_images_per_sec"] = round(args.n / t, 1)
    finally:
        native_loader._load = real_load

    if "native_u8_images_per_sec" in out:
        out["native_over_pil_u8"] = round(
            out["native_u8_images_per_sec"] / out["pil_u8_images_per_sec"], 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
