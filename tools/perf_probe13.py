"""Round-3 probe: EfficientNet-B7 full-res segmentation dtype.

The 2020 IST pipeline's dominant non-NST cost is chunked B7 U-Net
segmentation at 400x640 (ist_openeds2020.make_programs).  The workload
exposes --compute_dtype (default bfloat16) but the seg programs called
``EfficientNet.apply`` without forwarding it, so the 65M-param model ran
float32 — on v5e the MXU's f32 path is ~1/4 the bf16 rate.

Measures chunk-of-8 TTA segmentation at (8, 400, 640, 1): f32 vs bf16
images/s, plus the argmax label agreement between the two (bf16 logits
can flip rare boundary pixels; quantify instead of hand-waving).

    python tools/perf_probe13.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from iris_style_transfer_tpu.runtime.cache import enable_compile_cache

enable_compile_cache()


def main():
    from iris_style_transfer_tpu.models import EfficientNet

    key = jax.random.PRNGKey(0)
    params = EfficientNet.init(key)
    xs = [
        jax.random.uniform(jax.random.fold_in(key, i), (8, 400, 640, 1))
        for i in range(4)
    ]
    jax.block_until_ready((params, xs))

    fns = {
        "f32": jax.jit(lambda p, x: EfficientNet.apply(p, x, compute_dtype=jnp.float32)),
        "bf16": jax.jit(lambda p, x: EfficientNet.apply(p, x, compute_dtype=jnp.bfloat16)),
    }
    labels = {}
    for name, fn in fns.items():
        out = fn(params, xs[0])
        labels[name] = np.asarray(out)
        print(f"compiled {name}", flush=True)

    agree = float(np.mean(labels["f32"] == labels["bf16"]))
    print(f"argmax agreement f32 vs bf16: {agree:.6f}")

    times = {name: [] for name in fns}
    for rep in range(3):
        for name, fn in fns.items():
            x = xs[1 + rep]
            t0 = time.perf_counter()
            out = fn(params, x)
            _ = int(jnp.sum(out[:, ::64, ::64]))
            times[name].append(time.perf_counter() - t0)

    for name in fns:
        t = min(times[name])
        print(f"{name:>5}: {8 / t:6.2f} images/s  "
              f"({', '.join(f'{x:.3f}' for x in times[name])})")


if __name__ == "__main__":
    main()
