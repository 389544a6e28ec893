"""Round-3 probe: fused Pallas depthwise+BN+SiLU in the B7 encoder.

probe13 established the full-res B7 segmentation path is bound by its
depthwise convs and surrounding elementwise work (bf16 gained only +16%).
``ops/pallas_depthwise.py`` collapses each stride-1 MBConv's
dwconv+BN+SiLU into one bandwidth-roofline pass (manual halo DMA,
channels in lanes).  This probe measures chunk-of-8 TTA segmentation at
the production (8, 400, 640, 1) shape with the kernel off vs on, plus
argmax label agreement (the kernel reassociates the k^2 taps in f32 —
boundary-pixel flips should be rare; quantify).

    python tools/perf_probe17.py
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
    from iris_style_transfer_tpu.models import efficientnet as eff

    key = jax.random.PRNGKey(0)
    params = EfficientNet.init(key)
    xs = [
        jax.random.uniform(jax.random.fold_in(key, i), (8, 400, 640, 1))
        for i in range(4)
    ]
    jax.block_until_ready((params, xs))

    fns, labels = {}, {}
    for name, flag in (("xla", False), ("pallas-dw", True)):
        eff.PALLAS_DW = flag
        fn = jax.jit(lambda p, x: EfficientNet.apply(p, x, compute_dtype=jnp.bfloat16))
        labels[name] = np.asarray(fn(params, xs[0]))
        fns[name] = fn
        print(f"compiled {name}", flush=True)
    eff.PALLAS_DW = False

    agree = float(np.mean(labels["xla"] == labels["pallas-dw"]))
    print(f"argmax agreement xla vs pallas-dw: {agree:.6f}")

    times = {name: [] for name in fns}
    for rep in range(3):
        for name, fn in fns.items():
            x = xs[1 + rep]
            t0 = time.perf_counter()
            out = fn(params, x)
            _ = int(jnp.sum(out[:, ::64, ::64]))
            times[name].append(time.perf_counter() - t0)

    print()
    for name in fns:
        t = min(times[name])
        print(f"{name:<10} {8 / t:7.2f} images/s  "
              f"({', '.join(f'{x:.3f}' for x in times[name])})")


if __name__ == "__main__":
    main()
