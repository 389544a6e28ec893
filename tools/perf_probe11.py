"""Round-3 probe: fused relu+pool VJP vs composed ops.

After perf_probe10's fixes, the re-trace (perf_probe9) showed the
relu1_2+pool1 backward costing 3.97 ms/closure: XLA materializes two
full-resolution upsampled arrays (pooled cotangent and pooled max,
broadcast back to 512^2) before a separate select fusion.
``layers.relu_max_pool`` keeps the whole backward in the windowed 6-d
domain — one fusion reading x, the pooled max and the pooled cotangent.

Measures {composed, fused} at the bench config (E=48, 512px bs4, bf16,
unroll 8), interleaved, min of 3, loss equality asserted.

    python tools/perf_probe11.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from iris_style_transfer_tpu.runtime.cache import enable_compile_cache

enable_compile_cache()


def main():
    from iris_style_transfer_tpu.models import VGG19
    from iris_style_transfer_tpu.models import layers as L
    from iris_style_transfer_tpu.transfer.nst import make_nst_fn

    E = 48
    key = jax.random.PRNGKey(0)
    params = VGG19.init(key)
    shape = (4, 512, 512, 3)
    cs = [jax.random.uniform(jax.random.fold_in(key, 10 + i), shape) for i in range(4)]
    s = jax.random.uniform(jax.random.fold_in(key, 2), shape)
    jax.block_until_ready((params, cs, s))

    kw = dict(
        epochs=E,
        compute_dtype=jnp.bfloat16,
        history_size=10,
        scan_unroll=8,
        lbfgs_dtype=jnp.bfloat16,
    )

    variants = [("composed relu;pool", False), ("fused relu_max_pool", True)]
    fns, losses = {}, {}
    for name, fuse in variants:
        L.FUSE_RELU_POOL = fuse  # trace-time flag
        fn = jax.jit(make_nst_fn(**kw))
        res = fn(params, cs[0], s)
        losses[name] = float(res.s_loss_hist[-1])
        fns[name] = fn
        print(f"compiled {name}: s_loss={losses[name]:.6f}", flush=True)

    times = {name: [] for name, _ in variants}
    for rep in range(3):
        for name, _ in variants:
            c = cs[1 + rep]
            t0 = time.perf_counter()
            out = fns[name](params, c, s)
            _ = float(jnp.sum(out.x[:, ::64, ::64, :]))
            times[name].append(time.perf_counter() - t0)

    print()
    for name, _ in variants:
        t = min(times[name])
        print(f"{name:<22} {E / t:7.2f} steps/s  "
              f"({', '.join(f'{x:.3f}' for x in times[name])})  s_loss={losses[name]:.6f}")


if __name__ == "__main__":
    main()
