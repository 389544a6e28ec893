"""Round-3 probe: batch-packed NST (batch stacked on the channel axis).

perf_probe9's re-trace showed the remaining early-layer cost is format,
not fusion: at bs4 XLA lays every (4, 512, 512, 64) tensor out
batch-in-sublanes, so each (8, 128) vector register holds 4x64 useful
elements — 25% occupancy — and the big block-1 elementwise/stat fusions
run ~4-5x off the bandwidth roofline (perf_probe11's fused relu+pool was
exactly neutral, confirming fusion structure isn't the lever).

pack_batch=True reshapes (B, H, W, 3) -> (1, H, W, B*3) and runs every
conv as a B-group conv (weights tiled per group): no batch dimension
exists, so layouts become C-minor with g*C >= 128 lanes filled.
Numerically identical per-image (losses corrected for the channel-count
normalizer; verified to float rounding on CPU).

Measures {unpacked, packed} at the bench config (E=48, 512px bs4, bf16,
unroll 8), interleaved, min of 3.

    python tools/perf_probe12.py
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

    variants = [("unpacked (bs4)", False), ("packed (1, H, W, 12)", True)]
    fns, losses = {}, {}
    for name, pb in variants:
        fn = jax.jit(make_nst_fn(pack_batch=pb, **kw))
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
