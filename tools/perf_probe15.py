"""Round-3 probe: the two remaining block-1 forward hot spots.

After the probe10 fixes the 512px bs4 closure sits at ~65% of its
all-conv bound; probe9's trace locates the biggest remaining forward
overheads in block 1: the conv1_1 forward fusion (1.76 ms — XLA lowers
the C_in=3 conv to a VPU loop exactly like it did the input gradient)
and the relu1_1+stats two-output fusion (1.70 ms — fused correctly but
executed in the 25%-occupancy batch-in-sublanes layout).

Candidates (both flag-gated OFF until this probe accepts them):
  A. USE_MXU_FWD  — conv1_1 forward reassociated as tap-gather + ONE
     K=27 matmul (layers._conv_small_cin_reassoc); autodiff of that
     expression reproduces the probe10 MXU dx for free.
  B. STATS_TAPS   — style taps returned as (mean, std) from the fused
     relu+stats op, whose TPU path is the lane-full Pallas kernel
     (ops/pallas_relu_stats.py) over the bitcast (H, W, B*C) view.

Variants at the bench config (E=48, 512px bs4, bf16, unroll 8):
  base / +A / +B / +A+B / +A+B+pallas-pool (the probe14 kernel stacked
  on top, if its own probe accepted it).

    python tools/perf_probe15.py
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
    cs = [jax.random.uniform(jax.random.fold_in(key, 10 + i), shape) for i in range(5)]
    s = jax.random.uniform(jax.random.fold_in(key, 2), shape)
    jax.block_until_ready((params, cs, s))

    kw = dict(
        epochs=E,
        compute_dtype=jnp.bfloat16,
        history_size=10,
        scan_unroll=8,
        lbfgs_dtype=jnp.bfloat16,
    )

    # (name, USE_MXU_FWD, stats_taps, FUSE_RELU_POOL)
    variants = [
        ("base", False, False, False),
        ("+A mxu-fwd", True, False, False),
        ("+B stats-taps", False, True, False),
        ("+A+B", True, True, False),
        ("+A+B+pool-bwd", True, True, True),
    ]
    fns, losses = {}, {}
    for name, mxu_fwd, stats, fuse in variants:
        L.USE_MXU_FWD = mxu_fwd
        L.FUSE_RELU_POOL = fuse
        fn = jax.jit(make_nst_fn(stats_taps=stats, **kw))
        res = fn(params, cs[0], s)
        losses[name] = float(res.s_loss_hist[-1])
        fns[name] = fn
        print(f"compiled {name}: s_loss={losses[name]:.6f}", flush=True)
    L.USE_MXU_FWD = False
    L.FUSE_RELU_POOL = False

    times = {name: [] for name, *_ in variants}
    for rep in range(3):
        for name, *_ in variants:
            c = cs[1 + rep]
            t0 = time.perf_counter()
            out = fns[name](params, c, s)
            _ = float(jnp.sum(out.x[:, ::64, ::64, :]))
            times[name].append(time.perf_counter() - t0)

    print()
    for name, *_ in variants:
        t = min(times[name])
        print(f"{name:<16} {E / t:7.2f} steps/s  "
              f"({', '.join(f'{x:.3f}' for x in times[name])})  s_loss={losses[name]:.6f}")


if __name__ == "__main__":
    main()
