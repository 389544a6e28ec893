"""Round-3 probe: the flag-gated kernels at the PRODUCTION IST config.

probe14/15 measure the three pending candidates at the 512px bs4 bench
config, where the pathology is the 25%-occupancy batch-in-sublanes
layout.  The production pipelines run a different shape — the 2019 IST
inner loop is a joint-batch (64, 224, 224, 3) L-BFGS NST
(reference iris_style_transfer_openeds2019.py:93-100) — where bs=64
fills the sublanes and the layout story may differ entirely.  This probe
A/Bs the same variants at that config so the accepted defaults are
chosen per the config that actually serves, not just the bench number:

  base / +pool-bwd(FUSE_RELU_POOL) / +A(USE_MXU_FWD) / +B(STATS_TAPS) / all

Reports steps/s and stylized images/min/chip (the BENCH_extra secondary
metric).

    python tools/perf_probe16.py [--epochs 24]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from iris_style_transfer_tpu.runtime.cache import enable_compile_cache

enable_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=24)
    args = ap.parse_args()

    from iris_style_transfer_tpu.models import VGG19
    from iris_style_transfer_tpu.models import layers as L
    from iris_style_transfer_tpu.transfer.nst import make_nst_fn

    E = args.epochs
    key = jax.random.PRNGKey(0)
    params = VGG19.init(key)
    shape = (64, 224, 224, 3)
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

    # (name, FUSE_RELU_POOL, USE_MXU_FWD, stats_taps)
    variants = [
        ("base", False, False, False),
        ("+pool-bwd", True, False, False),
        ("+A mxu-fwd", False, True, False),
        ("+B stats-taps", False, False, True),
        ("all", True, True, True),
    ]
    fns, losses = {}, {}
    for name, fuse, mxu_fwd, stats in variants:
        L.FUSE_RELU_POOL = fuse
        L.USE_MXU_FWD = mxu_fwd
        fn = jax.jit(make_nst_fn(stats_taps=stats, **kw))
        res = fn(params, cs[0], s)
        losses[name] = float(res.s_loss_hist[-1])
        fns[name] = fn
        print(f"compiled {name}: s_loss={losses[name]:.6f}", flush=True)
    L.FUSE_RELU_POOL = False
    L.USE_MXU_FWD = False

    times = {name: [] for name, *_ in variants}
    for rep in range(3):
        for name, *_ in variants:
            c = cs[1 + rep]
            t0 = time.perf_counter()
            out = fns[name](params, c, s)
            _ = float(jnp.sum(out.x[:, ::32, ::32, :]))
            times[name].append(time.perf_counter() - t0)

    print()
    for name, *_ in variants:
        t = min(times[name])
        # images/min at the reference's 200 closure evals per batch
        ipm = 64 / (200 * t / E) * 60
        print(f"{name:<14} {E / t:7.2f} steps/s  {ipm:7.1f} img/min/chip "
              f"({', '.join(f'{x:.3f}' for x in times[name])})  s_loss={losses[name]:.6f}")


if __name__ == "__main__":
    main()
