"""Round-4 probe: PARTIAL batch-on-channels packing (pack_factor=k).

probe12 rejected full pack_batch ((B, H, W, 3) -> (1, H, W, B*3)) at
4.4x slower — XLA's grouped-conv lowering at g=B swamps the layout win.
But the round-4 bs64 trace shows the real pathology is narrower: block
1's relu/pool boundary ops tile at 12.5-50% occupancy because C=64
half-fills the 128 lanes, costing ~19 of the 44.2 ms closure.  k=2
packing ((64, 224, 224, 3) -> (32, 224, 224, 6), feature_group_count=2
convs) fills the lanes at block 1 with the grouped-conv degradation
bounded to g=2.  Numerics are trajectory-identical (f32 CPU check in
the dev log; s_loss printed here must match).

    python tools/perf_probe25.py [--epochs 48]
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


def run(fn, params, c, s):
    t0 = time.perf_counter()
    out = fn(params, c, s)
    _ = float(jnp.sum(out.x))
    return time.perf_counter() - t0, float(out.s_loss_hist[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=48)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--factors", type=int, nargs="+", default=[1, 2])
    args = ap.parse_args()

    from iris_style_transfer_tpu.models import VGG19
    from iris_style_transfer_tpu.transfer.nst import make_nst_fn

    E = args.epochs
    key = jax.random.PRNGKey(0)
    params = VGG19.init(key)
    shape = (64, 224, 224, 3)
    cs = [
        jax.random.uniform(jax.random.fold_in(key, 10 + i), shape)
        for i in range(args.reps + 2)
    ]
    s = jax.random.uniform(jax.random.fold_in(key, 2), shape)
    jax.block_until_ready((cs, s))

    kw = dict(
        epochs=E,
        compute_dtype=jnp.bfloat16,
        history_size=10,
        scan_unroll=8,
        lbfgs_dtype=jnp.bfloat16,
    )

    base = None
    for k in args.factors:
        fn = jax.jit(make_nst_fn(pack_factor=k, **kw))
        run(fn, params, cs[0], s)  # compile + warmup
        ts, losses = [], []
        for i in range(args.reps):
            t, sl = run(fn, params, cs[1 + i], s)
            ts.append(t)
            losses.append(sl)
        sps = E / min(ts)
        if k == 1:
            base = sps
        ratio = f" ({sps / base:.3f}x base)" if base else ""
        print(
            f"pack_factor={k}: {sps:7.2f} steps/s (s_loss {losses[0]:.6g}){ratio}",
            flush=True,
        )


if __name__ == "__main__":
    main()
