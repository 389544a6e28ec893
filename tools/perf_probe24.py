"""Round-4 probe: strided-slice 2x2 max-pool vs the reshape-to-6D form.

The round-4 bs64 trace (tools/perf_probe9.py --batch 64 --size 224) puts
the pool boundary ops at ~19 ms of the 44.2 ms closure, led by pool1's
backward (compare_select 6.8 ms + materialized 6-D broadcasts 3.3 ms)
and forward (broadcast_maximum 4.0 ms + 6-D reduce 1.6 ms) — all far
above their ~1.3 ms HBM bound.  Root cause: the 6-D intermediates
(B, H/2, 2, W/2, 2, C) have minor dims (2, C); at block 1 (C=64) that
tiles to 2/8 sublanes x 64/128 lanes = 12.5% occupancy.

``layers._max_pool2_strided`` reformulates pool fwd as the max of four
H/W-strided slices and the bwd as four elementwise compares scattered
back through interior-padded adds — every op 4-D in the tensor's own
(B, C)-minor layout.  Numerics are bit-identical (tests/test_layers
round-trip incl. ties).  This probe A/Bs the full NST closure with the
flag off/on at both serving configs:

    production IST  (64, 224, 224, 3)   — the north-star config
    bench           (4, 512, 512, 3)    — the headline metric

    python tools/perf_probe24.py [--epochs 48]
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
    args = ap.parse_args()

    from iris_style_transfer_tpu.models import VGG19
    from iris_style_transfer_tpu.models import layers as L
    from iris_style_transfer_tpu.transfer.nst import make_nst_fn

    E = args.epochs
    key = jax.random.PRNGKey(0)
    params = VGG19.init(key)

    kw = dict(
        epochs=E,
        compute_dtype=jnp.bfloat16,
        history_size=10,
        scan_unroll=8,
        lbfgs_dtype=jnp.bfloat16,
    )

    for label, shape in (
        ("production ist", (64, 224, 224, 3)),
        ("bench 512px", (4, 512, 512, 3)),
    ):
        cs = [
            jax.random.uniform(jax.random.fold_in(key, 10 + i), shape)
            for i in range(args.reps + 2)
        ]
        s = jax.random.uniform(jax.random.fold_in(key, 2), shape)
        jax.block_until_ready((cs, s))
        results = {}
        for name, flag in (("6d-reshape", False), ("strided", True)):
            L.POOL_STRIDED = flag
            fn = jax.jit(make_nst_fn(**kw))
            run(fn, params, cs[0], s)  # compile + warmup
            ts, losses = [], []
            for i in range(args.reps):
                t, sl = run(fn, params, cs[1 + i], s)
                ts.append(t)
                losses.append(sl)
            results[name] = (E / min(ts), losses[0])
            print(
                f"{label:16s} {name:12s} {E / min(ts):7.2f} steps/s "
                f"(s_loss {losses[0]:.6g})",
                flush=True,
            )
        base, new = results["6d-reshape"][0], results["strided"][0]
        print(f"{label:16s} strided/base = {new / base:.3f}x", flush=True)
    L.POOL_STRIDED = True


if __name__ == "__main__":
    main()
