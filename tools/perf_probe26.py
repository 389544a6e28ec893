"""Round-4 probe: the 3-D-tiled Pallas relu+pool kernels on the chip.

The round-3 kernel (full-W strips) never actually ran at the production
bs64 config — its VMEM working set made ``supported()`` False there, so
probe16's "neutral" verdict measured the pure-XLA fused form, not the
kernel.  The round-4 kernels tile H-pairs, W-pairs AND the lane dim
(ops/pallas_pool.py), fitting any shape, and add the forward pass.

A/B: FUSE_RELU_POOL off (canonical composed path) vs on (fused relu+pool
routed through the Pallas kernels where supported) at both serving
configs.  s_loss must agree to ~bf16 noise (tie-to-all + fold-relu
semantics are bit-compatible; tests/test_layers.py).

    python tools/perf_probe26.py [--epochs 48]
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
    from iris_style_transfer_tpu.ops import pallas_pool
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
        print(
            f"{label}: pool1 kernel supported = "
            f"{pallas_pool.supported((shape[0], shape[1], shape[2], 64), 2, 2)}",
            flush=True,
        )
        cs = [
            jax.random.uniform(jax.random.fold_in(key, 10 + i), shape)
            for i in range(args.reps + 2)
        ]
        s = jax.random.uniform(jax.random.fold_in(key, 2), shape)
        jax.block_until_ready((cs, s))
        results = {}
        for name, flag in (("composed-xla", False), ("pallas-fused", True)):
            L.FUSE_RELU_POOL = flag
            fn = jax.jit(make_nst_fn(**kw))
            run(fn, params, cs[0], s)  # compile + warmup
            ts, losses = [], []
            for i in range(args.reps):
                t, sl = run(fn, params, cs[1 + i], s)
                ts.append(t)
                losses.append(sl)
            results[name] = E / min(ts)
            print(
                f"{label:16s} {name:14s} {E / min(ts):7.2f} steps/s "
                f"(s_loss {losses[0]:.6g})",
                flush=True,
            )
        print(
            f"{label:16s} pallas/base = "
            f"{results['pallas-fused'] / results['composed-xla']:.3f}x",
            flush=True,
        )
    L.FUSE_RELU_POOL = False


if __name__ == "__main__":
    main()
