"""Single-chip NST perf ablation probe (north-star config: 512px bs4).

Times the closure's components separately to localize the gap between the
whole-closure throughput and the conv microbenchmark ceiling
(BASELINE.md: convs reach 111-189 TFLOP/s, the closure ~74):

  1. VGG forward only (truncated at relu4_2)
  2. VGG forward+backward (grad of a scalar over the taps)
  3. + content/BN-style losses (the real closure loss)
  4. full scan step incl. L-BFGS direction
  plus scan-unroll and L-BFGS-dtype variants of the full program.

Timing: fresh inputs per run, host-readback checksum (the tunneled
backend's block_until_ready is unreliable — see BASELINE.md methodology),
min of 3.  One process, all measurements batched (the box has 1 CPU core).

    python tools/perf_probe.py [--size 512 --batch 4 --epochs 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def readback_time(fn, *args, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(jax.tree.leaves(out)[0]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--epochs", type=int, default=50)
    args = p.parse_args()

    from iris_style_transfer_tpu.models import VGG19
    from iris_style_transfer_tpu.ops.losses import (
        content_loss_l2,
        style_loss_bn,
        style_stats,
    )
    from iris_style_transfer_tpu.transfer.nst import make_nst_fn

    key = jax.random.PRNGKey(0)
    params = VGG19.init(key)
    shape = (args.batch, args.size, args.size, 3)
    xs = [jax.random.uniform(jax.random.fold_in(key, i), shape) for i in range(8)]
    s = jax.random.uniform(jax.random.fold_in(key, 99), shape)
    jax.block_until_ready((params, xs, s))
    print(f"backend={jax.default_backend()} shape={shape}", flush=True)

    vgg = lambda x: VGG19.apply(params, x, truncate=True, compute_dtype=jnp.bfloat16)

    # --- 1. forward only ------------------------------------------------
    @jax.jit
    def fwd(x):
        _, c, st = vgg(x)
        return sum(jnp.sum(t.astype(jnp.float32)) for t in c + st)

    fwd(xs[0])
    t = readback_time(fwd, xs[1])
    print(f"fwd_only: {t*1e3/1:.2f} ms", flush=True)

    # --- 2. forward+backward (plain tap-sum loss) -----------------------
    @jax.jit
    def fwdbwd(x):
        def loss(x):
            _, c, st = vgg(x)
            return sum(jnp.sum(t.astype(jnp.float32)) for t in c + st)

        return jax.grad(loss)(x)

    fwdbwd(xs[0])
    t = readback_time(fwdbwd, xs[1])
    print(f"fwd_bwd: {t*1e3:.2f} ms", flush=True)

    # --- 3. the real closure loss ---------------------------------------
    _, c_feats, _ = jax.jit(vgg)(xs[0])
    _, _, s_feats = jax.jit(vgg)(s)
    c_t = [jax.lax.stop_gradient(f) for f in c_feats]
    s_t = [tuple(map(jax.lax.stop_gradient, style_stats(f))) for f in s_feats]

    @jax.jit
    def closure(x):
        def loss(x):
            _, xc, xst = vgg(x)
            return content_loss_l2(xc, c_t) + style_loss_bn(xst, s_t)

        return jax.value_and_grad(loss)(x)

    closure(xs[0])
    t = readback_time(closure, xs[1])
    print(f"closure(fwd+bwd+losses): {t*1e3:.2f} ms", flush=True)

    # --- 4. full scan variants ------------------------------------------
    E = args.epochs
    for label, kwargs in (
        ("scan_u1", dict(scan_unroll=1)),
        ("scan_u2", dict(scan_unroll=2)),
        ("scan_u4", dict(scan_unroll=4)),
        ("adam_u2", dict(scan_unroll=2, optimizer="adam")),
    ):
        fn = jax.jit(
            make_nst_fn(epochs=E, compute_dtype=jnp.bfloat16, history_size=10, **kwargs)
        )
        fn(params, xs[0], s)
        t = min(readback_time(fn, params, x, s, reps=1) for x in xs[1:4])
        print(f"{label}: {E/t:.2f} steps/s  ({t*1e3/E:.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
