"""Backward-chain probe round 2: relu residual dtype + scan unroll depth.

Follow-up to tools/perf_probe5.py (which settled the maxpool VJP).  Two
remaining candidates for the ~7 ms/step gap between the NST closure and
its fwd-parity estimate (BASELINE.md closure decomposition):

  relu_mask  custom relu VJP storing a 1 B/elt bool sign mask instead of
             the 2 B/elt bf16 conv output jnp.maximum's VJP re-reads.
             Expected to be ~neutral: the conv output is materialized in
             HBM anyway (it feeds the next conv), so the mask trades one
             extra 1 B write in fwd for a 1 B (vs 2 B) read in bwd.
  unroll16   scan unroll 16 vs the wired 8 — more fusion scope for XLA's
             scheduler at the cost of a bigger program.

Interleaved reps in one process so tunnel drift can't masquerade as a
win, same methodology as probe5.

    python tools/perf_probe6.py [--size 512 --batch 4 --epochs 48 --reps 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


@jax.custom_vjp
def relu_mask(x):
    return jnp.maximum(x, 0)


def _relu_fwd(x):
    return jnp.maximum(x, 0), x > 0


def _relu_bwd(mask, ct):
    return (jnp.where(mask, ct, jnp.zeros((), ct.dtype)),)


relu_mask.defvjp(_relu_fwd, _relu_bwd)


def scan_time(fn, params, x, s):
    t0 = time.perf_counter()
    out = fn(params, x, s)
    _ = float(jnp.sum(out.x[:, ::64, ::64, :]))
    return time.perf_counter() - t0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--epochs", type=int, default=48)
    p.add_argument("--reps", type=int, default=4)
    args = p.parse_args()

    from iris_style_transfer_tpu.models import VGG19
    from iris_style_transfer_tpu.transfer.nst import make_nst_fn

    key = jax.random.PRNGKey(0)
    params = VGG19.init(key)
    shape = (args.batch, args.size, args.size, 3)
    xs = [jax.random.uniform(jax.random.fold_in(key, i), shape) for i in range(8)]
    s = jax.random.uniform(jax.random.fold_in(key, 99), shape)
    jax.block_until_ready((params, xs, s))
    E = args.epochs
    print(f"backend={jax.default_backend()} shape={shape} epochs={E}", flush=True)

    stock_relu = jax.nn.relu

    def build(unroll):
        return jax.jit(
            make_nst_fn(
                epochs=E,
                compute_dtype=jnp.bfloat16,
                history_size=10,
                scan_unroll=unroll,
                lbfgs_dtype=jnp.bfloat16,
            )
        )

    fns = {}
    for label, relu_impl, unroll in (
        ("base8", stock_relu, 8),
        ("relumask8", relu_mask, 8),
        ("base16", stock_relu, 16),
    ):
        jax.nn.relu = relu_impl
        try:
            fns[label] = build(unroll)
            scan_time(fns[label], params, xs[0], s)  # compile + warmup
        finally:
            jax.nn.relu = stock_relu

    times = {k: [] for k in fns}
    for r in range(args.reps):
        for label, fn in fns.items():
            times[label].append(scan_time(fn, params, xs[1 + r % 6], s))
    for label, ts in times.items():
        t = min(ts)
        print(f"{label}: {E/t:.2f} steps/s  ({t*1e3/E:.2f} ms/step)  "
              f"all={[round(E/x, 2) for x in ts]}", flush=True)


if __name__ == "__main__":
    main()
