"""Full-closure NST variants at 512px bs4 after the circular-buffer L-BFGS:

  u4          current production program (f32 history, unroll 4)
  u8          unroll 8
  bf16hist    bfloat16 L-BFGS history buffers (halves optimizer HBM traffic)
  bf16hist_u8 both

Also prints the final s_loss of each variant on the same inputs so the
bf16-history trajectory can be sanity-checked against f32.

    python tools/perf_probe4.py [--size 512 --batch 4 --epochs 40]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def scan_time(fn, params, x, s):
    t0 = time.perf_counter()
    out = fn(params, x, s)
    chk = float(jnp.sum(out.x[:, ::64, ::64, :]))
    return time.perf_counter() - t0, float(out.s_loss_hist[-1])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--epochs", type=int, default=40)
    args = p.parse_args()

    from iris_style_transfer_tpu.transfer.nst import make_nst_fn
    from iris_style_transfer_tpu.models import VGG19

    key = jax.random.PRNGKey(0)
    params = VGG19.init(key)
    shape = (args.batch, args.size, args.size, 3)
    xs = [jax.random.uniform(jax.random.fold_in(key, i), shape) for i in range(6)]
    s = jax.random.uniform(jax.random.fold_in(key, 99), shape)
    jax.block_until_ready((params, xs, s))
    E = args.epochs
    print(f"backend={jax.default_backend()} shape={shape} epochs={E}", flush=True)

    for label, kwargs in (
        ("u4", dict(scan_unroll=4)),
        ("u8", dict(scan_unroll=8)),
        ("bf16hist", dict(scan_unroll=4, lbfgs_dtype=jnp.bfloat16)),
        ("bf16hist_u8", dict(scan_unroll=8, lbfgs_dtype=jnp.bfloat16)),
    ):
        fn = jax.jit(
            make_nst_fn(epochs=E, compute_dtype=jnp.bfloat16, history_size=10, **kwargs)
        )
        scan_time(fn, params, xs[0], s)  # compile + warmup
        results = [scan_time(fn, params, x, s) for x in xs[1:4]]
        t = min(r[0] for r in results)
        print(f"{label}: {E/t:.2f} steps/s  ({t*1e3/E:.2f} ms/step)  "
              f"s_loss={results[0][1]:.6g}", flush=True)


if __name__ == "__main__":
    main()
