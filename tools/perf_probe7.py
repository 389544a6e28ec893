"""Round-3 single-chip probes (VERDICT r2 next-step #4): the remaining
named candidates toward ~40 steps/s at the 512px bs4 north star.

  donate   jit(donate_argnums=(1,)) on the NST fn — lets XLA alias the
           content buffer into x0 (one 12.6 MB copy per CALL, so expected
           ~neutral per step; measured because the VERDICT names it).
  fp8hist  L-BFGS history buffers in float8_e4m3fn (halves the ~250 MB/step
           of (m, N) reads in the compact direction).  Numerics guard:
           s_loss after E steps compared against base.
  m6       history_size 6 instead of 10 (less history traffic, slightly
           different direction quality — s_loss compared).

Interleaved reps in one process so tunnel drift can't masquerade as a win
(same methodology as tools/perf_probe5/6.py).  Results + accept/reject are
recorded in BASELINE.md.

    python tools/perf_probe7.py [--size 512 --batch 4 --epochs 48 --reps 4]
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
    _ = float(jnp.sum(out.x[:, ::64, ::64, :]))
    return time.perf_counter() - t0, float(out.s_loss_hist[-1])


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

    def build(donate=False, lbfgs_dtype=jnp.bfloat16, m=10):
        fn = make_nst_fn(
            epochs=E,
            compute_dtype=jnp.bfloat16,
            history_size=m,
            scan_unroll=8,
            lbfgs_dtype=lbfgs_dtype,
        )
        return jax.jit(fn, donate_argnums=(1,) if donate else ())

    configs = {
        "base": build(),
        "donate": build(donate=True),
        "m6": build(m=6),
    }
    try:
        configs["fp8hist"] = build(lbfgs_dtype=jnp.float8_e4m3fn)
    except Exception as e:
        print(f"fp8hist build failed: {type(e).__name__}: {e}", flush=True)

    # compile + warmup (donate consumes its input: always pass a copy)
    s_losses = {}
    for label, fn in configs.items():
        try:
            _, sl = scan_time(fn, params, jnp.array(xs[0]), s)
            s_losses[label] = sl
        except Exception as e:
            print(f"{label} failed at runtime: {type(e).__name__}: {e}", flush=True)
            configs[label] = None
    configs = {k: v for k, v in configs.items() if v is not None}

    times = {k: [] for k in configs}
    for r in range(args.reps):
        for label, fn in configs.items():
            t, _ = scan_time(fn, params, jnp.array(xs[1 + r % 6]), s)
            times[label].append(t)
    base_sl = s_losses.get("base")
    for label, ts in times.items():
        t = min(ts)
        drift = (
            abs(s_losses[label] - base_sl) / max(abs(base_sl), 1e-9)
            if base_sl is not None
            else float("nan")
        )
        print(
            f"{label}: {E/t:.2f} steps/s  ({t*1e3/E:.2f} ms/step)  "
            f"s_loss={s_losses[label]:.6g} (drift {drift:.2e})  "
            f"all={[round(E/x, 2) for x in ts]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
