"""Benchmark: NST optimization steps/sec at 512px (the north-star metric,
BASELINE.md).  Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Configuration mirrors the reference's NST hot loop (``pipelines.py:79-103``)
at the headline resolution: joint-batch L-BFGS (lr 1, BN style loss,
content clone init) over a (4, 512, 512, 3) batch, whole loop in one
``lax.scan`` on device, bfloat16 VGG compute with f32 loss accumulation.

Guards against runtime result-caching / elision: every timed call gets a
fresh content batch, and a 4x-epochs scaling check validates that wall
time scales with work — if it doesn't, the conservative (scaled) number is
reported.

``vs_baseline``: the reference publishes no speed numbers (BASELINE.md);
the divisor is an estimate of the reference's torch-LBFGS steps/sec on one
A100 at this config (per-closure VGG fwd+bwd at 512px plus the reference's
per-closure host syncs, ``pipelines.py:93-95``), to be replaced by a real
measurement when one lands.
"""

import json
import time

import jax
import jax.numpy as jnp

# Estimated A100 reference throughput for (4, 3, 512, 512) LBFGS NST with
# per-closure host syncs.  Documented in BASELINE.md; refine with real
# measurements.
A100_BASELINE_STEPS_PER_SEC = 13.0

BATCH = 4
SIZE = 512
EPOCHS = 100


def run(fn, params, c, s):
    t0 = time.perf_counter()
    res = fn(params, c, s)
    # force real execution with a host readback: on some remote/tunneled
    # backends block_until_ready returns before the computation runs
    checksum = float(jnp.sum(res.x[:, ::64, ::64, :]))
    return time.perf_counter() - t0, res, checksum


def main():
    from iris_style_transfer_tpu.models import VGG19
    from iris_style_transfer_tpu.transfer.nst import make_nst_fn

    key = jax.random.PRNGKey(0)
    params = VGG19.init(key)
    cs = [
        jax.random.uniform(jax.random.fold_in(key, 10 + i), (BATCH, SIZE, SIZE, 3))
        for i in range(4)
    ]
    s = jax.random.uniform(jax.random.fold_in(key, 2), (BATCH, SIZE, SIZE, 3))
    jax.block_until_ready((cs, s))

    fn = jax.jit(make_nst_fn(epochs=EPOCHS, compute_dtype=jnp.bfloat16, history_size=10, scan_unroll=8, lbfgs_dtype=jnp.bfloat16))
    fn_q = jax.jit(
        make_nst_fn(epochs=EPOCHS // 4, compute_dtype=jnp.bfloat16, history_size=10, scan_unroll=8, lbfgs_dtype=jnp.bfloat16)
    )

    run(fn, params, cs[0], s)  # compile + warmup
    run(fn_q, params, cs[0], s)

    times = [run(fn, params, c, s)[0] for c in cs[1:4]]
    t_full = min(times)
    t_quarter = min(run(fn_q, params, c, s)[0] for c in cs[1:3])
    # physical ceiling check: each closure is >=2.5 TFLOP of VGG compute;
    # report nothing faster than the chip's peak could deliver
    peak_flops = 400e12  # generous v5e bf16 ceiling
    flops_per_step = 2.5e12
    max_steps_per_sec = peak_flops / flops_per_step

    steps_per_sec = EPOCHS / t_full
    # scaling sanity: full epochs should take ~4x the quarter run
    ratio = t_full / max(t_quarter, 1e-9)
    if ratio < 2.0:  # work did not scale -> distrust, report conservative
        steps_per_sec = (EPOCHS // 4) / t_quarter / 4.0
    if steps_per_sec > max_steps_per_sec:
        raise SystemExit(
            f"benchmark implausible ({steps_per_sec:.0f} steps/s > physical "
            f"ceiling {max_steps_per_sec:.0f}); backend did not execute"
        )

    # secondary configs (VERDICT r1 weak #9): the Gram-loss 512px path (the
    # memory-bound case the Pallas kernel targets, win/loss recorded) and
    # the production IST config (64, 224, 224, 3).  Failures here never
    # break the primary metric line.
    extra = {}
    try:
        g_epochs = 40
        for label, pg in (("gram_512px_bs4_steps_per_sec", "auto"),
                          ("gram_512px_bs4_steps_per_sec_xla", False)):
            gfn = jax.jit(make_nst_fn(
                epochs=g_epochs, bn_loss=False, pallas_gram=pg,
                compute_dtype=jnp.bfloat16, history_size=10, scan_unroll=8, lbfgs_dtype=jnp.bfloat16,
            ))
            run(gfn, params, cs[0], s)  # compile + warmup
            t = min(run(gfn, params, c, s)[0] for c in cs[1:3])
            extra[label] = round(g_epochs / t, 2)

        ist_bs, ist_size, ist_epochs = 64, 224, 50
        ci = jax.random.uniform(jax.random.fold_in(key, 30), (ist_bs, ist_size, ist_size, 3))
        si = jax.random.uniform(jax.random.fold_in(key, 31), (ist_bs, ist_size, ist_size, 3))
        ifn = jax.jit(make_nst_fn(
            epochs=ist_epochs, compute_dtype=jnp.bfloat16, history_size=10,
            scan_unroll=8, lbfgs_dtype=jnp.bfloat16,
        ))
        run(ifn, params, ci, si)  # compile + warmup
        ci2 = jax.random.uniform(jax.random.fold_in(key, 32), ci.shape)
        t_ist, _, _ = run(ifn, params, ci2, si)
        # a production batch runs 200 closure evals (reference
        # iris_style_transfer_openeds2019.py:245)
        extra["ist_224px_bs64_images_per_min"] = round(
            ist_bs / (t_ist * (200 / ist_epochs)) * 60, 1
        )
    except Exception as e:  # pragma: no cover - defensive
        extra["error"] = f"{type(e).__name__}: {e}"

    print(
        json.dumps(
            {
                "metric": "nst_steps_per_sec_512px_bs4",
                "value": round(steps_per_sec, 2),
                "unit": "closure_evals/sec",
                "vs_baseline": round(steps_per_sec / A100_BASELINE_STEPS_PER_SEC, 2),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
