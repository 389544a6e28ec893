"""Round-3 probe: XLA/libtpu compiler-flag sweep on the NST closure.

BASELINE.md locates the remaining single-chip gap (34.5 vs a ~74 steps/s
conv-mix ceiling) in XLA's scheduling/fusion of the mixed-shape graph, not
in the convolutions.  Flags are process-global, so each setting runs in a
fresh subprocess (same measurement body as tools/perf_probe7.py, E=48,
min of reps); failures (unknown flag on this libtpu) are recorded, not
fatal.

    python tools/perf_probe8.py
"""

import json
import os
import subprocess
import sys

BODY = r"""
import time
import jax, jax.numpy as jnp
from iris_style_transfer_tpu.models import VGG19
from iris_style_transfer_tpu.transfer.nst import make_nst_fn

key = jax.random.PRNGKey(0)
params = VGG19.init(key)
shape = (4, 512, 512, 3)
xs = [jax.random.uniform(jax.random.fold_in(key, i), shape) for i in range(6)]
s = jax.random.uniform(jax.random.fold_in(key, 99), shape)
jax.block_until_ready((params, xs, s))
E = 48
fn = jax.jit(make_nst_fn(epochs=E, compute_dtype=jnp.bfloat16,
                         history_size=10, scan_unroll=8,
                         lbfgs_dtype=jnp.bfloat16))
def t(x):
    t0 = time.perf_counter()
    out = fn(params, x, s)
    _ = float(jnp.sum(out.x[:, ::64, ::64, :]))
    return time.perf_counter() - t0
t(xs[0])
best = min(t(xs[1 + r]) for r in range(3))
print(f"RESULT {E/best:.2f}", flush=True)
"""

SETTINGS = {
    "baseline": "",
    "vmem64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem32m": "--xla_tpu_scoped_vmem_limit_kib=32768",
    "no_rwb_fusion": "--xla_tpu_enable_reduce_window_batch=false",
}


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    results = {}
    for name, flag in SETTINGS.items():
        env = dict(os.environ)
        if flag:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flag).strip()
        try:
            out = subprocess.run(
                [sys.executable, "-c", BODY], env=env, cwd=os.path.dirname(here),
                capture_output=True, text=True, timeout=900,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("RESULT")]
            results[name] = float(line[0].split()[1]) if line else f"no result (rc {out.returncode}): {out.stderr[-300:]}"
        except subprocess.TimeoutExpired:
            results[name] = "timeout"
        print(f"{name}: {results[name]}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
