"""The one parameterized measurement harness for perf probes.

Round-4 VERDICT next-step #7: the 26 numbered ``tools/perf_probe*.py``
files each re-implement the same timing loop, interleaved A/B scheme and
arg parsing.  They stay in the tree as the historical record of their
recorded verdicts; every NEW measurement goes through this module:

    # A/B module flags on the NST closure at the two serving configs
    python tools/probe.py nst --variant base --variant paired:ops=POOL_PAIRED=1
    python tools/probe.py nst --shapes 64x224 --epochs 48 --reps 3

    # delegate to the two heavyweight harnesses with their own CLIs
    python tools/probe.py trace -- --batch 64 --size 224     # perf_probe9
    python tools/probe.py pipeline -- --n 256 --bs 64        # perf_probe18

Methodology (the rules every numbered probe converged on, BASELINE.md):

* fresh inputs per rep — defeats any cross-call caching;
* readback via ``float(jnp.sum(...))`` — the tunneled axon backend's
  ``block_until_ready`` is unreliable for timing;
* min of N reps — the tunnel adds tail noise, never negative noise;
* variants run INTERLEAVED (A/B/A/B per shape) so clock drift and
  thermal state hit both arms equally;
* every variant also reports its final ``s_loss`` so numeric drift is
  caught in the same run that measures speed.

A variant is ``name[:FLAG=V,FLAG=V...][@kw=v,...]`` where FLAG names a
module attribute in ``iris_style_transfer_tpu.models.layers`` (the probe
flags all live there) and ``kw`` is a ``make_nst_fn`` keyword (python
literals).  Example:

    --variant fused:FUSE_RELU_POOL=1
    --variant stats@stats_taps=True
"""

from __future__ import annotations

import argparse
import ast
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _lazy_imports():
    import jax
    import jax.numpy as jnp

    from iris_style_transfer_tpu.runtime.cache import enable_compile_cache

    enable_compile_cache()
    return jax, jnp


def parse_variant(spec: str):
    """``name[:FLAG=V,...][@kw=v,...]`` -> (name, {flag: val}, {kw: val})."""
    kw = {}
    if "@" in spec:
        spec, kwpart = spec.split("@", 1)
        for item in kwpart.split(","):
            k, v = item.split("=", 1)
            kw[k] = ast.literal_eval(v)
    flags = {}
    if ":" in spec:
        spec, flagpart = spec.split(":", 1)
        for item in flagpart.split(","):
            k, v = item.split("=", 1)
            flags[k] = ast.literal_eval(v)
    return spec, flags, kw


def time_nst(fn, params, c, s, jnp, epochs):
    """One timed rep: dispatch + sum-readback; returns (steps/s, s_loss)."""
    t0 = time.perf_counter()
    out = fn(params, c, s)
    _ = float(jnp.sum(out.x))
    return epochs / (time.perf_counter() - t0), float(out.s_loss_hist[-1])


def run_nst_ab(args) -> dict:
    jax, jnp = _lazy_imports()
    from iris_style_transfer_tpu.models import VGG19
    from iris_style_transfer_tpu.models import layers as L
    from iris_style_transfer_tpu.transfer.nst import make_nst_fn

    E = args.epochs
    key = jax.random.PRNGKey(0)
    params = VGG19.init(key)
    variants = [parse_variant(v) for v in (args.variant or ["base"])]

    base_kw = dict(
        epochs=E,
        compute_dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        history_size=10,
        scan_unroll=args.unroll,
        lbfgs_dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
    )

    shapes = []
    for s in args.shapes.split(","):
        b, hw = s.split("x")
        shapes.append((int(b), int(hw), int(hw), 3))

    results: dict = {}
    for shape in shapes:
        label = f"{shape[0]}x{shape[1]}"
        cs = [
            jax.random.uniform(jax.random.fold_in(key, 10 + i), shape)
            for i in range(args.reps + 1)
        ]
        sty = jax.random.uniform(jax.random.fold_in(key, 2), shape)
        jax.block_until_ready((cs, sty))

        # build + compile/warm up every variant first, then interleave reps
        fns, saved = {}, {}
        for name, flags, kw in variants:
            for f, v in flags.items():
                saved.setdefault(f, getattr(L, f))
                setattr(L, f, v)
            fns[name] = jax.jit(make_nst_fn(**{**base_kw, **kw}))
            time_nst(fns[name], params, cs[0], sty, jnp, E)  # compile+warm
            for f in flags:
                setattr(L, f, saved[f])

        per = {name: [] for name, _, _ in variants}
        losses = {}
        for i in range(args.reps):
            for name, flags, kw in variants:
                for f, v in flags.items():
                    setattr(L, f, v)
                sps, sl = time_nst(fns[name], params, cs[1 + i], sty, jnp, E)
                for f in flags:
                    setattr(L, f, saved[f])
                per[name].append(sps)
                losses[name] = sl
        row = {}
        for name, _, _ in variants:
            best = max(per[name])
            row[name] = (best, losses[name])
            print(
                f"{label:12s} {name:16s} {best:7.2f} steps/s"
                f" (s_loss {losses[name]:.6g})",
                flush=True,
            )
        base_name = variants[0][0]
        for name, _, _ in variants[1:]:
            print(
                f"{label:12s} {name}/{base_name} ="
                f" {row[name][0] / row[base_name][0]:.3f}x",
                flush=True,
            )
        results[label] = row
    return results


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("nst", help="A/B variants of the jitted NST closure")
    p.add_argument("--shapes", default="64x224,4x512",
                   help="comma list of BxSIZE configs (default: both serving configs)")
    p.add_argument("--epochs", type=int, default=48)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--unroll", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--variant", action="append",
                   help="name[:FLAG=V,...][@nstkw=v,...]; first is the baseline")

    for name, mod in (("trace", "perf_probe9"), ("pipeline", "perf_probe18"),
                      ("pipeline2020", "perf_probe23")):
        d = sub.add_parser(name, help=f"delegate to tools/{mod}.py (args after --)")
        d.add_argument("rest", nargs=argparse.REMAINDER)
        d.set_defaults(delegate=mod)

    args = ap.parse_args()
    if args.cmd == "nst":
        run_nst_ab(args)
    else:
        import importlib

        sys.argv = [args.delegate] + [a for a in args.rest if a != "--"]
        importlib.import_module(args.delegate).main()


if __name__ == "__main__":
    main()
