"""Round-3 probe: op-level profile of the NST closure on the real chip.

Every earlier probe (3-8) bisected the closure by rebuilding it with parts
removed; this one asks the hardware directly: capture a ``jax.profiler``
trace of one steady-state bench-config call (E=48, 512px bs4, the wired
unroll-8 scan) and aggregate device-plane op self-times from the xplane
proto (tensorboard-plugin-profile is in the image).  Output: top ops by
self-time + category rollup (conv fwd / conv bwd input / fusion /
reduce-window / copy / all-else), so the "remaining gap is XLA
scheduling" claim in BASELINE.md gets numbers or gets falsified.

If the tunneled axon backend emits no device plane (remote profiling
unsupported), that is recorded as a dead end like tools/perf_probe8.py.

    python tools/perf_probe9.py [--trace-dir /tmp/nst_trace]
"""

import argparse
import collections
import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_xspace(path):
    last = None
    for mod in (
        "tensorflow.tsl.profiler.protobuf.xplane_pb2",
        "tensorflow.core.profiler.protobuf.xplane_pb2",
        "tsl.profiler.protobuf.xplane_pb2",
        "tensorboard_plugin_profile.protobuf.xplane_pb2",
    ):
        try:
            import importlib

            xplane_pb2 = importlib.import_module(mod)
            break
        except ImportError as e:  # pragma: no cover - env dependent
            last = e
    else:  # pragma: no cover
        raise SystemExit(f"no xplane proto module available: {last}")
    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    return space


import re

_SIG_RE = re.compile(r"^%?([a-zA-Z][\w.\-]*) = (\S+?) ([\w\-]+)\(")


def signature(name):
    """(opcode-ish, output-shape) signature parsed from the HLO text.

    Categorizing on the FULL op string is wrong — fusion ops quote their
    operands, so a fusion consuming a ``%copy-done`` would be counted as a
    copy.  Parse ``%name = shape opcode(...)`` instead and keep the
    distinctive fusion-kind prefix XLA bakes into names like
    ``%broadcast_maximum_fusion.70``.
    """
    m = _SIG_RE.match(name)
    if not m:
        return name[:60]
    opname, shape, opcode = m.groups()
    shape = re.sub(r"\{[^}]*\}", "", shape)
    pre = opname.split(".")[0]
    if opcode == "fusion" and pre != "fusion":
        return f"fusion:{pre} {shape}"
    return f"{opcode} {shape}"


def self_times(plane, ev_meta):
    """Per-op-name self time from the (nested) XLA Ops timeline.

    Events nest — the whole-scan ``while`` wraps every op in its body, so
    flat aggregation double-counts.  Stack-walk the interval tree and
    attribute each event its duration minus its direct children's.
    """
    import collections

    line = [l for l in plane.lines if l.name == "XLA Ops"]
    if not line:
        return collections.Counter()
    evs = sorted(line[0].events, key=lambda e: (e.offset_ps, -e.duration_ps))
    self_t = collections.Counter()
    stack, starts = [], []

    def pop_to(t):
        while stack and stack[-1][0] <= t:
            end, name, child = stack.pop()
            dur = end - starts.pop()
            self_t[name] += (dur - child) / 1e12
            if stack:
                stack[-1][2] += dur

    for e in evs:
        name = ev_meta.get(e.metadata_id, str(e.metadata_id))
        pop_to(e.offset_ps)
        stack.append([e.offset_ps + e.duration_ps, name, 0])
        starts.append(e.offset_ps)
    pop_to(float("inf"))
    return self_t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/nst_trace")
    ap.add_argument("--epochs", type=int, default=48)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=512,
                    help="square image size; --batch 64 --size 224 traces "
                         "the production IST config instead of the bench one")
    ap.add_argument("--flag", action="append", default=[],
                    help="layers-module flag override NAME=V (python "
                         "literal), e.g. --flag POOL_PAIRED_PALLAS=True — "
                         "same spec as tools/probe.py variants")
    args = ap.parse_args()

    import ast

    import jax
    import jax.numpy as jnp

    from iris_style_transfer_tpu.models import VGG19
    from iris_style_transfer_tpu.models import layers as L
    from iris_style_transfer_tpu.transfer.nst import make_nst_fn

    for spec in args.flag:
        k, v = spec.split("=", 1)
        assert hasattr(L, k), f"unknown layers flag {k}"
        setattr(L, k, ast.literal_eval(v))

    key = jax.random.PRNGKey(0)
    params = VGG19.init(key)
    shape = (args.batch, args.size, args.size, 3)
    c = jax.random.uniform(jax.random.fold_in(key, 1), shape)
    c2 = jax.random.uniform(jax.random.fold_in(key, 2), shape)
    s = jax.random.uniform(jax.random.fold_in(key, 3), shape)
    jax.block_until_ready((params, c, c2, s))

    fn = jax.jit(
        make_nst_fn(
            epochs=args.epochs,
            compute_dtype=jnp.bfloat16,
            history_size=10,
            scan_unroll=8,
            lbfgs_dtype=jnp.bfloat16,
        )
    )
    # compile + warmup outside the trace
    _ = float(jnp.sum(fn(params, c, s).x))

    t0 = time.perf_counter()
    try:
        with jax.profiler.trace(args.trace_dir):
            out = fn(params, c2, s)
            _ = float(jnp.sum(out.x))
    except Exception as e:  # pragma: no cover - backend dependent
        print(f"DEAD END: jax.profiler.trace failed on this backend: {type(e).__name__}: {e}")
        return
    wall = time.perf_counter() - t0
    print(f"traced call: {wall:.3f} s wall ({args.epochs} closures)")

    pbs = sorted(
        glob.glob(os.path.join(args.trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not pbs:
        print("DEAD END: no .xplane.pb emitted (remote axon backend traces host only?)")
        return
    space = load_xspace(pbs[-1])
    print("planes:", [p.name for p in space.planes])

    dev_planes = [p for p in space.planes if p.name.startswith("/device:")]
    if not dev_planes:
        print("DEAD END: no device plane in trace — host-side timeline only; "
              "op-level attribution unavailable through the tunnel")
        return

    for plane in dev_planes:
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        self_t = self_times(plane, ev_meta)
        if not self_t:
            continue
        total = sum(self_t.values())
        print(f"\n== plane {plane.name}: {total * 1000:.1f} ms self-time "
              f"over {args.epochs} closures = "
              f"{total / args.epochs * 1000:.2f} ms/closure ==")
        groups = collections.Counter()
        counts = collections.Counter()
        for name, t in self_t.items():
            sig = signature(name)
            groups[sig] += t
            counts[sig] += 1
        print(f"{'ms/closure':>10} {'%':>5} {'n':>4}  group")
        for sig, t in groups.most_common(args.top):
            print(f"{t / args.epochs * 1000:10.3f} {100 * t / total:5.1f} "
                  f"{counts[sig]:4d}  {sig[:100]}")


if __name__ == "__main__":
    main()
