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


def categorize(name):
    n = name.lower()
    if "convolution" in n or "conv" in n:
        # XLA HLO names: %convolution.N / fusions wrapping them keep 'conv'
        return "conv"
    if "reduce-window" in n or "reduce_window" in n or "select-and-scatter" in n:
        return "pool"
    if "all-reduce" in n or "collective" in n:
        return "collective"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "copy/layout"
    if "fusion" in n or "loop" in n:
        return "fusion(elementwise)"
    if "dot" in n:
        return "dot"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/nst_trace")
    ap.add_argument("--epochs", type=int, default=48)
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from iris_style_transfer_tpu.models import VGG19
    from iris_style_transfer_tpu.transfer.nst import make_nst_fn

    key = jax.random.PRNGKey(0)
    params = VGG19.init(key)
    shape = (4, 512, 512, 3)
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

    dev_planes = [p for p in space.planes if "TPU" in p.name or "/device" in p.name.lower()]
    if not dev_planes:
        print("DEAD END: no device plane in trace — host-side timeline only; "
              "op-level attribution unavailable through the tunnel")
        return

    for plane in dev_planes:
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        by_name = collections.Counter()
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                by_name[name] += ev.duration_ps / 1e12
        total = sum(by_name.values())
        print(f"\n== plane {plane.name}: {total:.4f} s device-op time ==")
        cats = collections.Counter()
        for name, t in by_name.items():
            cats[categorize(name)] += t
        for cat, t in cats.most_common():
            print(f"  {cat:<22} {t:.4f} s  {100 * t / max(total, 1e-12):.1f}%")
        print(f"  -- top {args.top} ops --")
        for name, t in by_name.most_common(args.top):
            print(f"  {t:.4f} s  {name[:110]}")


if __name__ == "__main__":
    main()
