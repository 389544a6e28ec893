"""Round-3 probe: attribute the non-NST time in the full IST-2019 pipeline.

probe18 measured the full seg+NST pipeline at 148 images/min/chip with the
NST scan only ~35% of it: build (RITnet seg + mask + crop) 158 ms/img and
the loop's non-NST work (pre/post classify, composite, re-seg, host
metrics) ~108 ms/img.  This probe times each component at the production
shapes so optimization goes where the milliseconds are:

  - RITnet.transform (gamma LUT + CLAHE + normalize) at (8, 400, 640, 1)
  - RITnet.forward f32 vs bf16 at the same shape
  - seg_iou_fn (transform+forward+argmax+IoU) at chunks 8/16/32
  - pre_fn / post_fn at (64, 400, 640, 1) (VGG classify + composite)
  - the host-side sklearn metric block at bs 64
  - device<->host transfer cost of one (8, 400, 640) chunk round trip

Each jitted timing is an N-call average with fresh inputs (device dispatch
included once per call, as the pipeline pays it); per-call tunnel dispatch
is reported separately via a no-op program.

    python tools/perf_probe19.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from iris_style_transfer_tpu.runtime.cache import enable_compile_cache

enable_compile_cache()

REPS = 6


def _sync(out):
    # the tunneled backend's block_until_ready is unreliable (BASELINE.md
    # timing methodology) — force completion with a scalar readback
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(name, fn, *args_list):
    """args_list: one tuple of args per rep (fresh inputs defeat caching)."""
    _sync(fn(*args_list[0]))  # compile + warm
    t0 = time.perf_counter()
    for a in args_list:
        _sync(fn(*a))
    dt = (time.perf_counter() - t0) / len(args_list)
    print(f"{name:42s} {dt * 1e3:8.1f} ms/call", flush=True)
    return dt


def main():
    from iris_style_transfer_tpu.models import Classifier1, Classifier2, RITnet, VGG19
    from iris_style_transfer_tpu.ops.metrics import classification_metrics
    from iris_style_transfer_tpu.workloads.ist_openeds2019 import make_programs

    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    ritnet = RITnet.pretrained()
    vgg = VGG19.init(jax.random.fold_in(key, 1))
    c1 = Classifier1.init(jax.random.fold_in(key, 2), 152)
    c2 = Classifier2.init(jax.random.fold_in(key, 3), num_class=152)

    def frames(n, seed):
        return jax.random.uniform(jax.random.fold_in(key, seed), (n, 400, 640, 1))

    def reps(n):
        return [(frames(n, 100 + i),) for i in range(REPS)]

    # dispatch floor: a trivial program over the tunnel
    noop = jax.jit(lambda x: x + 1.0)
    timeit("dispatch floor (scalar noop)", noop, *[(jnp.float32(i),) for i in range(REPS)])

    # H2D + D2H of one chunk round trip
    host = [np.random.default_rng(i).random((8, 400, 640, 1), np.float32) for i in range(REPS)]
    t0 = time.perf_counter()
    for h in host:
        d = jax.device_put(h)
        jax.block_until_ready(d)
        _ = np.asarray(d)
    print(f"{'H2D+D2H (8,400,640,1) f32 round trip':42s} {(time.perf_counter() - t0) / REPS * 1e3:8.1f} ms/call", flush=True)

    transform = jax.jit(RITnet.transform)
    timeit("RITnet.transform (8,400,640,1)", transform, *reps(8))

    fwd32 = jax.jit(lambda p, x: jnp.argmax(RITnet.forward(p, x), -1))
    timeit("RITnet.forward f32 (8, pre-transformed)", lambda x: fwd32(ritnet, x), *reps(8))

    rit16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), ritnet)
    fwd16 = jax.jit(lambda p, x: jnp.argmax(RITnet.forward(p, x.astype(jnp.bfloat16)), -1))
    timeit("RITnet.forward bf16 (8, pre-transformed)", lambda x: fwd16(rit16, x), *reps(8))

    seg_full = jax.jit(RITnet.apply)
    for n in (8, 16, 32):
        dt = timeit(f"RITnet.apply full ({n},400,640,1) f32", lambda x: seg_full(ritnet, x), *reps(n))
        print(f"{'':42s} = {n / dt:8.1f} img/s", flush=True)

    pre_fn, post_fn, post_seg = make_programs(jnp.bfloat16, seg_chunk=8)
    from iris_style_transfer_tpu.workloads.ist_openeds2019 import fetch_seg_ious
    masks = (frames(64, 7) > 0.5).astype(jnp.float32)
    bboxes = jnp.tile(jnp.array([[100, 100, 228, 228]], jnp.int32), (64, 1))
    sty = jax.random.uniform(jax.random.fold_in(key, 8), (64, 224, 224, 3))
    gt = jnp.zeros((64, 400, 640), jnp.int32)

    timeit("pre_fn (64 frames: mask+crop+VGG+heads)",
           lambda x: pre_fn(vgg, c1, c2, x, masks, bboxes), *reps(64))
    timeit("post_fn (64: composite+crop+VGG+heads)",
           lambda x: post_fn(vgg, c1, c2, x, sty, masks, bboxes), *reps(64))

    for chunk in (8, 16, 32):
        x = frames(64, 9)
        fetch_seg_ious(post_seg(ritnet, x, gt, chunk=chunk))  # compile
        t0 = time.perf_counter()
        for i in range(3):
            # post_seg now only dispatches; fetch_seg_ious is the D2H half
            fetch_seg_ious(post_seg(ritnet, frames(64, 20 + i), gt, chunk=chunk))
        dt = (time.perf_counter() - t0) / 3
        print(f"{f'post_seg 64 frames, chunk={chunk}':42s} {dt * 1e3:8.1f} ms/call", flush=True)

    # host metric block (pure CPU, as the loop runs it: 8 metric calls/batch)
    rng = np.random.default_rng(0)
    lab = rng.integers(0, 152, 64)
    logits = rng.random((64, 152), np.float32)
    t0 = time.perf_counter()
    for _ in range(REPS):
        for _ in range(8):
            classification_metrics(lab, logits, 152, auc_present_only=True)
    print(f"{'host metrics block (8 calls/batch)':42s} {(time.perf_counter() - t0) / REPS * 1e3:8.1f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
