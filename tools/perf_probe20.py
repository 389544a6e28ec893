"""Round-3 probe: separable-matmul resize vs 4-tap gather in the IST
pre/post classification programs.

probe19 attributed the non-NST loop cost: post_fn (composite + crop +
VGG + heads) at 1224 ms per 64 frames vs pre_fn's 286 ms — the delta is
``composite_batch``'s full-frame (400, 640) bilinear gather from the
224^2 patch per image.  Both ``crop_and_resize`` and ``paste_resized``
have axis-aligned sample grids, so the bilinear interpolation is
separable: two 2-tap weight matrices make each resample a pair of
batched matmuls on the MXU instead of an XLA element gather
(``ops/image.py:_separable_resample``).  This probe A/Bs the flag at the
production shapes.

    python tools/perf_probe20.py
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
    _sync(fn(*args_list[0]))  # compile + warm
    t0 = time.perf_counter()
    for a in args_list:
        _sync(fn(*a))
    dt = (time.perf_counter() - t0) / len(args_list)
    print(f"{name:46s} {dt * 1e3:8.1f} ms/call", flush=True)
    return dt


def main():
    from iris_style_transfer_tpu.models import Classifier1, Classifier2, VGG19
    from iris_style_transfer_tpu.ops import image as image_mod
    from iris_style_transfer_tpu.workloads import ist_openeds2019 as w19

    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    vgg = VGG19.init(jax.random.fold_in(key, 1))
    c1 = Classifier1.init(jax.random.fold_in(key, 2), 152)
    c2 = Classifier2.init(jax.random.fold_in(key, 3), num_class=152)

    def frames(n, seed):
        return jax.random.uniform(jax.random.fold_in(key, seed), (n, 400, 640, 1))

    masks = (frames(64, 7) > 0.5).astype(jnp.float32)
    bboxes = jnp.tile(jnp.array([[100, 100, 228, 228]], jnp.int32), (64, 1))
    sty = jax.random.uniform(jax.random.fold_in(key, 8), (64, 224, 224, 3))

    results = {}
    for flag in (False, True):
        image_mod.MATMUL_RESIZE = flag
        tag = "matmul" if flag else "gather"
        pre_fn, post_fn, _ = w19.make_programs(jnp.bfloat16, seg_chunk=8)
        reps = [(frames(64, 100 + i),) for i in range(REPS)]
        results[f"pre/{tag}"] = timeit(
            f"pre_fn 64 [{tag}]", lambda x: pre_fn(vgg, c1, c2, x, masks, bboxes), *reps
        )
        results[f"post/{tag}"] = timeit(
            f"post_fn 64 [{tag}]", lambda x: post_fn(vgg, c1, c2, x, sty, masks, bboxes), *reps
        )
        # numerical check: same logits between paths on one batch
        results[f"out/{tag}"] = np.asarray(
            post_fn(vgg, c1, c2, frames(64, 999), sty, masks, bboxes)[1], np.float32
        )
    image_mod.MATMUL_RESIZE = True

    diff = np.abs(results["out/matmul"] - results["out/gather"]).max()
    print(f"max |logit diff| matmul vs gather: {diff:.2e}", flush=True)
    print(
        f"speedup pre {results['pre/gather'] / results['pre/matmul']:.2f}x, "
        f"post {results['post/gather'] / results['post/matmul']:.2f}x",
        flush=True,
    )


if __name__ == "__main__":
    main()
