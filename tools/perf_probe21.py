"""Round-3 probe: attribute RITnet.transform's 148 ms/8-frame cost
(probe19) across its stages — gamma LUT, CLAHE histogram, CLAHE LUT
apply — and A/B the sort-based tile histogram against a compare-reduce
form (no sort, no searchsorted: one fused broadcast-compare reduction).

    python tools/perf_probe21.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import importlib

# `ops.__init__` re-exports the clahe *function*, shadowing the submodule
# attribute that `import ... as` resolves — go through importlib
clahe_mod = importlib.import_module("iris_style_transfer_tpu.ops.clahe")
from iris_style_transfer_tpu.runtime.cache import enable_compile_cache


enable_compile_cache()

REPS = 6


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(name, fn, *args_list):
    _sync(fn(*args_list[0]))
    t0 = time.perf_counter()
    for a in args_list:
        _sync(fn(*a))
    dt = (time.perf_counter() - t0) / len(args_list)
    print(f"{name:46s} {dt * 1e3:8.1f} ms/call", flush=True)
    return dt


def hist_compare_reduce(img_u8, grid):
    """(H, W) u8 -> (gh*gw, 256) f32 via one fused compare+reduce."""
    h, w = img_u8.shape
    gh, gw = grid
    th, tw = h // gh, w // gw
    tiles = (
        img_u8.reshape(gh, th, gw, tw).transpose(0, 2, 1, 3).reshape(gh * gw, th * tw)
    ).astype(jnp.int32)
    bins = jnp.arange(256, dtype=jnp.int32)
    return jnp.sum(
        (tiles[:, None, :] == bins[None, :, None]).astype(jnp.float32), axis=-1
    )


def main():
    from iris_style_transfer_tpu.models.ritnet import RITnet
    from iris_style_transfer_tpu.ops.image import gamma_lut

    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)

    def frames(seed):
        return jax.random.uniform(jax.random.fold_in(key, seed), (8, 400, 640, 1))

    reps = [(frames(100 + i),) for i in range(REPS)]

    timeit("RITnet.transform (8,400,640,1)", jax.jit(RITnet.transform), *reps)
    timeit("gamma_lut", jax.jit(jax.vmap(lambda x: gamma_lut(x))), *reps)
    timeit("clahe full", jax.jit(jax.vmap(lambda x: clahe_mod.clahe(x[..., 0]))), *reps)

    def hist_sort(x):
        u8 = jnp.round(jnp.clip(x[..., 0], 0, 1) * 255).astype(jnp.uint8)
        return clahe_mod._tile_histograms(u8, (8, 8))

    def hist_cmp(x):
        u8 = jnp.round(jnp.clip(x[..., 0], 0, 1) * 255).astype(jnp.uint8)
        return hist_compare_reduce(u8, (8, 8))

    timeit("tile hist (sort+searchsorted)", jax.jit(jax.vmap(hist_sort)), *reps)
    timeit("tile hist (compare-reduce)", jax.jit(jax.vmap(hist_cmp)), *reps)

    # numerical: identical histograms
    a = jax.jit(jax.vmap(hist_sort))(reps[0][0])
    b = jax.jit(jax.vmap(hist_cmp))(reps[0][0])
    print("hist max|diff|:", float(jnp.max(jnp.abs(a - b))), flush=True)

    # LUT-apply-only: fix hists, time the interpolation+gather block by
    # running clahe on a constant image but pre-supplied LUTs is invasive;
    # instead time clahe minus hist as (full - hist) offline.
    # normalize stage for completeness:
    timeit("normalize (x-.5)/.5", jax.jit(lambda x: (x - 0.5) / 0.5), *reps)


if __name__ == "__main__":
    main()
