"""Backward-chain probe: residual dtype of the non-overlapping maxpool VJP.

With frozen VGG weights the data-grad backward needs *no* conv inputs —
the only per-layer residuals are relu sign masks and pool argmax
selections.  Variants of the 2x2 pool VJP, timed on the full production
NST scan (512px bs4, bf16, compact L-BFGS, unroll 8), **interleaved** in
one process so the tunneled backend's run-to-run drift can't masquerade
as a win:

  stock     jnp.max reshape VJP (stores the bf16 input, 2 B/elt)
  wired     layers.max_pool custom VJP (bool mask 1 B/elt + uint8 tie
            count at output size; even tie split — jnp.max semantics)
  nodiv     bool mask only, full ct to every tie (cheapest; tie semantics
            differ from jnp.max but all-zero ties die at the upstream
            relu mask anyway)

    python tools/perf_probe5.py [--size 512 --batch 4 --epochs 40 --reps 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


@jax.custom_vjp
def maxpool2_nodiv(x):
    b, h, w, c = x.shape
    return jnp.max(x.reshape(b, h // 2, 2, w // 2, 2, c), axis=(2, 4))


def _nodiv_fwd(x):
    b, h, w, c = x.shape
    xr = x.reshape(b, h // 2, 2, w // 2, 2, c)
    y = jnp.max(xr, axis=(2, 4))
    return y, (xr == y[:, :, None, :, None, :], (b, h, w, c))


def _nodiv_bwd(res, ct):
    mask, (b, h, w, c) = res
    g = jnp.where(mask, ct[:, :, None, :, None, :], jnp.zeros((), ct.dtype))
    return (g.reshape(b, h, w, c),)


maxpool2_nodiv.defvjp(_nodiv_fwd, _nodiv_bwd)


@jax.custom_vjp
def maxpool2_argmax(x):
    b, h, w, c = x.shape
    return jnp.max(x.reshape(b, h // 2, 2, w // 2, 2, c), axis=(2, 4))


def _argmax_fwd(x):
    b, h, w, c = x.shape
    xr = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 5, 2, 4)
    xr = xr.reshape(b, h // 2, w // 2, c, 4)
    y = jnp.max(xr, axis=-1)
    idx = jnp.argmax(xr, axis=-1).astype(jnp.uint8)
    return y, (idx, (b, h, w, c))


def _argmax_bwd(res, ct):
    idx, (b, h, w, c) = res
    sel = idx[..., None] == jnp.arange(4, dtype=jnp.uint8)
    g = jnp.where(sel, ct[..., None], jnp.zeros((), ct.dtype))
    g = g.reshape(b, h // 2, w // 2, c, 2, 2).transpose(0, 1, 4, 2, 5, 3)
    return (g.reshape(b, h, w, c),)


maxpool2_argmax.defvjp(_argmax_fwd, _argmax_bwd)


def stock_max_pool(x, window=2, stride=None):
    stride = stride or window
    b, h, w, c = x.shape
    xr = x.reshape(b, h // window, window, w // window, window, c)
    return jnp.max(xr, axis=(2, 4))


def scan_time(fn, params, x, s):
    t0 = time.perf_counter()
    out = fn(params, x, s)
    _ = float(jnp.sum(out.x[:, ::64, ::64, :]))
    return time.perf_counter() - t0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--reps", type=int, default=4)
    args = p.parse_args()

    import iris_style_transfer_tpu.models.layers as L
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

    wired_pool = L.max_pool

    def nodiv_pool(x, window=2, stride=None):
        stride = stride or window
        if window == 2 and stride == 2 and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            return maxpool2_nodiv(x)
        return stock_max_pool(x, window, stride)

    def argmax_pool(x, window=2, stride=None):
        stride = stride or window
        if window == 2 and stride == 2 and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            return maxpool2_argmax(x)
        return stock_max_pool(x, window, stride)

    fns = {}
    for label, pool_impl in (
        ("stock", stock_max_pool),
        ("wired", wired_pool),
        ("nodiv", nodiv_pool),
        ("argmax", argmax_pool),
    ):
        L.max_pool = pool_impl
        try:
            fns[label] = jax.jit(
                make_nst_fn(
                    epochs=E,
                    compute_dtype=jnp.bfloat16,
                    history_size=10,
                    scan_unroll=8,
                    lbfgs_dtype=jnp.bfloat16,
                )
            )
            scan_time(fns[label], params, xs[0], s)  # compile + warmup
        finally:
            L.max_pool = wired_pool

    times = {k: [] for k in fns}
    for r in range(args.reps):
        for label, fn in fns.items():
            times[label].append(scan_time(fn, params, xs[1 + r % 6], s))
    for label, ts in times.items():
        t = min(ts)
        print(f"{label}: {E/t:.2f} steps/s  ({t*1e3/E:.2f} ms/step)  "
              f"all={[round(E/x, 2) for x in ts]}", flush=True)


if __name__ == "__main__":
    main()
