"""Round-3 probe: fix the two hot spots perf_probe9's trace exposed.

The op-level trace of the 512px bs4 closure (28.9 ms) attributed:
  * 6.36 ms (22%) to the conv1_1 INPUT gradient — XLA lowers the C_in=3
    transposed conv to a VPU loop fusion (N=3 lanes would waste 125/128
    of the MXU);
  * ~5.3 ms (18%) to `copy`/`reshape` churn between the tiled image
    layout and the linear flat (N,) layout the L-BFGS state lived in.

Fix A: `layers._conv_small_cin` — custom VJP computing dx as one MXU
matmul (N = 9*C_in = 27 lanes) + 9 shifted adds.
Fix B: shape-native L-BFGS — history buffers (m, B, H, W, 3), dots via
dot_general over the image axes, no flatten anywhere.

This probe measures the 2x2 grid {xla-dx, mxu-dx} x {flat, nd} at the
bench config (E=48, 512px bs4, bf16, unroll 8), interleaved, min of 3,
and checks the final s_loss agrees across all variants.

    python tools/perf_probe10.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from iris_style_transfer_tpu.runtime.cache import enable_compile_cache

enable_compile_cache()  # 4 variant compiles cost minutes each


def main():
    from iris_style_transfer_tpu.models import VGG19
    from iris_style_transfer_tpu.models import layers as L
    from iris_style_transfer_tpu.transfer.nst import make_nst_fn

    E = 48
    key = jax.random.PRNGKey(0)
    params = VGG19.init(key)
    shape = (4, 512, 512, 3)
    cs = [jax.random.uniform(jax.random.fold_in(key, 10 + i), shape) for i in range(4)]
    s = jax.random.uniform(jax.random.fold_in(key, 2), shape)
    jax.block_until_ready((params, cs, s))

    kw = dict(
        epochs=E,
        compute_dtype=jnp.bfloat16,
        history_size=10,
        scan_unroll=8,
        lbfgs_dtype=jnp.bfloat16,
    )

    variants = [
        ("base (xla-dx, flat)", False, True),
        ("A: mxu-dx, flat", True, True),
        ("B: xla-dx, nd", False, False),
        ("A+B: mxu-dx, nd", True, False),
    ]

    fns = {}
    losses = {}
    for name, mxu, flat in variants:
        L.USE_MXU_DX = mxu  # trace-time flag
        fn = jax.jit(make_nst_fn(lbfgs_flat=flat, **kw))
        res = fn(params, cs[0], s)  # compile + warmup
        losses[name] = float(res.s_loss_hist[-1])
        fns[name] = fn
        print(f"compiled {name}: s_loss={losses[name]:.6f}", flush=True)

    times = {name: [] for name, *_ in variants}
    for rep in range(3):
        for name, mxu, flat in variants:
            c = cs[1 + rep]
            t0 = time.perf_counter()
            out = fns[name](params, c, s)
            _ = float(jnp.sum(out.x[:, ::64, ::64, :]))
            times[name].append(time.perf_counter() - t0)

    print()
    for name, *_ in variants:
        t = min(times[name])
        print(f"{name:<22} {E / t:7.2f} steps/s  (min of {len(times[name])}: "
              f"{', '.join(f'{x:.3f}' for x in times[name])})  s_loss={losses[name]:.6f}")


if __name__ == "__main__":
    main()
