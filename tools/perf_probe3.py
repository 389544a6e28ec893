"""Component scans for the NST closure (512px bs4): where do the ~34 ms go?

Scan-timed stages (all with unroll=4, E steps, trivial x update so the
loop carries a data dependency without optimizer cost):

  fwd        VGG forward only (truncated taps, sum)
  fwdbwd     + gradient w.r.t. x (sgd-like update, no L-BFGS)
  +lbfgs     + compact L-BFGS direction (the production optimizer)
  +loss      full production closure (BN loss two-pass stats)

Theoretical floor: fwd ~0.58 TFLOP / step (4 imgs), bwd-to-dx ~1x fwd
(weights frozen -> no weight-grad convs), so fwdbwd ~1.17 TFLOP/step.

    python tools/perf_probe3.py [--size 512 --batch 4 --epochs 40]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def scan_time(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    return time.perf_counter() - t0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--epochs", type=int, default=40)
    args = p.parse_args()

    from iris_style_transfer_tpu.models import VGG19
    from iris_style_transfer_tpu.ops.losses import content_loss_l2, style_loss_bn, style_stats
    from iris_style_transfer_tpu.transfer.lbfgs import lbfgs_init, lbfgs_step

    key = jax.random.PRNGKey(0)
    params = VGG19.init(key)
    shape = (args.batch, args.size, args.size, 3)
    xs = [jax.random.uniform(jax.random.fold_in(key, i), shape) for i in range(8)]
    s = jax.random.uniform(jax.random.fold_in(key, 99), shape)
    jax.block_until_ready((params, xs, s))
    E = args.epochs
    print(f"backend={jax.default_backend()} shape={shape} epochs={E} "
          f"xla_flags={os.environ.get('XLA_FLAGS','')!r}", flush=True)

    vgg = lambda p_, x: VGG19.apply(p_, x, truncate=True, compute_dtype=jnp.bfloat16)

    @jax.jit
    def fwd_scan(params, x0):
        def step(x, _):
            _, c, st = vgg(params, x)
            l = sum(jnp.sum(t.astype(jnp.float32)) for t in c + st)
            return x + 1e-9 * l, l

        return jax.lax.scan(step, x0, jnp.arange(E), unroll=4)

    @jax.jit
    def fwdbwd_scan(params, x0):
        def loss(x):
            _, c, st = vgg(params, x)
            return sum(jnp.sum(t.astype(jnp.float32)) for t in c + st)

        def step(x, _):
            l, g = jax.value_and_grad(loss)(x)
            return x - 1e-9 * g, l

        return jax.lax.scan(step, x0, jnp.arange(E), unroll=4)

    @jax.jit
    def lbfgs_scan(params, x0):
        def loss(x):
            _, c, st = vgg(params, x)
            return sum(jnp.sum(t.astype(jnp.float32)) for t in c + st)

        opt0 = lbfgs_init(x0.size, 10)

        def step(carry, _):
            x, opt = carry
            l, g = jax.value_and_grad(loss)(x)
            upd, opt = lbfgs_step(opt, g.reshape(-1), 1.0, method="compact")
            return (x + 1e-3 * upd.reshape(x.shape), opt), l

        return jax.lax.scan(step, (x0, opt0), jnp.arange(E), unroll=4)

    @jax.jit
    def full_scan(params, x0, s_img):
        _, c_feats, _ = vgg(params, x0)
        _, _, s_feats = vgg(params, s_img)
        c_t = [jax.lax.stop_gradient(f) for f in c_feats]
        s_t = [tuple(map(jax.lax.stop_gradient, style_stats(f))) for f in s_feats]

        def loss(x):
            _, xc, xst = vgg(params, x)
            return content_loss_l2(xc, c_t) + style_loss_bn(xst, s_t)

        opt0 = lbfgs_init(x0.size, 10)

        def step(carry, _):
            x, opt = carry
            x = jnp.clip(x, 0.0, 1.0)
            l, g = jax.value_and_grad(loss)(x)
            upd, opt = lbfgs_step(opt, g.reshape(-1), 1.0, method="compact")
            return (x + upd.reshape(x.shape), opt), l

        return jax.lax.scan(step, (x0, opt0), jnp.arange(E), unroll=4)

    runs = (
        ("fwd", lambda x: fwd_scan(params, x)),
        ("fwdbwd", lambda x: fwdbwd_scan(params, x)),
        ("+lbfgs", lambda x: lbfgs_scan(params, x)),
        ("+loss(full)", lambda x: full_scan(params, x, s)),
    )
    for label, call in runs:
        scan_time(call, xs[0])  # compile + warmup
        t = min(scan_time(call, x) for x in xs[1:4])
        print(f"{label}: {E/t:.2f} steps/s  ({t*1e3/E:.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
