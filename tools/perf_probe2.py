"""In-scan NST perf variants (512px bs4) — reliable multi-step timings.

perf_probe.py's single-call numbers carry ~30ms tunnel dispatch overhead;
this probe times full E-step scans of closure variants to isolate where
the per-step milliseconds go:

  base      current production closure (BN loss, two-pass stats)
  triv      trivial tap-sum loss (upper bound: losses were free)
  onepass   BN stats via one fused pass (sum + sum-of-squares)
  bf16stat  one-pass stats accumulated from bf16 products
  remat     jax.checkpoint around the VGG forward (recompute in bwd)

    python tools/perf_probe2.py [--size 512 --batch 4 --epochs 40]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def scan_time(fn, params, x, s, epochs):
    t0 = time.perf_counter()
    out = fn(params, x, s)
    _ = float(jnp.sum(out[0]))
    return time.perf_counter() - t0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--epochs", type=int, default=40)
    args = p.parse_args()

    from iris_style_transfer_tpu.models import VGG19
    from iris_style_transfer_tpu.ops.losses import content_loss_l2
    from iris_style_transfer_tpu.transfer.lbfgs import lbfgs_init, lbfgs_step

    key = jax.random.PRNGKey(0)
    params = VGG19.init(key)
    shape = (args.batch, args.size, args.size, 3)
    xs = [jax.random.uniform(jax.random.fold_in(key, i), shape) for i in range(8)]
    s = jax.random.uniform(jax.random.fold_in(key, 99), shape)
    jax.block_until_ready((params, xs, s))
    E = args.epochs
    print(f"backend={jax.default_backend()} shape={shape} epochs={E}", flush=True)

    vgg = lambda p_, x: VGG19.apply(p_, x, truncate=True, compute_dtype=jnp.bfloat16)

    def stats_two_pass(f):
        f32 = f.astype(jnp.float32)
        mean = jnp.mean(f32, axis=(-3, -2))
        var = jnp.var(f32, axis=(-3, -2), ddof=1)
        return mean, jnp.sqrt(var)

    def stats_one_pass(f):
        f32 = f.astype(jnp.float32)
        n = f.shape[-3] * f.shape[-2]
        s1 = jnp.sum(f32, axis=(-3, -2))
        s2 = jnp.sum(f32 * f32, axis=(-3, -2))
        mean = s1 / n
        var = jnp.maximum(s2 - n * mean * mean, 0.0) / (n - 1)
        return mean, jnp.sqrt(var)

    def stats_bf16(f):
        n = f.shape[-3] * f.shape[-2]
        s1 = jnp.sum(f, axis=(-3, -2), dtype=jnp.float32)
        s2 = jnp.sum(f * f, axis=(-3, -2), dtype=jnp.float32)
        mean = s1 / n
        var = jnp.maximum(s2 - n * mean * mean, 0.0) / (n - 1)
        return mean, jnp.sqrt(var)

    def bn_loss(x_s, s_t, stats):
        loss = jnp.float32(0.0)
        for p_, (t_mean, t_std) in zip(x_s, s_t):
            m, sd = stats(p_)
            loss = loss + jnp.sum((m - t_mean) ** 2 + (sd - t_std) ** 2) / m.shape[-1]
        return loss

    def make_scan(loss_mode, remat=False):
        def fn(params, c_img, s_img):
            _, c_feats, _ = vgg(params, c_img)
            _, _, s_feats = vgg(params, s_img)
            c_t = [jax.lax.stop_gradient(f) for f in c_feats]
            stats = {"base": stats_two_pass, "onepass": stats_one_pass,
                     "bf16stat": stats_bf16}.get(loss_mode, stats_two_pass)
            s_t = [tuple(map(jax.lax.stop_gradient, stats(f))) for f in s_feats]

            def loss_fn(x):
                _, x_c, x_s = vgg(params, x)
                if loss_mode == "triv":
                    return sum(jnp.sum(t.astype(jnp.float32)) for t in x_c + x_s)
                return content_loss_l2(x_c, c_t) + bn_loss(x_s, s_t, stats)

            if remat:
                loss_fn = jax.checkpoint(loss_fn)
            grad_fn = jax.value_and_grad(loss_fn)

            n = c_img.size
            opt0 = lbfgs_init(n, 10)

            def step(carry, i):
                x, opt = carry
                x = jnp.clip(x, 0.0, 1.0)
                loss, g = grad_fn(x)
                upd, opt = lbfgs_step(opt, g.reshape(-1), 1.0, method="compact")
                return (x + upd.reshape(x.shape), opt), loss

            (x, _), hist = jax.lax.scan(step, (c_img, opt0), jnp.arange(E), unroll=4)
            return jnp.clip(x, 0.0, 1.0), hist

        return jax.jit(fn)

    for label, mode, remat in (
        ("base", "base", False),
        ("triv", "triv", False),
        ("onepass", "onepass", False),
        ("bf16stat", "bf16stat", False),
        ("remat", "base", True),
        ("onepass+remat", "onepass", True),
    ):
        fn = make_scan(mode, remat)
        scan_time(fn, params, xs[0], s, E)  # compile + warmup
        t = min(scan_time(fn, params, x, s, E) for x in xs[1:4])
        print(f"{label}: {E/t:.2f} steps/s  ({t*1e3/E:.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
