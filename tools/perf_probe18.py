"""Round-3 probe: FULL IST-2019 pipeline throughput (the second headline).

BASELINE.json's second metric is "stylized images/min, full seg+NST
pipeline" at the reference config (OpenEDS2019 test split, bs 64, 200
L-BFGS closure evals per batch — ``iris_style_transfer_openeds2019.py``).
bench.py's secondary measures the NST inner loop alone; this probe runs
the WHOLE per-image pipeline the workload runs, in two stages matching
the architecture:

  1. dataset build (``data/openeds2019.py:build_ist_dataset``): RITnet
     400x640 seg -> pre-NST IoUs -> iris mask + bbox -> 224px crop,
     chunked through one jitted program;
  2. the batch loop (``workloads/ist_openeds2019.py``): classify ->
     joint-batch NST scan -> composite -> classify -> re-seg IoU,
     plus all host-side metric work.

Reports each stage and the combined per-image rate:

    full_ipm = 60 / (t_build/N + 60/pipeline_images_per_min)

Uses synthetic eyes (no egress) at the reference shapes: N images of
(400, 640), bs 64, 200 NST epochs, 152-class heads, bfloat16.

    python tools/perf_probe18.py [--n 256] [--nst_epochs 200]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from iris_style_transfer_tpu.runtime.cache import enable_compile_cache

enable_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256, help="test images (multiple of bs)")
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--nst_epochs", type=int, default=200)
    ap.add_argument("--num_class", type=int, default=152)
    args = ap.parse_args()

    import jax.numpy as jnp

    from iris_style_transfer_tpu.data import build_ist_dataset
    from iris_style_transfer_tpu.data.synthetic import synthetic_eye_batch
    from iris_style_transfer_tpu.models import Classifier1, Classifier2, RITnet, VGG19
    from iris_style_transfer_tpu.parallel import make_mesh, shard_params
    from iris_style_transfer_tpu.runtime import MetricLogger
    from iris_style_transfer_tpu.runtime.config import WorkloadConfig
    from iris_style_transfer_tpu.utils import prepare_dir
    from iris_style_transfer_tpu.workloads.ist_openeds2019 import (
        iris_style_transfer_openeds2019,
        make_programs,
    )

    print("backend:", jax.default_backend(), flush=True)
    cfg = WorkloadConfig(project="probe18", bs=args.bs)

    imgs, segs, users = synthetic_eye_batch(args.n, 400, 640, num_users=8, seed=0)
    xs, ys, ms = list(imgs), [int(u) for u in users], list(segs)

    key = jax.random.PRNGKey(cfg.seed)
    k_vgg, k_c1, k_c2 = jax.random.split(key, 3)
    mesh = make_mesh()
    vgg_params = shard_params(mesh, VGG19.init(k_vgg))
    ritnet_params = shard_params(mesh, RITnet.pretrained())
    c1_params = shard_params(mesh, Classifier1.init(k_c1, args.num_class))
    c2_params = shard_params(mesh, Classifier2.init(k_c2, num_class=args.num_class))
    jax.block_until_ready((vgg_params, ritnet_params, c1_params, c2_params))

    # stage 1: dataset build (seg + mask + crop).  Warm the one jitted
    # program on an 8-image slice (args.n % 8 == 0 keeps chunk shapes
    # uniform), then time the full build twice: the first pays any
    # full-shape eager-op compiles the persistent cache missed; the second
    # is the steady state every further sweep combo / split sees (and what
    # the 10x-larger real split amortizes to).
    build_ist_dataset(xs[:8], ys[:8], ms[:8], ritnet_params, cfg.glint_threshold)
    t0 = time.perf_counter()
    dataset = build_ist_dataset(xs, ys, ms, ritnet_params, cfg.glint_threshold)
    _ = dataset.ious  # the build's one (lazy) D2H sync
    t_build_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    dataset = build_ist_dataset(xs, ys, ms, ritnet_params, cfg.glint_threshold)
    _ = dataset.ious
    t_build = time.perf_counter() - t0
    print(f"build (first, incl. one-time compiles): {t_build_first:.2f} s "
          f"for {args.n} images = {args.n / t_build_first:.1f} img/s", flush=True)
    print(f"build (steady state): {t_build:.2f} s for {args.n} images "
          f"= {args.n / t_build:.1f} img/s", flush=True)
    # host-only share: the build is fully async (no sync until .ious), so
    # its dispatch-only wall time IS the single-host cost of feeding the
    # build — the term that does NOT divide by 8 in the v5e-8 projection
    # (BASELINE.md feed-budget paragraph).  jax.block_until_ready drains
    # the queue first so the next measurement starts clean.
    t0 = time.perf_counter()
    dataset_async = build_ist_dataset(xs, ys, ms, ritnet_params, cfg.glint_threshold)
    t_build_host = time.perf_counter() - t0
    print(f"build (host dispatch only, no sync): {t_build_host:.2f} s "
          f"= {t_build_host / args.n * 1e3:.1f} ms/img host-side", flush=True)
    _ = dataset_async.ious  # drain before the loop

    # stage 2: the batch loop at the reference config
    save_dir = "/tmp/probe18/"
    prepare_dir(save_dir, idempotent=True)
    logger = MetricLogger("probe18", "full-pipeline", cfg.to_dict(),
                          out_dir="/tmp/probe18_logs", use_wandb=False)
    programs = make_programs(jnp.bfloat16, seg_chunk=8 * mesh.shape["data"])
    t0 = time.perf_counter()
    log = iris_style_transfer_openeds2019(
        cfg, dataset, vgg_params, ritnet_params, c1_params, c2_params,
        cfg.c_loss_weight, 1.0, args.nst_epochs, "test/", save_dir, logger,
        num_class=args.num_class, mesh=mesh, programs=programs,
    )
    t_loop = time.perf_counter() - t0
    logger.finish()

    nst_ipm = log["test/stylized_images_per_min"]
    pipe_ipm = log["test/pipeline_images_per_min"]
    s_img = t_build / args.n + 60.0 / pipe_ipm
    full_ipm = 60.0 / s_img
    print(f"loop wall (incl. compile): {t_loop:.1f} s", flush=True)
    print(f"nst-only: {nst_ipm:.1f} images/min", flush=True)
    print(f"loop e2e (classify+NST+composite+re-seg+metrics): {pipe_ipm:.1f} images/min", flush=True)
    print(f"FULL seg+NST pipeline: {full_ipm:.1f} images/min/chip "
          f"(build {t_build/args.n*1e3:.0f} ms/img + loop {60.0/pipe_ipm*1e3:.0f} ms/img)",
          flush=True)
    # conservative cross-check: one COLD build + the loop, everything on
    # the wall clock (one-time compiles, warmup, staging, metric drain)
    print(f"FULL pipeline, pure wall (cold build + loop incl. compile): "
          f"{args.n / (t_build_first + t_loop) * 60:.1f} images/min/chip", flush=True)


if __name__ == "__main__":
    main()
