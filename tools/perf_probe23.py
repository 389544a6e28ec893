"""Round-3 probe: FULL IST-2020 pipeline throughput (the gaze twin of
tools/perf_probe18.py).

The 2020 privacy pipeline (reference ``iris_style_transfer_openeds2020.py``)
differs from 2019's in every stage cost: EfficientNet-B7 segmentation with
x2 TTA at full 400x640 (instead of the ~250K-param RITnet), two gaze
estimators (landmark MLP on the seg + ResNet50 on the frame) pre AND post,
no separate dataset-build stage (iris extraction is inline), bs 128
(reference ``:211``), and a single fixed style iris.  Nothing has measured
that whole loop end-to-end — bench.py's secondary covers only a bs-64 NST
scan and perf_probe13 only the B7 seg.  This probe runs the real workload
body (``workloads/ist_openeds2020.py:iris_style_transfer_openeds2020``)
over synthetic 400x640 frames and reports:

  - ``stylized_images_per_min`` (NST scan only, bs 128),
  - ``pipeline_images_per_min`` (full batch body incl. staging, 2x B7+TTA
    seg passes, both estimators twice, composite, host metrics),
  - the per-stage wall split implied by the two.

    python tools/perf_probe23.py [--n 256] [--bs 128] [--nst_epochs 200]
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
    ap.add_argument("--n", type=int, default=256, help="frames (multiple of bs)")
    ap.add_argument("--bs", type=int, default=128)
    ap.add_argument("--nst_epochs", type=int, default=200)
    args = ap.parse_args()

    import jax.numpy as jnp

    from iris_style_transfer_tpu.data.synthetic import synthetic_eye_batch
    from iris_style_transfer_tpu.models import (
        EfficientNet,
        GazeEstimator1,
        GazeEstimator2,
        VGG19,
    )
    from iris_style_transfer_tpu.ops.image import crop_and_resize, nonzero_bbox
    from iris_style_transfer_tpu.parallel import make_mesh, shard_params
    from iris_style_transfer_tpu.runtime import MetricLogger
    from iris_style_transfer_tpu.runtime.config import WorkloadConfig
    from iris_style_transfer_tpu.utils import prepare_dir
    from iris_style_transfer_tpu.workloads.ist_openeds2020 import (
        iris_style_transfer_openeds2020,
        make_programs,
    )

    print("backend:", jax.default_backend(), flush=True)
    cfg = WorkloadConfig(project="probe23", bs=args.bs)
    compute_dtype = jnp.bfloat16

    imgs, _, _, labels = synthetic_eye_batch(args.n, 400, 640, seed=0, gaze=True)

    key = jax.random.PRNGKey(cfg.seed)
    k_vgg, k_eff, k_g1, k_g2 = jax.random.split(key, 4)
    mesh = make_mesh()
    vgg_params = shard_params(mesh, VGG19.init(k_vgg))
    eff_params = shard_params(mesh, EfficientNet.init(k_eff))
    g1_params = shard_params(mesh, GazeEstimator1.init(k_g1))
    g2_params = shard_params(mesh, GazeEstimator2.init(k_g2, extract_feature=True))
    jax.block_until_ready((vgg_params, eff_params, g1_params, g2_params))

    # fixed style iris from the first frame, exactly as the workload's
    # ``style_iris`` builds it (workloads/ist_openeds2020.py:style_iris)
    @jax.jit
    def style_iris(img):
        seg = EfficientNet.apply(eff_params, img[None], compute_dtype=compute_dtype)[0]
        m = (seg == 2)[..., None] & (img <= cfg.glint_threshold)
        masked = img * m
        bb = nonzero_bbox(masked[..., 0])
        return crop_and_resize(masked, bb, (224, 224))

    s_iris = style_iris(jnp.asarray(imgs[0]))

    save_dir = "/tmp/probe23/"
    prepare_dir(save_dir, idempotent=True)
    logger = MetricLogger("probe23", "full-pipeline-2020", cfg.to_dict(),
                          out_dir="/tmp/probe23_logs", use_wandb=False)
    programs = make_programs(cfg.glint_threshold, compute_dtype, mesh=mesh)
    t0 = time.perf_counter()
    log = iris_style_transfer_openeds2020(
        cfg, imgs, np.asarray(labels), eff_params, g1_params, g2_params,
        vgg_params, s_iris, cfg.c_loss_weight, 1.0, args.nst_epochs,
        "validation/", save_dir, logger, mesh=mesh, programs=programs,
    )
    t_loop = time.perf_counter() - t0
    logger.finish()

    nst_ipm = log["validation//stylized_images_per_min"]
    pipe_ipm = log["validation//pipeline_images_per_min"]
    other_ms = (60.0 / pipe_ipm - 60.0 / nst_ipm) * 1e3
    print(f"loop wall (incl. compile): {t_loop:.1f} s for {args.n} frames", flush=True)
    print(f"nst-only: {nst_ipm:.1f} images/min ({60.0/nst_ipm*1e3:.0f} ms/img)", flush=True)
    print(f"FULL 2020 pipeline (stage+2x B7 TTA seg+2x both estimators+NST+"
          f"composite+metrics): {pipe_ipm:.1f} images/min/chip "
          f"({60.0/pipe_ipm*1e3:.0f} ms/img; non-NST {other_ms:.0f} ms/img)",
          flush=True)


if __name__ == "__main__":
    main()
