"""Iris style transfer privacy evaluation — OpenEDS2020 (gaze preservation).

Reference: ``iris_style_transfer_openeds2020.py`` — one *fixed* style iris
for all content images ("one-for-all", a hand-picked frame masked via
EfficientNet + glint threshold, ``:237-249``).  Per batch: pre-NST gaze
estimation with both estimators + angular distances (``:64-75``); per-image
iris extraction from the EfficientNet seg (``:78-99``, the inline
``mask_and_crop_iris`` variant); batched ``nst()`` (``:103-110``);
recomposition (``:121-139``); post-NST gaze estimation (``:145-156``);
aggregation saving preds/labels + wandb (``:161-194``).

TPU-native: segmentation, landmark extraction (the reference's per-image
OpenCV host round trip, ``gaze_estimators.py:127``), iris extraction, the
NST scan, recomposition and both estimators all run as jitted batched
device programs.
"""

from __future__ import annotations

import argparse
import os
import time
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

from ..data import batch_iterator, synthetic_eye_batch
from ..data.openeds2020 import (
    load_data_openeds2020,
    load_labels_openeds2020,
    stream_openeds2020,
)
from ..models import (
    EfficientNet,
    GazeEstimator1,
    GazeEstimator2,
    ResNet50,
    VGG19,
    load_pretrained,
    pretrained_path,
)
from ..ops.image import crop_and_resize, gray_to_rgb, nonzero_bbox, quantize_u8, to_unit_float
from ..ops.metrics import angular_distance
from ..parallel import make_stager, spatial_sharding
from ..pipelines import composite_batch, extract_iris_batch
from ..runtime import MetricLogger, StepTimer, restore_params
from ..runtime.config import WorkloadConfig, add_common_args, parse_config
from ..transfer.nst import cached_nst_program
from ..utils import prepare_dir, seed as seed_all, sweep_done, write_sweep_marker
from .ist_openeds2019 import _host_prefetch


def make_programs(glint, compute_dtype, mesh=None):
    """Full-resolution segmentation/gaze run as one jitted program applied
    in chunks (EfficientNet-B7 + ResNet50 at 400x640 hold too much
    activation memory for a 128-image batch on one chip; the per-device
    chunk stays at 8, so the global chunk scales with the mesh's data
    axis).  Independent of the sweep combo — build ONCE per process and
    pass to :func:`iris_style_transfer_openeds2020` via ``programs`` so a
    weights x epochs sweep does not recompile the heaviest programs in
    the pipeline per combo; only the (cheap to trace) NST scan varies."""
    stage = make_stager(mesh)
    seg_chunk = 8 * (mesh.shape["data"] if mesh is not None else 1)

    @jax.jit
    def _pre_chunk(eff_params, g1_params, g2_params, c_imgs):
        c_imgs = to_unit_float(c_imgs)  # frames are staged uint8 (4x less H2D)
        # compute_dtype reaches the 65M-param B7 and the ResNet backbone:
        # bf16 is +16% images/s at full res with argmax labels identical
        # to f32 (tools/perf_probe13.py)
        segs = EfficientNet.apply(eff_params, c_imgs, compute_dtype=compute_dtype)
        preds1 = GazeEstimator1.apply(g1_params, segs, extract_feature=True)
        preds2 = GazeEstimator2.apply(
            g2_params, gray_to_rgb(c_imgs), extract_feature=True,
            compute_dtype=compute_dtype,
        )
        irises, masks, bboxes = extract_iris_batch(c_imgs, segs, glint)
        return segs, preds1, preds2, irises, masks, bboxes

    def pre_fn(eff_params, g1_params, g2_params, c_imgs):
        """c_imgs: host numpy — each chunk is staged batch-sharded so every
        device segments <=8 frames at a time.  Returns the staged uint8
        frames as the last output so the loop reuses them device-resident
        for compositing instead of re-quantizing + re-staging the same
        32 MB batch from host (the 2019 twin's round-4 device-resident
        treatment, ported per round-4 VERDICT next-step #3)."""
        c_imgs = quantize_u8(np.asarray(c_imgs))  # compact H2D, see _pre_chunk
        staged = [
            stage(c_imgs[i : i + seg_chunk])
            for i in range(0, c_imgs.shape[0], seg_chunk)
        ]
        outs = [
            _pre_chunk(eff_params, g1_params, g2_params, chunk) for chunk in staged
        ]
        return tuple(jnp.concatenate(parts) for parts in zip(*outs)) + (
            jnp.concatenate(staged),
        )

    @jax.jit
    def _post_chunk(eff_params, g1_params, g2_params, frames, stylized, masks, bboxes):
        frames = to_unit_float(frames)
        new_frames = composite_batch(frames, stylized, masks, bboxes)
        segs = EfficientNet.apply(eff_params, new_frames, compute_dtype=compute_dtype)
        preds1 = GazeEstimator1.apply(g1_params, segs, extract_feature=True)
        preds2 = GazeEstimator2.apply(
            g2_params, gray_to_rgb(new_frames), extract_feature=True,
            compute_dtype=compute_dtype,
        )
        return new_frames, preds1, preds2

    def post_fn(eff_params, g1_params, g2_params, frames, stylized, masks, bboxes):
        outs = [
            _post_chunk(
                eff_params, g1_params, g2_params,
                frames[i : i + seg_chunk], stylized[i : i + seg_chunk],
                masks[i : i + seg_chunk], bboxes[i : i + seg_chunk],
            )
            for i in range(0, frames.shape[0], seg_chunk)
        ]
        return tuple(jnp.concatenate(parts) for parts in zip(*outs))

    return pre_fn, post_fn, stage


# the jitted NST program builder is shared with the 2019/2020 twin
# workload (one program, one benchmark): transfer.nst.cached_nst_program
_nst_program = cached_nst_program


def _gaze_metric_job(metric_prefix, phase, p1, p2, labs_v, valid):
    """Per-batch angular-distance metrics for one phase (pre/post) on the
    single metric worker thread, OVERLAPPED with the next batch's device
    work — the same pattern as the 2019 twin's ``_batch_metric_job``
    (round-3 VERDICT weak #5: the twins disagreed on it).  The job takes
    the DEVICE predictions and does the D2H fetch itself, keeping the
    ~150 ms/fetch tunnel latency off the dispatch path.  Returns
    (log-dict, agg-dict) for the ordered drain.  The predictions' D2H was
    started at submit time (``_host_prefetch``) so the ``np.asarray``
    finds the host buffer filled."""
    p1v, p2v = np.asarray(p1)[valid], np.asarray(p2)[valid]
    out = {}
    for i, pv in (("1", p1v), ("2", p2v)):
        dot = np.clip(np.sum(pv * labs_v, axis=1), -1.0, 1.0)
        rad = np.arccos(dot)
        out[f"{metric_prefix}/batch/{phase}/radian_distance{i}"] = float(rad.mean())
        out[f"{metric_prefix}/batch/{phase}/degree_distance{i}"] = float(
            np.degrees(rad).mean()
        )
    return out, {f"{phase}1": p1v, f"{phase}2": p2v}


def _loss_job(metric_prefix, c_hist, s_hist, c_w, s_w):
    """Fetch the final closure losses off the critical path and emit the
    reference's batch loss keys; the whole prefetched (E,) histories
    cost the same tunnel latency as two scalars and skip the device
    indexing programs ``hist[-1]`` would dispatch."""
    c_loss, s_loss = float(np.asarray(c_hist)[-1]), float(np.asarray(s_hist)[-1])
    log = {
        f"{metric_prefix}/batch/c_loss": c_loss,
        f"{metric_prefix}/batch/s_loss": s_loss,
        f"{metric_prefix}/batch/cs_loss": c_loss * c_w + s_loss * s_w,
    }
    return log, {"c_loss": c_loss, "s_loss": s_loss}


def iris_style_transfer_openeds2020(
    cfg, images, labels, eff_params, g1_params, g2_params, vgg_params, s_iris,
    c_loss_weight, s_loss_weight, nst_epoch, metric_prefix, save_dir, logger,
    save_period: int = 50,
    mesh=None,
    programs=None,
):
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    if programs is None:
        programs = make_programs(cfg.glint_threshold, compute_dtype, mesh=mesh)
    pre_fn, post_fn, stage = programs
    # spatial parallelism (parallel.spatial_sharding): model>1 H-shards
    # the NST images so chips beyond the batch axis split each image
    n_model = mesh.shape.get("model", 1) if mesh is not None else 1
    nst_fn = _nst_program(
        nst_epoch, float(c_loss_weight), float(s_loss_weight), cfg.compute_dtype,
        getattr(cfg, "scan_unroll", 8), getattr(cfg, "history_size", 10),
        getattr(cfg, "pallas_gram", "auto"), getattr(cfg, "stats_taps", "auto"),
        model_sharded=n_model > 1,  # Pallas gates fall back to XLA forms
    )
    nst_in = spatial_sharding(mesh) if n_model > 1 else None
    s_iris_rgb = gray_to_rgb(jnp.asarray(s_iris))

    agg = {"pre1": [], "pre2": [], "post1": [], "post2": [], "labels": [],
           "c_loss": [], "s_loss": []}
    timer = StepTimer()
    # wall-clock per full batch body (stage + B7 seg + both estimators + NST
    # + composite + re-seg + metrics) — the full-pipeline denominator,
    # mirroring ist_openeds2019.py's ``pipeline_images_per_min``.  Host
    # metric math runs on this worker, overlapped with device work (the
    # same single-thread + ordered-drain pattern as the 2019 twin).
    metric_pool = ThreadPoolExecutor(max_workers=1)
    pending: list[tuple[dict, list]] = []
    pipe_times: list[float] = []

    def _save_png(path, img):
        from PIL import Image

        img = np.asarray(img)
        arr = img if img.dtype == np.uint8 else np.asarray(np.clip(img, 0, 1) * 255.0, np.uint8)
        Image.fromarray(arr[..., 0] if arr.ndim == 3 else arr).save(path)

    # ``images`` is either a materialized array or a zero-arg factory
    # returning a (imgs, labels, valid) batch stream (the 550K-frame
    # OpenEDS2020 splits stream rather than materialize — SURVEY §7 hard
    # part 5)
    if callable(images):
        batches = images()
    else:
        batches = batch_iterator((images, labels), cfg.bs, pad_final=True)
    for batch_id, batch in enumerate(batches):
        t_batch = time.perf_counter()
        c_imgs, labs = batch[0], batch[1]
        valid = batch[2] if len(batch) > 2 else np.ones(len(labs), bool)
        blog = {}
        if batch_id % save_period == 0:
            _save_png(f"{save_dir}batch_{batch_id}_raw.png", c_imgs[0])

        segs, p1, p2, irises, masks, bboxes, frames_dev = pre_fn(
            eff_params, g1_params, g2_params, c_imgs
        )
        # batch metrics over valid rows only — padded rows duplicate the
        # last sample and would bias the final short batch.  Every D2H
        # fetch (predictions, losses) happens on the worker thread: the
        # main thread only dispatches device programs and blocks on the
        # NST scan itself.
        labs_v = np.asarray(labs)[valid]
        _host_prefetch(p1, p2)
        futs = [metric_pool.submit(
            _gaze_metric_job, metric_prefix, "pre", p1, p2, labs_v, valid
        )]
        agg["labels"].append(labs_v)

        with timer:
            # re-shard the concatenated chunk outputs evenly over the data
            # axis before the NST scan (cheap device-to-device placement)
            irises = stage(irises)
            s_batch = jnp.broadcast_to(s_iris_rgb[None], irises.shape)
            if nst_in is not None:
                irises = jax.device_put(irises, nst_in)
                s_batch = jax.device_put(s_batch, nst_in)
            result = nst_fn(vgg_params, irises, s_batch)
            result.x.block_until_ready()
        _host_prefetch(result.c_loss_hist, result.s_loss_hist)
        futs.append(metric_pool.submit(
            _loss_job, metric_prefix, result.c_loss_hist, result.s_loss_hist,
            c_loss_weight, s_loss_weight,
        ))

        # frames stay device-resident from pre_fn: no second H2D of the
        # same u8 batch (stage() on already-device arrays only re-shards)
        new_frames, p1, p2 = post_fn(
            eff_params, g1_params, g2_params,
            frames_dev, result.x, stage(masks), stage(bboxes),
        )
        _host_prefetch(p1, p2)
        futs.append(metric_pool.submit(
            _gaze_metric_job, metric_prefix, "post", p1, p2, labs_v, valid
        ))

        if batch_id % save_period == 0:
            _save_png(f"{save_dir}batch_{batch_id}_new.png", new_frames[0])
        pending.append((blog, futs))
        pipe_times.append(time.perf_counter() - t_batch)

    # drain the deferred metric/fetch jobs in batch order (exceptions
    # surface here); agg fills here so its order matches the labels.
    # The drain is timed and folded into the pipeline denominator below:
    # pipe_times stops at dispatch, so any metric work still queued after
    # the last batch would otherwise be excluded and the reported
    # throughput could exceed true end-to-end (round-4 ADVICE item 5).
    t_drain0 = time.perf_counter()
    for blog, futs in pending:
        for f in futs:
            log_upd, agg_upd = f.result()
            blog.update(log_upd)
            for k, v in agg_upd.items():
                agg[k].append(v)
        logger.log(blog)
    metric_pool.shutdown(wait=True)
    t_drain = time.perf_counter() - t_drain0

    log = {}
    labels_all = np.concatenate(agg["labels"]); np.save(f"{save_dir}labels.npy", labels_all)
    for phase in ("pre", "post"):
        for i in ("1", "2"):
            preds = np.concatenate(agg[f"{phase}{i}"])
            np.save(f"{save_dir}preds{i}_{phase}.npy", preds)
            # epoch inputs are host numpy: the CPU backend avoids a tunnel
            # H2D + dispatch + per-scalar D2H round trip per call
            with jax.default_device(jax.devices("cpu")[0]):
                rad, deg = angular_distance(
                    jnp.asarray(preds), jnp.asarray(labels_all)
                )
                log[f"{metric_prefix}/{phase}/radian_distance{i}"] = float(rad.mean())
                log[f"{metric_prefix}/{phase}/degree_distance{i}"] = float(deg.mean())
    c_loss = float(np.nanmean(agg["c_loss"])); s_loss = float(np.nanmean(agg["s_loss"]))
    log[f"{metric_prefix}/c_loss"] = c_loss
    log[f"{metric_prefix}/s_loss"] = s_loss
    log[f"{metric_prefix}/cs_loss"] = c_loss * c_loss_weight + s_loss * s_loss_weight
    log[f"{metric_prefix}/stylized_images_per_min"] = timer.per_sec(cfg.bs) * 60
    # end-to-end: exclude the first (compile-dominated) batch when there is
    # more than one, mirroring StepTimer's convention; the post-loop metric
    # drain wall time counts against the denominator so a backlogged
    # worker can't inflate the number past true end-to-end throughput
    pipe = pipe_times[1:] if len(pipe_times) > 1 else pipe_times
    if pipe:
        log[f"{metric_prefix}/pipeline_images_per_min"] = (
            cfg.bs * len(pipe) / (sum(pipe) + t_drain) * 60
        )
    logger.log(log)
    return log


def main():
    parser = argparse.ArgumentParser()
    defaults = WorkloadConfig(project="iris-style-transfer-openeds2020", bs=128)
    add_common_args(parser, defaults)
    parser.add_argument("-path1", "--estimator1_path", type=str, default="")
    parser.add_argument("-path2", "--estimator2_path", type=str, default="")
    parser.add_argument(
        "--vgg_weights", type=str, default="",
        help="ported VGG19 IMAGENET1K_V1 npz; auto-discovers "
        "models/weights/vgg19.npz when omitted",
    )
    parser.add_argument(
        "--effnet_weights", type=str, default="",
        help="ported smp Unet(efficientnet-b7) npz; auto-discovers "
        "models/weights/unet_efficientnet-b7.npz when omitted",
    )
    parser.add_argument(
        "--resnet_weights", type=str, default="",
        help="ported ResNet50 IMAGENET1K_V2 npz for GazeEstimator2's "
        "backbone; auto-discovers models/weights/resnet50.npz when omitted",
    )
    parser.add_argument("--nst_epochs", type=int, nargs="+", default=[200])
    parser.add_argument("--s_loss_weights", type=float, nargs="+", default=[1.0])
    parser.add_argument(
        "--rerun", action="store_true",
        help="re-run sweep combos that already have a done.json marker",
    )
    cfg, args = parse_config(parser, defaults)

    key = seed_all(cfg.seed)
    # mesh: batch-parallel over ``data`` (SURVEY §2.3); params replicate.
    # --model_parallel > 1 additionally H-shards the NST images over
    # ``model`` (spatial parallelism, parallel.spatial_sharding)
    from ..parallel import make_mesh, shard_params

    mesh = make_mesh(n_devices=cfg.n_devices or None, model_parallel=cfg.model_parallel)
    if cfg.bs % mesh.shape["data"]:
        raise SystemExit(
            f"batch size {cfg.bs} not divisible by {mesh.shape['data']} data shards"
        )
    if cfg.model_parallel > 1 and (224 // 8) % cfg.model_parallel:
        raise SystemExit(
            f"model_parallel={cfg.model_parallel} must divide the relu4_1 tap "
            f"height 224/8=28 (use 2, 4, 7, 14 or 28)"
        )

    k_vgg, k_eff, k_g1, k_g2, k_res = jax.random.split(key, 5)
    vgg_params = load_pretrained("vgg19", args.vgg_weights, lambda: VGG19.init(k_vgg))
    eff_params = load_pretrained(
        "efficientnet_unet", args.effnet_weights, lambda: EfficientNet.init(k_eff)
    )
    # estimators from checkpoints (reference :228-235): exact file when a
    # file is named, latest step when a directory is named, seeded init
    # otherwise
    g1_params = restore_params(args.estimator1_path, GazeEstimator1.init(k_g1))
    g2_params = restore_params(args.estimator2_path, None)
    if g2_params is None:
        g2_params = GazeEstimator2.init(k_g2, extract_feature=True)
        # no trained estimator checkpoint -> at least give its backbone the
        # torchvision pretrained weights the reference starts from (:18-21)
        if args.resnet_weights or pretrained_path("resnet50"):
            g2_params["resnet"] = load_pretrained(
                "resnet50", args.resnet_weights, lambda: g2_params["resnet"]
            )
    vgg_params, eff_params, g1_params, g2_params = (
        shard_params(mesh, p) for p in (vgg_params, eff_params, g1_params, g2_params)
    )

    base = os.path.join(cfg.data_dir, "openeds2020", "openEDS2020-GazePrediction")
    use_real = os.path.isdir(base)

    # fixed style iris: a hand-picked frame, EfficientNet-masked + cropped
    # (reference :237-249)
    if use_real:
        from PIL import Image

        s_path = os.path.join(base, "test", "sequences", "2577", "023.png")
        s_img = np.asarray(Image.open(s_path).convert("L"), np.float32)[..., None] / 255.0
    else:
        s_img = synthetic_eye_batch(1, seed=cfg.seed + 999)[0][0]

    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    @jax.jit
    def style_iris(img):
        seg = EfficientNet.apply(eff_params, img[None], compute_dtype=compute_dtype)[0]
        m = (seg == 2)[..., None] & (img <= cfg.glint_threshold)
        masked = img * m
        bb = nonzero_bbox(masked[..., 0])
        return crop_and_resize(masked, bb, (224, 224))

    s_iris = style_iris(jnp.asarray(s_img))

    # sweep identity for done.json markers: anything that changes results
    _presentation = {"name", "project", "num_workers", "resume", "save_period"}
    sweep_config = {k: v for k, v in cfg.to_dict().items() if k not in _presentation}
    sweep_config.update(
        vgg_weights=args.vgg_weights,
        effnet_weights=args.effnet_weights,
        resnet_weights=args.resnet_weights,
        estimator1_path=args.estimator1_path,
        estimator2_path=args.estimator2_path,
    )

    postfixes = ["validation/"]
    if cfg.eval_train:
        postfixes.append("train/")
    if cfg.eval_test:
        postfixes.append("test/")
    results = {}
    programs = make_programs(cfg.glint_threshold, compute_dtype, mesh=mesh)

    for postfix in postfixes:
        print(f"loading {postfix[:-1]} set...")
        if use_real:
            # labels load eagerly (tiny CSVs); frames STREAM — the splits
            # hold up to 550K 400x640 frames, far beyond host RAM at the
            # reference's eager materialization (data_preprocessing.py:
            # 385-417).  The factory re-creates the stream per sweep combo.
            labels = load_labels_openeds2020(base + "/", postfix)
            images = lambda p=postfix: stream_openeds2020(base + "/", p, cfg.bs)
        else:
            # the twin's gaze is geometric (iris offset inside the sclera,
            # data/synthetic.py) — labels an estimator can actually predict
            imgs, _, _, labels = synthetic_eye_batch(24, seed=cfg.seed, gaze=True)
            images = imgs
        print(f"number of samples in {postfix} set:", len(labels))

        for sw in args.s_loss_weights:
            for nst_epoch in args.nst_epochs:
                save_dir = f"saved/openeds2020/sw_{sw}_epoch_{nst_epoch}/{postfix}"
                # resumable sweep (SURVEY §5.3): keep existing outputs and
                # skip combos a previous (possibly crashed) run completed
                done_marker = os.path.join(save_dir, "done.json")
                if sweep_done(done_marker, sweep_config,
                              defaults=WorkloadConfig().to_dict()) and not args.rerun:
                    print(f"[sweep] {save_dir} already complete, skipping")
                    continue
                prepare_dir(save_dir, idempotent=True)
                np.save(f"{save_dir}gts.npy", labels)
                name = f"seed {cfg.seed} sw {sw} epoch {nst_epoch} test"
                logger = MetricLogger(cfg.project, name, cfg.to_dict())
                log = iris_style_transfer_openeds2020(
                    cfg, images, labels, eff_params, g1_params, g2_params, vgg_params,
                    s_iris, cfg.c_loss_weight, sw, nst_epoch, postfix, save_dir, logger,
                    mesh=mesh, programs=programs,
                )
                logger.finish()
                write_sweep_marker(done_marker, sweep_config, log)
                results[(postfix, sw, nst_epoch)] = log
    return results


if __name__ == "__main__":
    main()
