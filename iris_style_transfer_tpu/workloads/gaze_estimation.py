"""Train gaze estimators (OpenEDS2020).

Reference: ``gaze_estimation.py`` — GazeEstimator1 (on precomputed
landmarks) or GazeEstimator2 (ResNet features, ResNet unfrozen,
``:56-59``), Adam + CosineEmbeddingLoss target 1 (``:62-63,77``), an
in-process lr sweep [1e-6, 1e-5, 1e-4] (``:11,44-49``), per-epoch
train/valid(/test) angular-distance metrics, periodic checkpoints.

Note: the reference constructs its test loader from ``valid_d``
(``:40``, a latent copy-paste bug) — fixed here to use the test split, as
SURVEY.md §2.1 directs.
"""

from __future__ import annotations

import argparse
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import batch_iterator, prefetch_to_device, synthetic_eye_batch
from ..data.openeds2020 import load_data_openeds2020, stream_openeds2020
from ..models import (
    EfficientNet,
    GazeEstimator1,
    GazeEstimator2,
    load_pretrained,
    pretrained_path,
)
from ..ops.image import to_unit_float
from ..ops.ellipse import extract_eye_landmarks
from ..ops.metrics import angular_distance, cosine_embedding_loss
from ..parallel import make_mesh
from ..runtime import (
    MetricLogger,
    StepTimer,
    restore_state,
    save_checkpoint,
    save_state,
)
from ..runtime.config import WorkloadConfig, add_common_args, parse_config
from ..utils import seed as seed_all


def _synthetic_gaze(n, estimator, seed=0):
    """Synthetic (features, gaze) pairs shaped like the 2020 loader
    output.  The twin's gaze is geometric (iris offset inside the sclera,
    ``data/synthetic.py``), so the landmark features genuinely predict it
    — estimator training converges instead of fitting noise."""
    imgs, segs, _, gaze = synthetic_eye_batch(n, seed=seed, gaze=True)
    if estimator == 1:
        feats = np.asarray(jax.vmap(extract_eye_landmarks)(jnp.asarray(segs)))
    else:
        feats = imgs
    return feats, gaze


def make_steps(estimator: int, optimizer, compute_dtype=jnp.float32):
    extract = estimator == 2  # estimator2 owns a trainable ResNet (:59)

    def loss_fn(params, x, y, key):
        x = to_unit_float(x)  # raw frames stream as uint8 (4x less host RAM/H2D)
        if estimator == 1:
            o = GazeEstimator1.apply(params, x, train=True, dropout_key=key)
        else:
            # bf16 backbone forward, f32 params/grads (mixed precision on
            # the MXU); the cosine loss and head stay f32
            o = GazeEstimator2.apply(params, x, extract_feature=extract,
                                     train=True, dropout_key=key,
                                     compute_dtype=compute_dtype)
        return cosine_embedding_loss(o, y), o

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, x, y, key):
        (loss, o), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, x, y, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, o

    @jax.jit
    def eval_step(params, x):
        x = to_unit_float(x)  # see loss_fn
        if estimator == 1:
            return GazeEstimator1.apply(params, x)
        return GazeEstimator2.apply(params, x, extract_feature=extract,
                                    compute_dtype=compute_dtype)

    return train_step, eval_step


def _epoch_metrics(preds, labels, prefix, log):
    # lists may hold device arrays (gathered here, once per epoch) — a
    # per-step np.asarray would sync the host against every train_step
    # and serialize the pipeline, the reference's own flaw
    # (pipelines.py:93-95 analog)
    preds = np.concatenate(jax.device_get(preds))
    labels = np.concatenate(jax.device_get(labels))
    log[f"{prefix}/loss"] = float(cosine_embedding_loss(preds, labels))
    rad, deg = angular_distance(preds, labels)
    log[f"{prefix}/radian_distance"] = float(rad.mean())
    log[f"{prefix}/degree_distance"] = float(deg.mean())


def gaze_estimation(
    cfg: WorkloadConfig,
    lrs=(1e-6, 1e-5, 1e-4),
    effnet_weights: str = "",
    resnet_weights: str = "",
) -> dict:
    seed_all(cfg.seed)
    base = os.path.join(cfg.data_dir, "openeds2020", "openEDS2020-GazePrediction")
    use_real = os.path.isdir(base)

    # load each checkpoint ONCE (the B7 npz is hundreds of MB; per-split /
    # per-lr reloads would repeat the full np.load+unflatten)
    extract = cfg.estimator == 1
    eff = (
        load_pretrained(
            "efficientnet_unet", effnet_weights,
            lambda: EfficientNet.init(jax.random.PRNGKey(0)),
        )
        if use_real and extract
        else None
    )
    resnet_pre = None
    if cfg.estimator == 2 and (resnet_weights or pretrained_path("resnet50")):
        resnet_pre = load_pretrained("resnet50", resnet_weights, lambda: None)

    # Estimator 2 trains on raw (400, 640, 1) frames; materializing the
    # ~550K-frame train split eagerly (as the reference does,
    # ``data_preprocessing.py:385-417``) would need ~563 GB of host RAM.
    # Stream it instead: splits stay as postfix strings and each epoch
    # re-shuffles through a bounded buffer (SURVEY §7 hard-part 5).
    stream_raw = use_real and cfg.estimator == 2

    def load(postfix):
        if stream_raw:
            return postfix  # streamed lazily, per epoch
        if use_real:
            # landmark extraction segments frames with the pretrained
            # EfficientNet when ported weights exist (reference
            # data_preprocessing.py:378-383)
            return load_data_openeds2020(
                extract_feature=extract, estimator=cfg.estimator,
                data_path=base + "/", postfix=postfix, efficientnet_params=eff,
                compute_dtype=(
                    jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
                ),
            )
        return _synthetic_gaze(96 if "train" in postfix else 32, cfg.estimator, seed=cfg.seed)

    def train_batches(split, epoch):
        if isinstance(split, str):
            return stream_openeds2020(
                base + "/", split, cfg.bs,
                shuffle_seed=cfg.seed + epoch, drop_remainder=True,
            )
        return batch_iterator(split, cfg.bs, shuffle=True, seed=cfg.seed + epoch,
                              drop_remainder=True)

    def eval_batches(split):
        if isinstance(split, str):
            return stream_openeds2020(base + "/", split, cfg.bs)
        return batch_iterator(split, cfg.bs)

    print("loading training set...")
    train = load("train/")
    print("loading validation set...")
    valid = load("validation/")
    test = load("test/") if cfg.test else None

    mesh = make_mesh(n_devices=cfg.n_devices or None, model_parallel=1)
    final = {}
    for lr in lrs:
        key = seed_all(cfg.seed)
        k_init, k_train = jax.random.split(key)
        name = f"seed {cfg.seed} " + ("model-based" if cfg.estimator == 1 else "appearance-based") + f" lr {lr}"
        logger = MetricLogger(cfg.project, name, {**cfg.to_dict(), "lr": lr})

        if cfg.estimator == 1:
            params = GazeEstimator1.init(k_init)
        else:
            params = GazeEstimator2.init(k_init, extract_feature=True)
            # start the trainable backbone from torchvision's pretrained
            # ResNet50 when ported weights exist (reference resnet.py:18-21)
            if resnet_pre is not None:
                params["resnet"] = resnet_pre
        optimizer = optax.adam(lr)
        opt_state = optimizer.init(params)
        train_step, eval_step = make_steps(
            cfg.estimator, optimizer,
            jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32,
        )
        timer = StepTimer()

        # resumable training (the reference is save-only, SURVEY §5.3-5.4)
        # seed-scoped so --resume can never silently restore another
        # configuration's training state (same param shapes would load)
        ckpt_dir = (
            f"saved/checkpoints/gaze_estimator{cfg.estimator}_lr_{lr}_seed_{cfg.seed}"
        )
        start_epoch = 0
        if cfg.resume:
            restored = restore_state(ckpt_dir, (params, opt_state, jnp.int32(0)))
            if restored is not None:
                start_epoch, (params, opt_state, _) = restored
                params = jax.tree.map(jnp.asarray, params)
                opt_state = jax.tree.map(jnp.asarray, opt_state)
                print(f"resumed lr {lr} from epoch {start_epoch}")

        for e in range(start_epoch, cfg.epochs):
            log = {}
            preds, labels = [], []
            it = train_batches(train, e)
            for bi, batch in enumerate(prefetch_to_device(it, mesh=mesh)):
                x, y = batch[0], batch[1]
                k = jax.random.fold_in(k_train, e * 100000 + bi)
                with timer:
                    params, opt_state, loss, o = train_step(params, opt_state, x, y, k)
                preds.append(o); labels.append(y)
            _epoch_metrics(preds, labels, "train", log)

            for split_name, split in (("valid", valid),) + ((("test", test),) if test else ()):
                preds, labels = [], []
                for batch in prefetch_to_device(eval_batches(split), mesh=mesh):
                    x, y = batch[0], batch[1]
                    valid_mask = batch[2] if len(batch) > 2 else np.ones(len(y), bool)
                    o = eval_step(params, x)
                    preds.append(np.asarray(o)[valid_mask]); labels.append(np.asarray(y)[valid_mask])
                _epoch_metrics(preds, labels, split_name, log)

            log["train/steps_per_sec"] = timer.per_sec()
            logger.log(log)
            final = log

            if cfg.save_period > 0 and (e + 1) % cfg.save_period == 0:
                save_checkpoint(
                    ckpt_dir, e + 1, {"params": params, "step": jnp.asarray(e + 1)}
                )
                save_state(ckpt_dir, e + 1, (params, opt_state, jnp.int32(e + 1)))
        logger.finish()
    return final


def main():
    parser = argparse.ArgumentParser()
    defaults = WorkloadConfig(project="iris-style-transfer", epochs=150, bs=128, save_period=10)
    add_common_args(parser, defaults)
    parser.add_argument(
        "--effnet_weights", type=str, default="",
        help="ported smp Unet(efficientnet-b7) npz for landmark extraction; "
        "auto-discovers models/weights/unet_efficientnet-b7.npz when omitted",
    )
    parser.add_argument(
        "--resnet_weights", type=str, default="",
        help="ported ResNet50 IMAGENET1K_V2 npz for GazeEstimator2's "
        "backbone; auto-discovers models/weights/resnet50.npz when omitted",
    )
    cfg, args = parse_config(parser, defaults)
    assert cfg.estimator in (1, 2)
    return gaze_estimation(
        cfg, effnet_weights=args.effnet_weights, resnet_weights=args.resnet_weights
    )


if __name__ == "__main__":
    main()
