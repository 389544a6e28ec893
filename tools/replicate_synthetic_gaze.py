"""Gaze-preservation replication on the synthetic twin (OpenEDS2020 analog).

Companion to ``tools/replicate_synthetic.py`` (recognition/privacy —
RESULTS.md).  This tool replicates the reference's OTHER utility claim
(``readme.md:3-4``; ``iris_style_transfer_openeds2020.py``): masked-iris
NST preserves gaze-estimation utility.  The twin's gaze is geometric
(``data/synthetic.py``: the normalized iris offset inside the sclera IS
the gaze's x/y component), so gaze estimators genuinely learn it.

  0. Train the EfficientNet-B7 U-Net segmenter on the twin's GT
     segmentations.  (The reference downloads a checkpoint trained on
     OpenEDS — ``models/efficientnet/efficientnet.py:22-24``,
     ``readme.md:35`` — so the twin's faithful analog is a twin-trained
     B7, exactly like the RITnet argument in RESULTS.md.)
  1. Train GazeEstimator1 on 19-d landmarks extracted from the trained
     B7's segmentations (the reference's estimator-1 feature path,
     ``data_preprocessing.py:378-383``) and GazeEstimator2 end-to-end
     (trainable ResNet50 backbone on frames, ``gaze_estimation.py:56-59``).
  2. Run the full 2020 privacy pipeline (``workloads/ist_openeds2020``)
     on the held-out split: pre-NST gaze -> one-for-all style NST ->
     composite -> post-NST gaze; report pre/post angular error.

    python tools/replicate_synthetic_gaze.py [--out results_gaze]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _seg_apply_chunked(params, frames, chunk=8):
    from iris_style_transfer_tpu.models import EfficientNet

    return np.concatenate(
        [
            np.asarray(EfficientNet.apply(params, jnp.asarray(frames[i : i + chunk])))
            for i in range(0, len(frames), chunk)
        ]
    )


def train_efficientnet(frames, segs, *, epochs, bs=2, lr=1e-3, seed=13):
    """Train the B7 U-Net on (frames, GT segs).  bf16 activations (the
    16 GB chip cannot hold B7's f32 backward at 416x640), eval-mode BN
    (running stats stay at init — an affine layer, fine for the twin)."""
    import optax

    from iris_style_transfer_tpu.models import EfficientNet
    from iris_style_transfer_tpu.ops.image import imagenet_normalize, pad_height

    xs = np.stack(frames)
    ys = np.stack(segs).astype(np.int32)
    n = len(xs)

    params = EfficientNet.init(jax.random.PRNGKey(seed))
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            h = jnp.repeat(x, 3, axis=-1)
            h = pad_height(h, 8, 8)
            h = imagenet_normalize(h).astype(jnp.bfloat16)
            logits = EfficientNet.logits(p, h).astype(jnp.float32)
            logits = logits[:, 8:-8, :]
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    loss = None
    for e in range(epochs):
        order = rng.permutation(n)
        for i in range(0, n - bs + 1, bs):
            idx = order[i : i + bs]
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(xs[idx]), jnp.asarray(ys[idx])
            )
        print(f"  effnet epoch {e + 1}/{epochs} loss {float(loss):.4f}", flush=True)
    return params


def train_estimator1(segs_pred, gaze, *, epochs=800, lr=1e-3, seed=21):
    """Landmarks from predicted segs -> MLP (the reference's estimator-1
    training path, ``gaze_estimation.py:56-63`` on precomputed features)."""
    import optax

    from iris_style_transfer_tpu.models import GazeEstimator1
    from iris_style_transfer_tpu.ops.ellipse import extract_eye_landmarks
    from iris_style_transfer_tpu.ops.metrics import cosine_embedding_loss

    feats = np.asarray(jax.vmap(extract_eye_landmarks)(jnp.asarray(segs_pred)))
    params = GazeEstimator1.init(jax.random.PRNGKey(seed))
    opt = optax.adam(lr)
    st = opt.init(params)

    @jax.jit
    def step(params, st, k):
        def loss_fn(p):
            o = GazeEstimator1.apply(
                p, jnp.asarray(feats), train=True, dropout_key=k
            )
            return cosine_embedding_loss(o, jnp.asarray(gaze))

        l, g = jax.value_and_grad(loss_fn)(params)
        u, st = opt.update(g, st)
        return optax.apply_updates(params, u), st, l

    for i in range(epochs):
        params, st, l = step(params, st, jax.random.fold_in(jax.random.PRNGKey(seed + 1), i))
    print(f"  estimator1 final loss {float(l):.4f}", flush=True)
    return params


def train_estimator2(frames, gaze, *, epochs=6, bs=8, lr=1e-4, seed=22):
    """End-to-end appearance-based estimator: trainable ResNet50 backbone
    on full frames (``gaze_estimation.py:56-59``)."""
    import optax

    from iris_style_transfer_tpu.models import GazeEstimator2
    from iris_style_transfer_tpu.ops.image import gray_to_rgb
    from iris_style_transfer_tpu.ops.metrics import cosine_embedding_loss

    xs = np.stack(frames)
    n = len(xs)
    params = GazeEstimator2.init(jax.random.PRNGKey(seed), extract_feature=True)
    opt = optax.adam(lr)
    st = opt.init(params)

    @jax.jit
    def step(params, st, x, y, k):
        def loss_fn(p):
            o = GazeEstimator2.apply(
                p, gray_to_rgb(x), extract_feature=True, train=True, dropout_key=k
            )
            return cosine_embedding_loss(o, y)

        l, g = jax.value_and_grad(loss_fn)(params)
        u, st = opt.update(g, st)
        return optax.apply_updates(params, u), st, l

    rng = np.random.default_rng(seed)
    loss = None
    for e in range(epochs):
        order = rng.permutation(n)
        for i in range(0, n - bs + 1, bs):
            idx = order[i : i + bs]
            params, st, loss = step(
                params, st, jnp.asarray(xs[idx]), jnp.asarray(gaze[idx]),
                jax.random.fold_in(jax.random.PRNGKey(seed + 1), e * 1000 + i),
            )
        print(f"  estimator2 epoch {e + 1}/{epochs} loss {float(loss):.4f}", flush=True)
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_train", type=int, default=160)
    ap.add_argument("--n_eval", type=int, default=32)
    ap.add_argument("--effnet_epochs", type=int, default=6)
    ap.add_argument("--ist_bs", type=int, default=8)
    ap.add_argument("--nst_epochs", type=int, default=200)
    ap.add_argument("--s_loss_weight", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args()

    from iris_style_transfer_tpu.data.synthetic import synthetic_eye_batch
    from iris_style_transfer_tpu.models import VGG19
    from iris_style_transfer_tpu.ops.image import crop_and_resize, nonzero_bbox
    from iris_style_transfer_tpu.ops.metrics import angular_distance, iou_per_class
    from iris_style_transfer_tpu.runtime import MetricLogger
    from iris_style_transfer_tpu.runtime.config import WorkloadConfig
    from iris_style_transfer_tpu.utils import prepare_dir, seed as seed_all
    from iris_style_transfer_tpu.workloads.ist_openeds2020 import (
        iris_style_transfer_openeds2020,
    )

    n = args.n_train + args.n_eval
    imgs, segs, _, gaze = synthetic_eye_batch(n, seed=args.seed, gaze=True)
    tr = slice(0, args.n_train)
    ev = slice(args.n_train, n)
    print(f"synthetic gaze twin: {args.n_train} train / {args.n_eval} eval", flush=True)

    # ---- stage 0: B7 U-Net on the twin ----
    eff_params = train_efficientnet(
        imgs[tr], segs[tr], epochs=args.effnet_epochs
    )
    segs_eval = _seg_apply_chunked(eff_params, imgs[ev])
    _, miou = iou_per_class(jnp.asarray(segs_eval), jnp.asarray(segs[ev]))
    eff_miou = float(np.nanmean(np.asarray(miou)))
    print(f"effnet trained on the twin: eval mIoU {eff_miou:.4f}", flush=True)

    # ---- stage 1: gaze estimators ----
    segs_train_pred = _seg_apply_chunked(eff_params, imgs[tr])
    g1_params = train_estimator1(segs_train_pred, gaze[tr])
    g2_params = train_estimator2(imgs[tr], gaze[tr])

    # ---- stage 2: the 2020 privacy pipeline on the held-out split ----
    seed_all(args.seed)
    vgg_params = VGG19.init(jax.random.PRNGKey(args.seed))

    # one-for-all style iris from a training frame (reference :237-249)
    @jax.jit
    def style_iris(img):
        from iris_style_transfer_tpu.models import EfficientNet

        seg = EfficientNet.apply(eff_params, img[None])[0]
        m = (seg == 2)[..., None] & (img <= 0.8)
        masked = img * m
        bb = nonzero_bbox(masked[..., 0])
        return crop_and_resize(masked, bb, (224, 224))

    s_iris = style_iris(jnp.asarray(imgs[0]))

    cfg = WorkloadConfig(project="replicate-synthetic-gaze", bs=args.ist_bs)
    save_dir = "saved/replicate_synthetic_gaze/validation/"
    prepare_dir(save_dir, idempotent=True)
    logger = MetricLogger(cfg.project, f"replicate gaze seed {args.seed}",
                          cfg.to_dict())
    log = iris_style_transfer_openeds2020(
        cfg, imgs[ev], gaze[ev], eff_params, g1_params, g2_params, vgg_params,
        s_iris, cfg.c_loss_weight, args.s_loss_weight, args.nst_epochs,
        "validation/", save_dir, logger,
    )
    logger.finish()

    # chance level: expected angular error of a random unit prediction
    # against this gaze distribution (~85-90 degrees)
    rng = np.random.default_rng(0)
    rnd = rng.normal(size=(len(gaze[ev]), 3)).astype(np.float32)
    rnd /= np.linalg.norm(rnd, axis=1, keepdims=True)
    _, chance_deg = angular_distance(jnp.asarray(rnd), jnp.asarray(gaze[ev]))

    summary = {
        "effnet/eval_miou": eff_miou,
        "pre/degree_distance1": log["validation//pre/degree_distance1"],
        "pre/degree_distance2": log["validation//pre/degree_distance2"],
        "post/degree_distance1": log["validation//post/degree_distance1"],
        "post/degree_distance2": log["validation//post/degree_distance2"],
        "chance_degree_distance": float(np.mean(np.asarray(chance_deg))),
        "stylized_images_per_min": log["validation//stylized_images_per_min"],
    }
    summary = {k: float(v) for k, v in summary.items()}
    print(json.dumps(summary, indent=2))
    if args.out:
        with open(args.out + ".json", "w") as fh:
            json.dump(summary, fh, indent=2)
    return summary


if __name__ == "__main__":
    main()
