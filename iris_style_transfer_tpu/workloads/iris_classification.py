"""Train iris classifiers on VGG CNN + style features (OpenEDS2019).

Reference: ``iris_classification.py`` — joint training of Classifier1 and
Classifier2 over frozen (default) VGG19 features with Adam; loss =
CE(p1, y) + CE(p2, y) (``:73``); per-epoch train + test metrics
(``cal_metrics``) logged under ``train/c1/ ... test/c2/``; checkpoints
every ``save_period`` epochs when no augmentation (``:111-113``).

TPU-native: one jitted train step over a (data, model) mesh — batch
sharded on ``data``, the 25088/4096-wide classifier matmuls optionally
tensor-parallel on ``model``; grayscale->RGB repeat happens on device for
both train and test (the reference forgot it in the test loop,
``:94-99`` — normalized here as SURVEY.md §2.1 notes).
"""

from __future__ import annotations

import argparse
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import batch_iterator, build_ir_dataset, prefetch_to_device, synthetic_openeds2019
from ..data.openeds2019 import load_data_openeds2019
from ..models import Classifier1, Classifier2, RITnet, VGG19, load_pretrained
from ..ops.image import gray_to_rgb, to_unit_float
from ..ops.metrics import classification_metrics, cross_entropy
from ..parallel import make_mesh, mlp_tp_spec, shard_params
from ..runtime import MetricLogger, StepTimer, restore_state, save_checkpoint, save_state
from ..runtime.config import WorkloadConfig, add_common_args, parse_config
from ..utils import seed as seed_all


def make_train_step(freeze_vgg: bool, optimizer, compute_dtype):
    def loss_fn(train_params, frozen_vgg, x, y, key):
        vgg_params = train_params.get("vgg", frozen_vgg)
        k1, k2 = jax.random.split(key)
        final, _, style = VGG19.apply(vgg_params, x, compute_dtype=compute_dtype)
        p1 = Classifier1.apply(train_params["c1"], final, train=True, dropout_key=k1)
        p2 = Classifier2.apply(train_params["c2"], style, train=True, dropout_key=k2)
        loss = cross_entropy(p1, y) + cross_entropy(p2, y)  # reference :73
        return loss, (p1, p2)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(train_params, opt_state, frozen_vgg, x, y, key):
        x = gray_to_rgb(to_unit_float(x))  # crops stage u16 (2x less H2D)
        (loss, (p1, p2)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            train_params, frozen_vgg, x, y, key
        )
        updates, opt_state = optimizer.update(grads, opt_state, train_params)
        train_params = optax.apply_updates(train_params, updates)
        return train_params, opt_state, loss, p1, p2

    @jax.jit
    def eval_step(train_params, frozen_vgg, x):
        vgg_params = train_params.get("vgg", frozen_vgg)
        x = gray_to_rgb(to_unit_float(x))
        final, _, style = VGG19.apply(vgg_params, x, compute_dtype=compute_dtype)
        p1 = Classifier1.apply(train_params["c1"], final)
        p2 = Classifier2.apply(train_params["c2"], style)
        return p1, p2

    return train_step, eval_step


def _load_data(cfg: WorkloadConfig):
    base = os.path.join(cfg.data_dir, "openeds2019")
    if os.path.isdir(base):
        return load_data_openeds2019(cfg.test_split_ratio, load_seg=False, data_dir=base)
    print(f"[data] {base} not found -> synthetic dataset")
    return synthetic_openeds2019(n_per_user=8, num_users=8, seed=cfg.seed)


def iris_classification(cfg: WorkloadConfig, vgg_weights: str = "") -> dict:
    key = seed_all(cfg.seed)

    train_x, train_y, _, test_x, test_y, _, num_class = _load_data(cfg)
    print("number of classes:", num_class)

    ritnet_params = RITnet.pretrained()
    k_data, k_vgg, k_c1, k_c2, k_train = jax.random.split(key, 5)
    tr_x, tr_y = build_ir_dataset(
        train_x, train_y, ritnet_params, k_data,
        cfg.rotation_prob, cfg.rotation_degree, cfg.perspect_prob, cfg.perspect_degree,
        cfg.glint_threshold,
    )
    te_x, te_y = build_ir_dataset(
        test_x, test_y, ritnet_params, jax.random.fold_in(k_data, 1),
        cfg.rotation_prob, cfg.rotation_degree, cfg.perspect_prob, cfg.perspect_degree,
        cfg.glint_threshold,
    )

    mesh = make_mesh(n_devices=cfg.n_devices or None, model_parallel=cfg.model_parallel)
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    vgg_params = load_pretrained("vgg19", vgg_weights, lambda: VGG19.init(k_vgg))
    train_params = {
        "c1": Classifier1.init(k_c1, num_class),
        "c2": Classifier2.init(k_c2, num_class=num_class),
    }
    if not cfg.freeze_vgg:
        train_params["vgg"] = vgg_params
    # place on mesh: classifier heads tensor-parallel when model_parallel>1
    spec = {"c1": mlp_tp_spec(train_params["c1"]), "c2": mlp_tp_spec(train_params["c2"])}
    if "vgg" in train_params:
        spec["vgg"] = jax.tree.map(lambda _: None, train_params["vgg"])
    train_params = shard_params(mesh, train_params, spec if cfg.model_parallel > 1 else None)
    vgg_frozen = shard_params(mesh, vgg_params)

    optimizer = optax.adam(cfg.lr)
    opt_state = optimizer.init(train_params)
    train_step, eval_step = make_train_step(cfg.freeze_vgg, optimizer, compute_dtype)

    # resumable training (the reference is save-only, SURVEY §5.3-5.4)
    ckpt_dir = "saved/checkpoints/iris_classification"
    start_epoch = 0
    if cfg.resume:
        restored = restore_state(ckpt_dir, (train_params, opt_state, jnp.int32(0)))
        if restored is not None:
            start_epoch, (train_params, opt_state, _) = restored
            train_params = jax.tree.map(jnp.asarray, train_params)
            opt_state = jax.tree.map(jnp.asarray, opt_state)
            print(f"resumed from epoch {start_epoch}")

    logger = MetricLogger(cfg.project, cfg.name or f"seed {cfg.seed}", cfg.to_dict())
    timer = StepTimer()
    final_metrics = {}

    for e in range(start_epoch, cfg.epochs):
        preds1, preds2, labels = [], [], []
        it = batch_iterator((tr_x, tr_y), cfg.bs, shuffle=True, seed=cfg.seed + e, drop_remainder=True)
        for bi, (x, y) in enumerate(prefetch_to_device(it, mesh=mesh)):
            k = jax.random.fold_in(k_train, e * 10000 + bi)
            with timer:
                train_params, opt_state, loss, p1, p2 = train_step(
                    train_params, opt_state, vgg_frozen, x, y, k
                )
            preds1.append(p1); preds2.append(p2); labels.append(y)

        log = {}
        # gather the (N, K) logits to host before the metric program: a
        # device_get of a batch-sharded array is a per-shard copy (no
        # collectives), and the jitted metrics then run as one
        # single-device program instead of riding the whole mesh
        p1 = np.concatenate(jax.device_get(preds1))
        p2 = np.concatenate(jax.device_get(preds2))
        yy = np.concatenate(jax.device_get(labels))
        for name, pred in (("c1", p1), ("c2", p2)):
            m = classification_metrics(yy, pred, num_class)
            log.update({f"train/{name}/{k}": v for k, v in m.items()})

        preds1, preds2, labels, valids = [], [], [], []
        for batch in prefetch_to_device(batch_iterator((te_x, te_y), cfg.bs), mesh=mesh):
            x, y = batch[0], batch[1]
            valid = batch[2] if len(batch) > 2 else np.ones(len(y), bool)
            p1, p2 = eval_step(train_params, vgg_frozen, x)
            # keep logits on device; ONE gather per epoch (each np.asarray
            # costs ~150 ms of tunnel latency, tools/perf_probe22.py)
            preds1.append(p1); preds2.append(p2)
            labels.append(np.asarray(y)); valids.append(valid)
        valid = np.concatenate(valids)
        p1 = np.concatenate(jax.device_get(preds1))[valid]
        p2 = np.concatenate(jax.device_get(preds2))[valid]
        yy = np.concatenate(labels)[valid]
        for name, pred in (("c1", p1), ("c2", p2)):
            m = classification_metrics(yy, pred, num_class)
            log.update({f"test/{name}/{k}": v for k, v in m.items()})
        log["train/steps_per_sec"] = timer.per_sec()
        logger.log(log)
        final_metrics = log

        # checkpoint under the reference's conditions (:111-113), plus the
        # full optimizer state for resume
        if (
            cfg.save_period > 0
            and cfg.rotation_prob == cfg.perspect_prob == 0
            and (e + 1) % cfg.save_period == 0
        ):
            save_checkpoint(
                ckpt_dir, e + 1, {"params": train_params, "step": jnp.asarray(e + 1)}
            )
            save_state(ckpt_dir, e + 1, (train_params, opt_state, jnp.int32(e + 1)))

    logger.finish()
    return {k: float(v) for k, v in final_metrics.items()}


def main():
    parser = argparse.ArgumentParser()
    defaults = WorkloadConfig(project="iris-style-transfer", epochs=500, bs=64, lr=1e-5)
    add_common_args(parser, defaults)
    parser.add_argument(
        "--vgg_weights", type=str, default="",
        help="ported VGG19 IMAGENET1K_V1 npz; auto-discovers "
        "models/weights/vgg19.npz when omitted",
    )
    cfg, args = parse_config(parser, defaults)
    cfg.name = f"seed {cfg.seed} rd {cfg.rotation_degree} pd {cfg.perspect_degree} lr {cfg.lr}"
    return iris_classification(cfg, vgg_weights=args.vgg_weights)


if __name__ == "__main__":
    main()
