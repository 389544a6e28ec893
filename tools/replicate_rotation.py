"""Replicate the paper's ROBUSTNESS claim on the synthetic twin: style
features identify users more robustly under rotation / perspective
distortion than CNN features.

This is the half of reference claim 1 (``readme.md:4``: "rotation/
perspective-robust basis for iris identification"; appendix Figs. 8-9 —
rasterized, so no numbers to match) that ``tools/replicate_synthetic.py``
does not cover: that page shows identity is recoverable and NST destroys
it; this page shows HOW the two feature types degrade as the test irises
are rotated / perspective-warped.

Protocol — eval-only, reusing the stage-1 checkpoints of
``replicate_synthetic.py`` (pass ``--ckpt``):

  1. Rebuild the same twin (same seed) and the same seeded VGG19.
  2. Masked-crop the held-out test irises from the GROUND-TRUTH
     segmentations.  (Stage 0's twin-trained RITnet is not checkpointed;
     at its 0.996 train mIoU the GT masks are the same masks, and using
     GT isolates the claim under test from segmentation error.)
  3. For each distortion level, warp the 224^2 crops with the SAME warp
     ops the training augmentation uses (``ops/image.py:rotate`` /
     ``perspective_warp``, torchvision conventions; the reference
     augments with torchvision transforms v2, ``data_preprocessing.py:
     59-65``), symmetric +-angle draws averaged.
  4. Classify with BOTH heads; report accuracy and retention
     (acc at level / acc at 0) per feature type.

Claim replicated iff Classifier2's (style/BN statistics,
``classifiers.py:38-72``) retention stays above Classifier1's (CNN
features) as distortion grows.

    python tools/replicate_rotation.py --ckpt saved/checkpoints/iris_classification \
        [--angles 0,15,30,45,90,180 --pers 0,0.2,0.4,0.6 --out results_rotation]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def masked_test_crops(test_x, test_m, glint_threshold=0.8, out_size=(224, 224), chunk=8):
    """GT-seg analog of ``data/openeds2019.py:build_ir_dataset``: iris mask
    (class 2 x glint) -> crop -> resize, batched on device."""
    from iris_style_transfer_tpu.ops.image import crop_and_resize, nonzero_bbox
    from iris_style_transfer_tpu.pipelines.iris import iris_mask_from_seg

    @jax.jit
    def process(batch, segs):
        masks = iris_mask_from_seg(segs, batch, glint_threshold)
        masked = batch * masks.astype(batch.dtype)
        bboxes = jax.vmap(lambda m: nonzero_bbox(m[..., 0]))(masked)
        return jax.vmap(lambda im, bb: crop_and_resize(im, bb, out_size))(masked, bboxes)

    out = []
    n = len(test_x)
    for i in range(0, n, chunk):
        xs = test_x[i : i + chunk]
        ms = test_m[i : i + chunk]
        pad = chunk - len(xs)
        batch = np.stack(list(xs) + [xs[-1]] * pad)
        segs = np.stack(list(ms) + [ms[-1]] * pad).astype(np.int32)
        crops = np.asarray(process(jnp.asarray(batch), jnp.asarray(segs)))
        out.append(crops[: len(xs)])
    return np.concatenate(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", type=str, default="saved/checkpoints/iris_classification")
    ap.add_argument("--users", type=int, default=8)
    ap.add_argument("--n_per_user", type=int, default=24)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--angles", type=str, default="0,15,30,45,90,180")
    ap.add_argument("--pers", type=str, default="0,0.2,0.4,0.6")
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--crop_size", type=int, default=224,
                    help="masked-crop resolution (smaller = smoke tests)")
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args()

    from iris_style_transfer_tpu.data.synthetic import synthetic_openeds2019
    from iris_style_transfer_tpu.models import Classifier1, Classifier2, VGG19
    from iris_style_transfer_tpu.ops.image import (
        gray_to_rgb,
        perspective_warp,
        random_perspective_params,
        rotate,
    )
    from iris_style_transfer_tpu.runtime import restore_params
    from iris_style_transfer_tpu.utils import seed as seed_all

    data = synthetic_openeds2019(
        n_per_user=args.n_per_user, num_users=args.users, seed=args.seed
    )
    _, _, _, test_x, test_y, test_m, num_class = data
    labels = np.asarray(test_y)
    print(f"twin test split: {len(test_x)} frames, {num_class} users")

    crops = masked_test_crops(
        test_x, test_m, out_size=(args.crop_size, args.crop_size)
    )  # (N, crop, crop, 1)
    print(f"masked GT-seg crops: {crops.shape}")

    # same seeded VGG as the training stage (replicate_synthetic.py:163-165)
    key = seed_all(args.seed)
    _, k_vgg, _, _, _ = jax.random.split(key, 5)
    vgg_params = VGG19.init(k_vgg)
    heads = restore_params(args.ckpt)

    @jax.jit
    def classify(x):
        final, _, style = VGG19.apply(vgg_params, gray_to_rgb(x))
        p1 = Classifier1.apply(heads["c1"], final)
        p2 = Classifier2.apply(heads["c2"], style)
        return jnp.argmax(p1, -1), jnp.argmax(p2, -1)

    @jax.jit
    def warp_rot(x, ang):
        return jax.vmap(lambda im: rotate(im, ang, mode="nearest"))(x)

    @jax.jit  # sp/ep as traced args: ONE compile across all (dist, rep) pairs
    def _warp_pers_jit(x, sp, ep):
        return jax.vmap(lambda im: perspective_warp(im, sp, ep))(x)

    def warp_pers(x, distortion, key):
        if distortion == 0.0:
            return x
        h, w = x.shape[1:3]
        sp, ep = random_perspective_params(key, h, w, distortion)
        return _warp_pers_jit(x, sp, ep)

    def accuracy(batches):
        pred1, pred2 = [], []
        n = len(crops)
        for i in range(0, n, args.chunk):
            b = batches[i : i + args.chunk]
            pad = args.chunk - len(b)
            b = np.concatenate([b, b[-1:].repeat(pad, 0)]) if pad else b
            a1, a2 = classify(jnp.asarray(b))
            pred1.append(np.asarray(a1)[: min(args.chunk, n - i)])
            pred2.append(np.asarray(a2)[: min(args.chunk, n - i)])
        p1 = np.concatenate(pred1)
        p2 = np.concatenate(pred2)
        return float((p1 == labels).mean()), float((p2 == labels).mean())

    results = {"chance": 1.0 / num_class}
    rows = []

    for ang in [float(a) for a in args.angles.split(",")]:
        if ang == 0.0:
            a1, a2 = accuracy(crops)
        else:  # symmetric draws, averaged (training aug is U(-d, d))
            accs = [
                accuracy(np.asarray(warp_rot(jnp.asarray(crops), jnp.float32(s * ang))))
                for s in (+1, -1)
            ]
            a1, a2 = (np.mean([x[0] for x in accs]), np.mean([x[1] for x in accs]))
        results[f"rot/{ang:g}/c1"] = float(a1)
        results[f"rot/{ang:g}/c2"] = float(a2)
        rows.append(("rot", ang, a1, a2))
        print(f"rotation {ang:5g} deg: c1 {a1:.3f}  c2 {a2:.3f}", flush=True)

    for dist in [float(p) for p in args.pers.split(",")]:
        if dist == 0.0:
            a1, a2 = accuracy(crops)
        else:
            accs = [
                accuracy(np.asarray(warp_pers(
                    jnp.asarray(crops), dist, jax.random.PRNGKey(100 + rep))))
                for rep in range(2)
            ]
            a1, a2 = (np.mean([x[0] for x in accs]), np.mean([x[1] for x in accs]))
        results[f"pers/{dist:g}/c1"] = float(a1)
        results[f"pers/{dist:g}/c2"] = float(a2)
        rows.append(("pers", dist, a1, a2))
        print(f"perspective {dist:4g}: c1 {a1:.3f}  c2 {a2:.3f}", flush=True)

    # retention = acc(level)/acc(0) per head; the claim is c2 >= c1 as
    # distortion grows
    for kind in ("rot", "pers"):
        base = [(a1, a2) for k, lv, a1, a2 in rows if k == kind and lv == 0]
        if not base:
            continue
        b1, b2 = base[0]
        for k, lv, a1, a2 in rows:
            if k != kind or lv == 0:
                continue
            results[f"{kind}/{lv:g}/retention_c1"] = float(a1 / max(b1, 1e-9))
            results[f"{kind}/{lv:g}/retention_c2"] = float(a2 / max(b2, 1e-9))

    print(json.dumps(results, indent=2))
    if args.out:
        with open(args.out + ".json", "w") as fh:
            json.dump(results, fh, indent=2)
    return results


if __name__ == "__main__":
    main()
