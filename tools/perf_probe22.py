"""Round-3 probe: attribute the IST dataset build's ~107 ms/img
(tools/perf_probe18.py after the de-gather round) across its stages.

The per-chunk model (dispatch + u8 H2D + RITnet-at-32 + D2H of
masks/crops) prices the build at ~30 ms/img; this probe times each stage
at the production shapes to find the other ~70:

  - host prep: per-chunk np.stack + quantize_u8 over 256 frames
  - H2D only: device_put of one u8 chunk (32, 400, 640, 1)
  - program only: the build's jitted process() on pre-staged inputs
  - D2H only: np.asarray of the 5 outputs of one chunk
  - full build_ist_dataset() (the measured end-to-end)
  - final assembly: np.stack(c_imgs) + quantize + donor sampling

    python tools/perf_probe22.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from iris_style_transfer_tpu.runtime.cache import enable_compile_cache

enable_compile_cache()

N = 256
CHUNK = 32


def main():
    from iris_style_transfer_tpu.data.synthetic import synthetic_eye_batch
    from iris_style_transfer_tpu.data.openeds2019 import build_ist_dataset
    from iris_style_transfer_tpu.models import RITnet
    from iris_style_transfer_tpu.pipelines.iris import iris_mask_from_seg
    from iris_style_transfer_tpu.ops.image import (
        crop_and_resize,
        nonzero_bbox,
        quantize_u8,
        to_unit_float,
    )
    from iris_style_transfer_tpu.ops.metrics import iou_per_class

    print("backend:", jax.default_backend(), flush=True)
    ritnet = RITnet.pretrained()

    imgs, segs, users = synthetic_eye_batch(N, 400, 640, num_users=8, seed=0)
    # the loaders now hand out uint8 frames (files' native depth) — feed the
    # build the same contract so host prep measures the real path
    imgs = np.round(np.clip(imgs, 0.0, 1.0) * 255.0).astype(np.uint8)
    c_imgs, ys, c_gts = list(imgs), [int(u) for u in users], list(segs)

    # --- host prep ---
    t0 = time.perf_counter()
    staged = []
    for i in range(0, N, CHUNK):
        batch = quantize_u8(np.stack(c_imgs[i : i + CHUNK]))
        g = np.stack(c_gts[i : i + CHUNK]).astype(np.uint8)
        staged.append((batch, g))
    t_prep = time.perf_counter() - t0
    print(f"host prep (stack+quantize, {N} imgs)      {t_prep*1e3:8.1f} ms", flush=True)

    # --- H2D only ---
    t0 = time.perf_counter()
    dev = [(jax.device_put(b), jax.device_put(g)) for b, g in staged]
    jax.block_until_ready([d for pair in dev for d in pair])
    t_h2d = time.perf_counter() - t0
    print(f"H2D ({len(staged)} u8 chunks of {CHUNK})             {t_h2d*1e3:8.1f} ms", flush=True)

    # --- the build's program, pre-staged ---
    @jax.jit
    def process(batch, seg_gt):
        batch = to_unit_float(batch)
        seg = RITnet.apply(ritnet, batch)
        ious, miou = iou_per_class(seg, seg_gt)
        masks = iris_mask_from_seg(seg, batch, 0.8)
        masked = batch * masks.astype(batch.dtype)
        bboxes = jax.vmap(lambda m: nonzero_bbox(m[..., 0]))(masked)
        crops = jax.vmap(lambda im, bb: crop_and_resize(im, bb, (224, 224)))(masked, bboxes)
        return ious, miou, masks, bboxes, crops

    outs = process(*dev[0])
    jax.block_until_ready(outs)  # compile
    t0 = time.perf_counter()
    all_outs = [process(b, g) for b, g in dev]
    jax.block_until_ready(all_outs)
    t_prog = time.perf_counter() - t0
    print(f"program only ({len(dev)} chunks, staged)       {t_prog*1e3:8.1f} ms", flush=True)

    # --- D2H only ---
    t0 = time.perf_counter()
    host_outs = [tuple(map(np.asarray, o)) for o in all_outs]
    t_d2h = time.perf_counter() - t0
    print(f"D2H (5 outputs x {len(all_outs)} chunks)           {t_d2h*1e3:8.1f} ms", flush=True)
    del host_outs

    # --- final assembly ---
    t0 = time.perf_counter()
    _ = quantize_u8(np.stack(c_imgs))
    _ = np.stack(c_gts).astype(np.uint8)
    t_asm = time.perf_counter() - t0
    print(f"final assembly (stack+quantize {N})       {t_asm*1e3:8.1f} ms", flush=True)

    # --- end-to-end build ---
    t0 = time.perf_counter()
    ds = build_ist_dataset(c_imgs, ys, c_gts, ritnet)
    t_full = time.perf_counter() - t0
    print(f"build_ist_dataset end-to-end              {t_full*1e3:8.1f} ms"
          f"  ({N / t_full:.1f} img/s, {t_full/N*1e3:.1f} ms/img)", flush=True)
    acc = t_prep + t_h2d + t_prog + t_d2h + t_asm
    print(f"sum of stages                             {acc*1e3:8.1f} ms "
          f"(unattributed {max(t_full-acc,0)*1e3:.1f} ms)", flush=True)
    assert len(ds) == N


if __name__ == "__main__":
    main()
