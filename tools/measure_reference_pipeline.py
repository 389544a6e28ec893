"""Banded A100 wall-clock model for the reference's FULL OpenEDS2019
masked-iris sweep (round-3 VERDICT next-step #1) — the denominator of the
north-star claim ("≥20x the A100 reference wall-clock on v5e-8",
BASELINE.json).

``tools/measure_reference_cpu.py`` validated the NST *closure* model by
running the reference's actual torch ``nst()`` on this CPU.  This tool
extends the model to the whole 2019 sweep, whose structure (read from the
reference's own code) is

  dataset build, PER IMAGE (``data_preprocessing.py:160-199``):
    2x RITnet calls (content + style donor), each = host CLAHE round trip
    (``models/ritnet/ritnet.py:88-97``: device->cpu, cv2 LUT + CLAHE,
    normalize, ->device) + batch-1 DenseNet2D forward; plus IoU, masks,
    bbox, crop/resize, eager-op glue.
  batch loop, PER bs-64 BATCH (``iris_style_transfer_openeds2019.py``):
    VGG fwd + 4x sklearn ``cal_metrics`` (pre, ``:82-90``);
    200 closures of joint-batch LBFGS at (64,3,224,224) with per-closure
    ``.cpu()``/``.item()`` syncs (``pipelines.py:93-95``);
    a 64-iteration python composite loop (``:114-136``);
    VGG fwd + 4x sklearn (post, ``:144-152``);
    a 64-iteration python RE-SEGMENTATION loop — 64 more per-image RITnet
    calls incl. the CLAHE round trip (``:155-162``) — + ``cal_IoUs``.

Every HOST term is measured by running the reference's actual code on
this box (cv2 CLAHE transform, DenseNet2D forward, the 8-call sklearn
block); every GPU term uses the FLOP/bandwidth model whose conv part was
validated by measure_reference_cpu.py, with the same documented A100
utilization band.  Host terms carry their own band ([0.4, 1.0] x this
box) because the reference host is a 128-core EPYC 7763 with faster
single-thread than this 1-core VM.

Usage:
    python tools/measure_reference_pipeline.py [--v5e_full_ipm 275.3]
Writes tools/a100_pipeline_baseline.json (merged into BENCH_extra.json by
bench.py) and prints the JSON block; interpretation lives in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(__file__))
from measure_reference_cpu import (  # noqa: E402
    _install_stubs,
    closure_flops,
    conv_microbench,
    VGG19_CFG_E,
)

REF = "/root/reference"

N_IMAGES = 2552  # ~20% of 12,759 (appendix Table 5; per-user 80/20 split)
BS = 64
N_BATCHES = (N_IMAGES + BS - 1) // BS
N_CLOSURES = 200
NUM_CLASS = 152

A100_PEAK_TF32 = 156e12
A100_HBM = 1.5e12  # bytes/s effective
PCIE = 12e9  # bytes/s effective (gen4 x16 with overheads)


def vgg_fwd_flops(batch: int, size: int) -> float:
    """Forward-only FLOPs of the full 16-conv VGG19 feature stack (the
    reference never truncates — ``models/vgg/vgg.py:70-80``)."""
    fwd, c_in, h = 0.0, 3, size
    for v in VGG19_CFG_E:
        if v == "M":
            h //= 2
            continue
        fwd += 2 * c_in * v * 9 * h * h * batch
        c_in = v
    return fwd


def count_conv_flops(model: torch.nn.Module, x: torch.Tensor) -> float:
    """2*MACs of every Conv2d in one forward at ``x``'s shape (hooks)."""
    flops = [0.0]
    hooks = []

    def hook(mod, inp, out):
        cin = mod.in_channels // mod.groups
        k = mod.kernel_size[0] * mod.kernel_size[1]
        flops[0] += 2.0 * cin * mod.out_channels * k * out.shape[-2] * out.shape[-1] * out.shape[0]

    for m in model.modules():
        if isinstance(m, torch.nn.Conv2d):
            hooks.append(m.register_forward_hook(hook))
    with torch.no_grad():
        model(x)
    for h in hooks:
        h.remove()
    return flops[0]


def timed(fn, reps: int = 5, warmup: int = 2) -> float:
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--v5e_full_ipm", type=float, default=None,
        help="measured v5e-1 full-pipeline images/min (tools/perf_probe18.py); "
        "omit to emit the A100 side only",
    )
    args = ap.parse_args()

    _install_stubs()
    sys.path.insert(0, REF)
    from models.ritnet.ritnet import RITnet, RITnet_transform  # reference code
    from utils import cal_metrics  # reference code

    torch.manual_seed(0)
    out: dict = {"modeled": True, "date": time.strftime("%Y-%m-%d")}

    # ---- host terms, measured by running the reference's own code ----
    ritnet = RITnet(
        pretrained_path=os.path.join(REF, "models/weights/ritnet_pretrained.pkl")
    )
    ritnet.eval()
    x_frame = torch.rand(1, 400, 640)

    t_transform = timed(lambda: ritnet.t(x_frame))  # cv2 LUT + CLAHE + normalize
    t_rit_fwd_cpu = timed(lambda: ritnet(x_frame), reps=3)
    rit_flops = count_conv_flops(ritnet.model, ritnet.t(x_frame))

    # the 8-call sklearn block the loop pays per batch (4 pre + 4 post)
    rng = np.random.default_rng(0)
    logits = torch.from_numpy(rng.standard_normal((BS, NUM_CLASS)).astype(np.float32))
    labels = torch.from_numpy(rng.integers(0, NUM_CLASS, BS))

    def sk_block():
        d: dict = {}
        for _ in range(8):
            cal_metrics(labels, logits, d, "x/")

    t_sklearn8 = timed(sk_block, reps=3)

    # FLOP-model sanity on this box: measured batch-1 forward vs
    # flops / measured_conv_flops (same validation shape as the closure
    # check in measure_reference_cpu.py)
    cpu_flops = conv_microbench(torch.get_num_threads())
    model_fwd = rit_flops / cpu_flops
    out["host_measured"] = {
        "clahe_transform_ms": round(t_transform * 1e3, 2),
        "ritnet_fwd_b1_cpu_ms": round(t_rit_fwd_cpu * 1e3, 2),
        "ritnet_conv_flops": rit_flops,
        "ritnet_fwd_model_over_measured": round(
            model_fwd / max(t_rit_fwd_cpu - t_transform, 1e-9), 2
        ),
        "sklearn_8call_block_ms": round(t_sklearn8 * 1e3, 1),
        "cpu_conv_flops_per_sec": cpu_flops,
    }

    # ---- A100 model ----
    # band order: optimistic_for_ref = everything breaks the reference's
    # way (fast GPU util, fast EPYC host, low overheads); pessimistic the
    # reverse.  Ratios derived from these bands bracket the truth.
    #
    # Round-5 band revision (VERDICT weak #2: "the A100 band is wide
    # enough to flip the verdict ... nothing validates the host factor"):
    #  * util floor 0.30 -> 0.40.  The per-closure serialization that
    #    makes real-world util land low (the 38 MB ``x.detach().cpu()``
    #    + 2x ``.item()`` queue drains every closure, pipelines.py:93-95)
    #    is priced SEPARATELY by the sync and PCIe terms here, so util is
    #    the PURE device efficiency of cudnn TF32 VGG convs at bs64/224px
    #    — VGG is cudnn's birth workload, and this framework's own XLA
    #    closure achieves 52% of v5e peak on the same mix (probe9 bs64:
    #    ~102 of 197 TFLOP/s); pricing cudnn below 0.40 on its
    #    best-case shapes double-counts the serialization.
    #  * the host knob is kept at [0.4, 1.0] UNVALIDATED — and shown not
    #    to matter: ``host_term_totals`` below prices everything it
    #    multiplies (CLAHE transforms + sklearn blocks) at ~0.5 min of a
    #    ~14 min sweep, so even a 128-core EPYC running them at zero cost
    #    cannot flip the verdict.  The multi-thread scaling curve the
    #    round-4 VERDICT asked for is unmeasurable on this 1-core box;
    #    this accounting replaces it.
    #  * PNG decode is excluded on BOTH sides of the ratio: the reference
    #    decodes in load_data_openeds2019 (PIL, before the timed sweep;
    #    its DataLoader(num_workers=16) hides decode only in the 2020
    #    gaze loaders), and the v5e pipeline number times synthetic
    #    in-RAM frames.
    bands = {
        "optimistic_for_ref": dict(util=0.60, host=0.4, eager=0.5, sync=0.010),
        "central": dict(util=0.50, host=0.7, eager=1.0, sync=0.015),
        "pessimistic_for_ref": dict(util=0.40, host=1.0, eager=2.0, sync=0.022),
    }

    flops_closure = closure_flops(BS, 224)
    # elementwise HBM traffic per closure: relu/pool/normalize fwd+bwd
    # activations scale with pixel count vs the validated bs4-512px 5GB
    elementwise_bytes = 5e9 * (BS * 224 * 224) / (4 * 512 * 512)
    sync_bytes = BS * 3 * 224 * 224 * 4  # x.detach().cpu() every closure

    vgg_fwd = vgg_fwd_flops(BS, 224)
    # per-image eager glue: ~8 small GPU ops (mask mul, bbox, crop, resize)
    # at ~100us launch+sync each — scaled by the band's eager factor
    EAGER_IMG = 0.8e-3
    # PCIe round trip of one 400x640 f32 frame each way + launch gaps
    frame_bytes = 400 * 640 * 4

    def band_eval(b: dict) -> dict:
        conv = lambda f: f / (b["util"] * A100_PEAK_TF32)
        # one per-image RITnet call = host CLAHE + 2x PCIe + b1 forward
        # (+ its own activation traffic, ~40 tensors x 32ch x 400x640 f32)
        t_rit_call = (
            t_transform * b["host"]
            + 2 * frame_bytes / PCIE
            + conv(rit_flops)
            + 1.3e9 / A100_HBM
            + 40 * 10e-6 * b["eager"]  # ~40 kernel launches
        )
        # dataset build: 2 RITnet calls + IoU/mask/bbox/crop glue per image
        t_build_img = 2 * t_rit_call + 10 * EAGER_IMG * b["eager"]
        t_build = N_IMAGES * t_build_img

        # one NST closure
        t_closure = (
            conv(flops_closure)
            + elementwise_bytes / A100_HBM
            + sync_bytes / PCIE
            + b["sync"]  # .item() x2 queue drains + LBFGS python bookkeeping
        )
        # per batch: pre VGG+heads, 200 closures, composite loop, post
        # VGG+heads, re-seg loop, sklearn blocks, cal_IoUs (elementwise)
        t_batch = (
            2 * (conv(vgg_fwd) + 2e-3)
            + N_CLOSURES * t_closure
            + BS * 8 * 80e-6 * b["eager"]  # composite: ~8 eager ops/img
            + BS * t_rit_call
            + t_sklearn8 * b["host"]
            + 4 * BS * 400 * 640 * 4 / A100_HBM  # cal_IoUs elementwise
        )
        t_loop = N_BATCHES * t_batch
        total_min = (t_build + t_loop) / 60.0
        return {
            "ritnet_call_ms": round(t_rit_call * 1e3, 2),
            "build_min": round(t_build / 60.0, 2),
            "closure_ms": round(t_closure * 1e3, 2),
            "batch_s": round(t_batch, 2),
            "loop_min": round(t_loop / 60.0, 2),
            "total_min": round(total_min, 2),
            "images_per_min": round(N_IMAGES / total_min, 1),
        }

    results = {name: band_eval(b) for name, b in bands.items()}
    out["a100_full_sweep"] = {
        "n_images": N_IMAGES,
        "bs": BS,
        "n_closures": N_CLOSURES,
        "band": results,
    }

    # ---- sensitivity: which knob owns the band spread (round-4 VERDICT
    # weak #2).  One-at-a-time: move each knob alone from its central
    # value to each edge and record the total_min swing. ----
    central = bands["central"]
    total_central = results["central"]["total_min"]
    sens = {}
    for knob in ("util", "host", "eager", "sync"):
        row = {}
        for edge in ("optimistic_for_ref", "pessimistic_for_ref"):
            bb = dict(central)
            bb[knob] = bands[edge][knob]
            row[edge] = round(band_eval(bb)["total_min"] - total_central, 2)
        sens[knob] = row
    out["sensitivity_total_min_delta"] = sens
    spread = (results["pessimistic_for_ref"]["total_min"]
              - results["optimistic_for_ref"]["total_min"])
    owner = max(
        sens, key=lambda k: abs(sens[k]["pessimistic_for_ref"])
        + abs(sens[k]["optimistic_for_ref"])
    )
    out["band_spread_min"] = round(spread, 2)
    out["band_spread_owner"] = owner

    # ---- everything the UNVALIDATED host knob multiplies, at host=1.0
    # (this box's single core): the hard ceiling on what a 128-core EPYC
    # running these terms at ZERO cost could change ----
    n_transform_calls = N_IMAGES * 2 + N_BATCHES * BS  # build + re-seg loop
    host_total_s = n_transform_calls * t_transform + N_BATCHES * t_sklearn8
    out["host_term_totals"] = {
        "clahe_transform_calls": n_transform_calls,
        "clahe_total_s_at_host1": round(n_transform_calls * t_transform, 1),
        "sklearn_total_s_at_host1": round(N_BATCHES * t_sklearn8, 1),
        "host_knob_ceiling_min": round(host_total_s / 60.0, 2),
        "note": (
            "the host factor multiplies only these terms; even at zero "
            "cost it moves the sweep by at most host_knob_ceiling_min"
        ),
    }

    if args.v5e_full_ipm:
        v5e1_min = N_IMAGES / args.v5e_full_ipm
        out["v5e"] = {
            "v5e1_measured_images_per_min": args.v5e_full_ipm,
            "v5e1_sweep_min": round(v5e1_min, 2),
            # linear-scaling projection: the pipeline is batch-sharded over
            # the data axis end to end (dataset build chunks, classify,
            # joint NST, re-seg); per-chip batch 8 at bs64 keeps every
            # stage's per-chip shapes efficient.  PROJECTION, not a
            # measurement — no multi-chip hardware in this environment.
            "v5e8_projected_sweep_min": round(v5e1_min / 8, 2),
        }
        out["ratio_vs_a100"] = {
            name: {
                "v5e1": round(r["total_min"] / v5e1_min, 2),
                "v5e8_projected": round(r["total_min"] / (v5e1_min / 8), 2),
            }
            for name, r in results.items()
        }

    path = os.path.join(os.path.dirname(__file__), "a100_pipeline_baseline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
