"""Port torch checkpoints to JAX npz pytrees.

Usage:
    python tools/port_weights.py vgg19 <vgg19-torch.pth> <out.npz>
    python tools/port_weights.py resnet50 <resnet50.pth> <out.npz>
    python tools/port_weights.py efficientnet_unet <unet_efficientnet-b7.pt> <out.npz>
    python tools/port_weights.py classifier1|classifier2|gaze <head.pth> <out.npz>

Sources: torchvision hub checkpoints (VGG19 IMAGENET1K_V1, ResNet50
IMAGENET1K_V2), the smp Unet(efficientnet-b7) checkpoint from the
reference's readme (``readme.md:35``), and the reference's own trained
head checkpoints.  Zero-egress environments simply skip this step and use
the deterministic seeded inits.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import torch  # noqa: E402

from iris_style_transfer_tpu.models import port  # noqa: E402

CONVERTERS = {
    "vgg19": port.convert_vgg19,
    "resnet50": port.convert_resnet50,
    "efficientnet_unet": port.convert_efficientnet_unet,
    "classifier1": port.convert_classifier1,
    "classifier2": port.convert_classifier2,
    "gaze": port.convert_gaze_estimator,
    "ritnet": port.convert_ritnet,
}


def main():
    kind, src, dst = sys.argv[1], sys.argv[2], sys.argv[3]
    obj = torch.load(src, weights_only=False, map_location="cpu")
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = {k.removeprefix("module."): v for k, v in obj["state_dict"].items()}
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in obj.items()}
    params = CONVERTERS[kind](sd)
    port.save_npz(dst, params)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
