"""Port the bundled RITnet pretrained weights (torch pkl) to a JAX npz.

Usage: python tools/port_ritnet.py [src.pkl] [dst.npz]

Reads the reference's bundled state dict (a plain torch state_dict pickle,
~250K params) and writes ``iris_style_transfer_tpu/models/weights/ritnet.npz``.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import torch  # noqa: E402

from iris_style_transfer_tpu.models.port import convert_ritnet, save_npz  # noqa: E402


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/models/weights/ritnet_pretrained.pkl"
    dst = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(__file__),
            "..",
            "iris_style_transfer_tpu",
            "models",
            "weights",
            "ritnet.npz",
        )
    )
    sd = torch.load(src, weights_only=True, map_location="cpu")
    sd = {k: v.numpy() for k, v in sd.items()}
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    params = convert_ritnet(sd)
    save_npz(dst, params)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
