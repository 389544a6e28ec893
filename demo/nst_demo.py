"""Classic Gatys NST demo — the minimum end-to-end slice (SURVEY.md §7).

Equivalent of the reference's ``nst.ipynb`` role: style-transfer any
content/style image pair (e.g. tubingen + starry_night at 256px, 200
steps).  Runs on CPU or TPU.

    python demo/nst_demo.py --content path/to/content.jpg \
        --style path/to/style.jpg --size 256 --epochs 200 --out out.png

Without --content/--style it synthesizes procedural images so the demo is
self-contained (the reference's bundled images stay in the reference).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def load_image(path: str | None, size: int, seed: int) -> np.ndarray:
    if path:
        from PIL import Image

        img = Image.open(path).convert("RGB").resize((size, size), Image.BILINEAR)
        return np.asarray(img, np.float32) / 255.0
    # procedural fallback
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    base = np.stack(
        [np.sin(6 * yy + seed), np.cos(5 * xx - seed), np.sin(4 * (xx + yy))], axis=-1
    )
    return np.clip(0.5 + 0.35 * base + rng.normal(0, 0.05, (size, size, 3)), 0, 1).astype(
        np.float32
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--content", type=str, default="")
    p.add_argument("--style", type=str, default="")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--cw", type=float, default=1.0)
    p.add_argument("--sw", type=float, default=1.0)
    p.add_argument("--optimizer", type=str, default="lbfgs", choices=["lbfgs", "adam"])
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--gram", action="store_true", help="Gram style loss instead of BN")
    p.add_argument("--out", type=str, default="nst_out.png")
    args = p.parse_args()

    import jax.numpy as jnp
    import jax

    from iris_style_transfer_tpu.models import VGG19, load_pretrained
    from iris_style_transfer_tpu.transfer import nst

    c = jnp.asarray(load_image(args.content, args.size, 1))[None]
    s = jnp.asarray(load_image(args.style, args.size, 2))[None]
    # ported torchvision weights when present (models/weights/vgg19.npz or
    # --; tools/port_weights.py), seeded He init otherwise
    params = load_pretrained("vgg19", init_fn=lambda: VGG19.init(jax.random.PRNGKey(0)))

    lr = args.lr if args.lr is not None else (1.0 if args.optimizer == "lbfgs" else 0.02)
    t0 = time.time()
    res = nst(
        c, s, params,
        BN_loss=not args.gram,
        c_loss_weight=args.cw, s_loss_weight=args.sw,
        epochs=args.epochs, optimizer=args.optimizer, lr=lr,
    )
    res.x.block_until_ready()
    dt = time.time() - t0
    print(f"{args.epochs} steps in {dt:.2f}s ({args.epochs / dt:.1f} steps/s, incl. compile)")
    print(f"c_loss {float(res.c_loss_hist[-1]):.5g}  s_loss {float(res.s_loss_hist[-1]):.5g}")

    from PIL import Image

    out = np.asarray(np.clip(np.asarray(res.x[0]), 0, 1) * 255, np.uint8)
    Image.fromarray(out).save(args.out)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
