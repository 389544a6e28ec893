"""Single-image iris style transfer demo — the ``iris_style_transfer.ipynb``
equivalent.

End to end: two eye images -> RITnet mask+crop both irises -> NST with
``c_loss_weight=0, s_loss_weight=1`` -> composite the stylized iris back
into the content eye.  Saves before/after PNGs.

    python demo/iris_nst_demo.py [--content eye1.png --style eye2.png]

Without image args it auto-discovers the reference's bundled real eye
crops (``/root/reference/images/000000339816.png`` content +
``000000240703.png`` style — the exact pair ``iris_style_transfer.ipynb``
cells 1-4 composite), falling back to synthetic eyes so the demo stays
self-contained.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--content", type=str, default="")
    p.add_argument("--style", type=str, default="")
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--outdir", type=str, default="saved/iris_demo")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from iris_style_transfer_tpu.data import synthetic_eye_batch
    from iris_style_transfer_tpu.models import RITnet, VGG19, load_pretrained
    from iris_style_transfer_tpu.ops.image import gray_to_rgb
    from iris_style_transfer_tpu.pipelines import composite_batch, mask_and_crop_iris
    from iris_style_transfer_tpu.transfer import nst

    os.makedirs(args.outdir, exist_ok=True)

    # the notebook's real eye-crop pair, when present (read-only); only
    # fill in what the user did NOT supply — a user --style must never be
    # silently replaced
    ref_imgs = "/root/reference/images"
    if not args.content and os.path.exists(f"{ref_imgs}/000000339816.png"):
        args.content = f"{ref_imgs}/000000339816.png"
        if not args.style:
            args.style = f"{ref_imgs}/000000240703.png"
        print(f"using reference eye crops from {ref_imgs}")

    def load(path, seed):
        if path:
            img = Image.open(path).convert("L")
            arr = np.asarray(img, np.float32)[..., None] / 255.0
            # RITnet's U-Net needs /16-divisible extents for its skip
            # concats; pad user images up (reflect) like the B7 shell pads
            # 400 -> 416 (models/efficientnet.py:pad_height)
            ph = (-arr.shape[0]) % 16
            pw = (-arr.shape[1]) % 16
            if ph or pw:
                print(f"padding {arr.shape[:2]} by ({ph}, {pw}) to /16-divisible")
                arr = np.pad(arr, ((0, ph), (0, pw), (0, 0)), mode="reflect")
            return arr
        return synthetic_eye_batch(1, height=400, width=640, seed=seed)[0][0]

    c_eye = jnp.asarray(load(args.content, 1))[None]
    s_eye = jnp.asarray(load(args.style, 2))[None]

    ritnet = RITnet.pretrained()
    vgg = load_pretrained("vgg19", init_fn=lambda: VGG19.init(jax.random.PRNGKey(0)))

    c_iris, c_mask, c_bbox = mask_and_crop_iris(c_eye, ritnet)
    s_iris, _, _ = mask_and_crop_iris(s_eye, ritnet)

    # style-only NST, as the notebook (c_loss_weight=0, s_loss_weight=1)
    res = nst(c_iris, s_iris, vgg, c_loss_weight=0.0, s_loss_weight=1.0,
              epochs=args.epochs, history_every=max(args.epochs // 10, 1))
    new_eye = composite_batch(c_eye, res.x, c_mask, c_bbox)

    def save(name, arr):
        a = np.asarray(np.clip(np.asarray(arr), 0, 1) * 255, np.uint8)
        if a.ndim == 3:
            a = a[..., 0] if a.shape[-1] == 1 else a
        Image.fromarray(a).save(os.path.join(args.outdir, name))

    save("content_eye.png", c_eye[0])
    save("style_eye.png", s_eye[0])
    save("content_iris.png", c_iris[0])
    save("style_iris.png", s_iris[0])
    save("stylized_iris.png", res.x[0])
    save("result_eye.png", new_eye[0])
    print(f"s_loss {float(res.s_loss_hist[0]):.5g} -> {float(res.s_loss_hist[-1]):.5g}")
    print("wrote PNGs to", args.outdir)


if __name__ == "__main__":
    main()
