"""Torch state-dict -> JAX pytree weight porting.

Conventions: torch conv weights are OIHW -> transposed to HWIO; linear
weights are (out, in) -> transposed to (in, out); BatchNorm running stats
map to {scale, bias, mean, var}.

Sources handled (SURVEY.md §5.4):
  * the bundled RITnet pkl (``models/weights/ritnet_pretrained.pkl``),
  * torchvision vgg19 / resnet50 state dicts (IMAGENET1K_V1 / V2),
  * smp Unet(efficientnet-b7) checkpoints (with ``'module.'`` prefix strip,
    reference ``efficientnet.py:22-24``),
  * the reference's own classifier / gaze-estimator ``.pth`` checkpoints.

These functions take a plain ``dict[str, numpy.ndarray]`` so torch is only
needed by the CLI tools that load the files, not by the framework itself.
"""

from __future__ import annotations

import numpy as np


def _conv(sd, prefix):
    w = np.asarray(sd[prefix + ".weight"])
    out = {"w": np.transpose(w, (2, 3, 1, 0))}  # OIHW -> HWIO
    if prefix + ".bias" in sd:
        out["b"] = np.asarray(sd[prefix + ".bias"])
    else:
        out["b"] = np.zeros(w.shape[0], w.dtype)
    return out


def _linear(sd, prefix):
    w = np.asarray(sd[prefix + ".weight"])
    return {"w": np.transpose(w, (1, 0)), "b": np.asarray(sd[prefix + ".bias"])}


def _bn(sd, prefix):
    return {
        "scale": np.asarray(sd[prefix + ".weight"]),
        "bias": np.asarray(sd[prefix + ".bias"]),
        "mean": np.asarray(sd[prefix + ".running_mean"]),
        "var": np.asarray(sd[prefix + ".running_var"]),
    }


# ---------------------------------------------------------------------------
# RITnet (bundled pkl; keys like down_block1.conv1.weight)
# ---------------------------------------------------------------------------


def convert_ritnet(sd: dict) -> dict:
    params = {}
    for i in range(1, 6):
        src = f"down_block{i}"
        params[f"down{i}"] = {
            "conv1": _conv(sd, f"{src}.conv1"),
            "conv21": _conv(sd, f"{src}.conv21"),
            "conv22": _conv(sd, f"{src}.conv22"),
            "conv31": _conv(sd, f"{src}.conv31"),
            "conv32": _conv(sd, f"{src}.conv32"),
            "bn": _bn(sd, f"{src}.bn"),
        }
    for i in range(1, 5):
        src = f"up_block{i}"
        params[f"up{i}"] = {
            "conv11": _conv(sd, f"{src}.conv11"),
            "conv12": _conv(sd, f"{src}.conv12"),
            "conv21": _conv(sd, f"{src}.conv21"),
            "conv22": _conv(sd, f"{src}.conv22"),
        }
    params["out_conv"] = _conv(sd, "out_conv1")
    return params


# ---------------------------------------------------------------------------
# VGG19 (torchvision `features.N.weight` indices -> conv names)
# ---------------------------------------------------------------------------


def convert_vgg19(sd: dict, bn: bool = False) -> dict:
    from .vgg import CONV_NAMES, VGG19_BN_LAYERS, VGG19_LAYERS

    sd = {k.removeprefix("features."): v for k, v in sd.items() if "features." in k or k[0].isdigit()}
    table = VGG19_BN_LAYERS if bn else VGG19_LAYERS
    params = {}
    for name in CONV_NAMES:
        params[name] = _conv(sd, str(table[name]))
        if bn:
            bn_name = "bn" + name[4:]
            params[bn_name] = _bn(sd, str(table[bn_name]))
    return params


# ---------------------------------------------------------------------------
# ResNet50 (torchvision)
# ---------------------------------------------------------------------------


def convert_resnet50(sd: dict) -> dict:
    from .resnet import STAGES

    params = {"conv1": _conv(sd, "conv1"), "bn1": _bn(sd, "bn1")}
    for si, (width, blocks, stride) in enumerate(STAGES, start=1):
        stage = []
        for b in range(blocks):
            pre = f"layer{si}.{b}"
            p = {
                "conv1": _conv(sd, f"{pre}.conv1"),
                "bn1": _bn(sd, f"{pre}.bn1"),
                "conv2": _conv(sd, f"{pre}.conv2"),
                "bn2": _bn(sd, f"{pre}.bn2"),
                "conv3": _conv(sd, f"{pre}.conv3"),
                "bn3": _bn(sd, f"{pre}.bn3"),
            }
            if f"{pre}.downsample.0.weight" in sd:
                p["downsample"] = {
                    "conv": _conv(sd, f"{pre}.downsample.0"),
                    "bn": _bn(sd, f"{pre}.downsample.1"),
                }
            stage.append(p)
        params[f"layer{si}"] = stage
    return params


# ---------------------------------------------------------------------------
# EfficientNet-B7 U-Net (smp checkpoint; 'module.' prefix already stripped,
# reference efficientnet.py:22-24)
# ---------------------------------------------------------------------------


def _dw_conv(sd, prefix):
    """Depthwise conv: torch (C,1,k,k) -> HWIO (k,k,1,C)."""
    w = np.asarray(sd[prefix + ".weight"])
    return {"w": np.transpose(w, (2, 3, 1, 0)), "b": np.zeros(w.shape[0], w.dtype)}


def convert_efficientnet_unet(sd: dict) -> dict:
    from .efficientnet import BLOCK_ARGS

    params = {
        "stem_conv": _conv(sd, "encoder._conv_stem"),
        "stem_bn": _bn(sd, "encoder._bn0"),
    }
    blocks = []
    for i, (expand, k, s, cin, cout) in enumerate(BLOCK_ARGS):
        pre = f"encoder._blocks.{i}"
        p = {}
        if expand != 1:
            p["expand_conv"] = _conv(sd, f"{pre}._expand_conv")
            p["bn0"] = _bn(sd, f"{pre}._bn0")
        p["dw_conv"] = _dw_conv(sd, f"{pre}._depthwise_conv")
        p["bn1"] = _bn(sd, f"{pre}._bn1")
        p["se_reduce"] = _conv(sd, f"{pre}._se_reduce")
        p["se_expand"] = _conv(sd, f"{pre}._se_expand")
        p["project_conv"] = _conv(sd, f"{pre}._project_conv")
        p["bn2"] = _bn(sd, f"{pre}._bn2")
        blocks.append(p)
    params["blocks"] = blocks
    dec = []
    for i in range(5):
        pre = f"decoder.blocks.{i}"
        dec.append(
            {
                "conv1": _conv(sd, f"{pre}.conv1.0"),
                "bn1": _bn(sd, f"{pre}.conv1.1"),
                "conv2": _conv(sd, f"{pre}.conv2.0"),
                "bn2": _bn(sd, f"{pre}.conv2.1"),
            }
        )
    params["decoder"] = dec
    params["head"] = _conv(sd, "segmentation_head.0")
    return params


# ---------------------------------------------------------------------------
# Classifier / gaze-estimator heads (torch nn.Sequential state dicts)
# ---------------------------------------------------------------------------


def convert_mlp_head(sd: dict, linear_indices: list[int], prefix: str = "model") -> dict:
    """Sequential MLPs like Classifier1/2 and GazeEstimator1/2: linear
    layers at the given Sequential indices -> {'fc0': {...}, 'fc1': ...}."""
    return {
        f"fc{j}": _linear(sd, f"{prefix}.{i}") for j, i in enumerate(linear_indices)
    }


def convert_classifier1(sd: dict) -> dict:
    return convert_mlp_head(sd, [2, 5, 8])  # classifiers.py:15-25


def convert_classifier2(sd: dict) -> dict:
    return convert_mlp_head(sd, [0, 3, 6])  # classifiers.py:51-59


def convert_gaze_estimator(sd: dict) -> dict:
    return convert_mlp_head(sd, [0, 3, 6])  # gaze_estimators.py:24-32,196-204


# ---------------------------------------------------------------------------
# npz round trip for flat storage of nested pytrees
# ---------------------------------------------------------------------------


def flatten_pytree(params, prefix: str = "") -> dict[str, np.ndarray]:
    """Flatten nested dicts/lists to '/'-joined keys.  List entries become
    all-digit key segments (ResNet/EfficientNet params keep their stages as
    lists) and are restored as lists by :func:`unflatten_pytree`."""
    flat = {}
    items = (
        enumerate(params) if isinstance(params, (list, tuple)) else params.items()
    )
    for k, v in items:
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, (dict, list, tuple)):
            flat.update(flatten_pytree(v, key))
        else:
            flat[key] = np.asarray(v)
    return flat


def unflatten_pytree(flat: dict) -> dict:
    tree: dict = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v

    def _listify(node):
        if not isinstance(node, dict):
            return node
        if node and all(key.isdigit() for key in node):
            return [_listify(node[key]) for key in sorted(node, key=int)]
        return {k: _listify(v) for k, v in node.items()}

    return _listify(tree)


def save_npz(path: str, params: dict) -> None:
    np.savez(path, **flatten_pytree(params))


def load_npz(path: str) -> dict:
    with np.load(path) as f:
        return unflatten_pytree({k: f[k] for k in f.files})
