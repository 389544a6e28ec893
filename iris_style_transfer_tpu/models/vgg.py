"""VGG19 feature extractor — pure functional, with layer taps.

Reference: ``models/vgg/vgg.py`` — torchvision vgg19 ``features`` stack with
the classifier head dropped (``:43-48``), frozen/eval (``:51-53``), ImageNet
normalization applied *inside* the forward (``:63-67,81``), optional mask
multiply (``:84-85``), and taps capturing activations at content layers
(default ``['relu4_2']``) and style layers (default ``['relu1_1','relu2_1',
'relu3_1','relu4_1']``) (``:25-26,56-60``).  Forward returns
``(final_feats, content_feats, style_feats)`` (``:87-92``).

TPU-first: NHWC activations, HWIO kernels, bfloat16 compute with f32
accumulation (MXU), single trace — the tap mechanism is just returning
intermediates from a pure function instead of module state.

Pretrained weights: torchvision's IMAGENET1K_V1 state dict can be ported
via :mod:`iris_style_transfer_tpu.models.port` (zero-egress environments
fall back to the deterministic seeded init below; quality parity then
requires supplying ported weights).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops import pallas_pool_paired
from ..ops.image import imagenet_normalize
from ..ops.losses import stats_from_sums
from . import layers as L

# conv structure of vgg19 `features` (without BN): channels per conv, with
# 'M' = maxpool; mirrors torchvision cfg "E" / reference layer table
# (models/vgg/vgg.py:6-10).
_CFG = [
    64, 64, "M",
    128, 128, "M",
    256, 256, 256, 256, "M",
    512, 512, 512, 512, "M",
    512, 512, 512, 512, "M",
]

# layer-name -> sequential index tables, identical to vgg19_layers and
# vgg19_bn_layers (models/vgg/vgg.py:6-17)
VGG19_LAYERS: dict[str, int] = {}
VGG19_BN_LAYERS: dict[str, int] = {}


def _build_layer_tables():
    idx = idx_bn = 0
    block, conv_in_block = 1, 1
    for c in _CFG:
        if c == "M":
            VGG19_LAYERS[f"pool{block}"] = idx
            VGG19_BN_LAYERS[f"pool{block}"] = idx_bn
            idx += 1
            idx_bn += 1
            block += 1
            conv_in_block = 1
        else:
            VGG19_LAYERS[f"conv{block}_{conv_in_block}"] = idx
            VGG19_LAYERS[f"relu{block}_{conv_in_block}"] = idx + 1
            idx += 2
            VGG19_BN_LAYERS[f"conv{block}_{conv_in_block}"] = idx_bn
            VGG19_BN_LAYERS[f"bn{block}_{conv_in_block}"] = idx_bn + 1
            VGG19_BN_LAYERS[f"relu{block}_{conv_in_block}"] = idx_bn + 2
            idx_bn += 3
            conv_in_block += 1


_build_layer_tables()

# conv name list in order, used for param naming and torch porting
CONV_NAMES = [n for n in VGG19_LAYERS if n.startswith("conv")]

DEFAULT_CONTENT_LAYERS = ("relu4_2",)
DEFAULT_STYLE_LAYERS = ("relu1_1", "relu2_1", "relu3_1", "relu4_1")


class VGG19:
    """Functional VGG19 shell: ``params = VGG19.init(key)``,
    ``final, content, style = VGG19.apply(params, x, ...)``."""

    layers = VGG19_LAYERS
    conv_names = CONV_NAMES

    def __init__(
        self,
        content_layers: Sequence[str] = DEFAULT_CONTENT_LAYERS,
        style_layers: Sequence[str] = DEFAULT_STYLE_LAYERS,
        bn: bool = False,
        compute_dtype=jnp.float32,
    ):
        self.content_layers = tuple(content_layers)
        self.style_layers = tuple(style_layers)
        self.bn = bn
        self.compute_dtype = compute_dtype

    @staticmethod
    def stats_taps_eligible(style_layers, content_layers) -> bool:
        """True iff every style tap is a relu not shared with the content
        taps — the ONE predicate deciding whether ``stats_taps`` may
        apply (a partial set would return a mixed tensor/(mean, std)
        style list).  Shared by ``apply``'s hard check and the NST
        builder's silent fallback."""
        return all(
            n.startswith("relu") and n not in content_layers for n in style_layers
        )

    @staticmethod
    def init(key: jax.Array, dtype=jnp.float32, bn: bool = False) -> dict:
        """Deterministic seeded init; used when pretrained torchvision
        weights are unavailable (zero egress).  torchvision's own
        ``_initialize_weights`` distribution (kaiming-normal fan_out,
        zero bias) rather than torch's layer default: the reference only
        ever runs this shell with IMAGENET1K_V1 weights (``vgg.py:39-48``)
        whose activations are O(1) at every tap, and He init is what keeps
        a 16-conv stack's features depth-stable (``layers.init_conv_he``).
        ``bn=True`` builds the vgg19_bn variant (reference ``vgg.py:38-41``)."""
        params = {}
        cin = 3
        keys = jax.random.split(key, len(CONV_NAMES))
        for k, name in zip(keys, CONV_NAMES):
            cout = _CFG_CHANNELS[name]
            params[name] = L.init_conv_he(k, 3, 3, cin, cout, dtype)
            if bn:
                params["bn" + name[4:]] = L.init_batchnorm(cout, dtype)
            cin = cout
        return params

    def __call__(self, params: dict, x: jax.Array, mask: jax.Array | None = None):
        return self.apply(
            params,
            x,
            mask=mask,
            content_layers=self.content_layers,
            style_layers=self.style_layers,
            compute_dtype=self.compute_dtype,
            bn=self.bn,
        )

    @staticmethod
    def apply(
        params: dict,
        x: jax.Array,
        mask: jax.Array | None = None,
        content_layers: Sequence[str] = DEFAULT_CONTENT_LAYERS,
        style_layers: Sequence[str] = DEFAULT_STYLE_LAYERS,
        compute_dtype=jnp.float32,
        truncate: bool = False,
        bn: bool = False,
        batch_groups: int = 1,
        stats_taps: bool = False,
        fuse_relu_pool: bool | None = None,
    ):
        """x: (B, H, W, 3) in [0,1].  Returns (final, content_feats,
        style_feats).  Taps stay in ``compute_dtype`` (losses and style
        statistics upcast to f32 internally) so bf16 runs don't
        materialize f32 copies of the large early-layer activations.

        ``stats_taps=True`` returns each style entry as its BN-statistics
        (mean, std) pair instead of the activation tensor, computed by
        the fused relu+stats op (``layers.relu_stats`` — one pass, and on
        TPU the lane-full Pallas kernel of ``ops/pallas_relu_stats.py``).
        Only valid for style taps that are relu layers and not also
        content taps; pair with ``ops.losses.style_loss_bn_stats``.

        ``truncate=True`` stops after the deepest requested tap (the NST
        loop never needs the final features — saves ~30% of the FLOPs;
        ``final`` is then the last computed activation).

        ``fuse_relu_pool=None`` defers to the ``layers.FUSE_RELU_POOL``
        module flag; pass ``False`` to force the composed relu+pool path —
        the NST builder does this under model-sharded meshes, where the
        fused op's Pallas dispatch (``layers._relu_max_pool_fwd``) has no
        SPMD partitioning rule and XLA would replicate its operands.

        ``batch_groups=g`` runs a BATCH-PACKED forward: x is
        (1, H, W, g*3) holding g images stacked batch-major on the
        channel axis, and every conv becomes a g-group conv with weights
        tiled per group — numerically the per-image forward, but with no
        size-g batch dimension.  Built to attack the 25%-vreg-occupancy
        batch-in-sublanes layout XLA picks at small batch; measured
        4.4x SLOWER on v5e (XLA's grouped-conv lowering dominates,
        tools/perf_probe12.py) and kept default-off as the documented
        dead end.  Taps come back packed the same way.
        """
        taps_wanted = set(content_layers) | set(style_layers)
        if stats_taps and batch_groups > 1:
            # the packed forward's taps carry g images per channel axis —
            # silently returning tensors where the caller was promised
            # (mean, std) pairs would fail far from the cause
            raise ValueError("stats_taps is not supported with batch_groups > 1")
        if stats_taps:
            if not VGG19.stats_taps_eligible(style_layers, content_layers):
                # a partial stats_set would return a MIXED style list
                # (tensors and (mean, std) pairs) that downstream losses
                # cannot distinguish — refuse instead
                raise ValueError(
                    "stats_taps=True requires every style layer to be a "
                    f"relu not shared with content_layers; got {list(style_layers)}"
                )
            stats_set = set(style_layers)
        else:
            stats_set = set()
        table = VGG19_BN_LAYERS if bn else VGG19_LAYERS
        stop_idx = max(table[n] for n in taps_wanted) if truncate else None
        gN = batch_groups
        # normalization inside the model, as the reference (vgg.py:81)
        if gN > 1:
            xs = x.shape
            h = imagenet_normalize(
                x.astype(jnp.float32).reshape(*xs[:-1], gN, xs[-1] // gN)
            ).reshape(xs)
        else:
            h = imagenet_normalize(x.astype(jnp.float32))
        if mask is not None:
            h = h * mask.astype(h.dtype)
        h = h.astype(compute_dtype)

        taps: dict[str, jax.Array] = {}
        block, conv_in_block, idx = 1, 1, 0
        fuse_next_pool = False
        for ci, c in enumerate(_CFG):
            if stop_idx is not None and idx > stop_idx:
                break
            if c == "M":
                if fuse_next_pool:
                    # relu+pool in one VJP — keeps the backward in the
                    # windowed domain (see layers.relu_max_pool)
                    h = L.relu_max_pool(h, 2)
                    fuse_next_pool = False
                else:
                    h = L.max_pool(h, 2, 2)
                idx += 1
                block += 1
                conv_in_block = 1
            else:
                cname = f"conv{block}_{conv_in_block}"
                bname = f"bn{block}_{conv_in_block}"
                rname = f"relu{block}_{conv_in_block}"
                p = params[cname]
                if gN > 1:
                    # same weights for every packed image: tile along the
                    # O axis (group-major), loop-invariant so XLA hoists
                    # it out of the NST scan
                    p = {
                        "w": jnp.tile(p["w"], (1, 1, 1, gN)),
                        "b": jnp.tile(p["b"], (gN,)),
                    }
                if h.shape[-1] * 9 <= 128 * gN:
                    # small-per-group-C_in convs (conv1_1): MXU-reassociated
                    # input gradient — XLA's own dx lowering for C_in=3 is a
                    # VPU fusion costing 22% of the NST closure (perf_probe9)
                    h = L.conv2d_mxu_dx(h, p, groups=gN)
                else:
                    h = L.conv2d(h, p, stride=1, padding=1, groups=gN)
                if cname in taps_wanted:
                    taps[cname] = h
                idx += 1
                if bn:
                    h = L.batchnorm(h, params[bname])
                    if bname in taps_wanted:
                        taps[bname] = h
                    idx += 1
                nxt = _CFG[ci + 1] if ci + 1 < len(_CFG) else None
                if fuse_relu_pool is None:
                    # module flags: FUSE_RELU_POOL fuses every eligible
                    # pool (rejected, default off); POOL_PAIRED_PALLAS
                    # fuses exactly the pools the paired-bitcast kernel
                    # supports (block 1's C=64 — the only lane-starved
                    # one).  An explicit False (the model-sharded NST
                    # path) disables both: the Pallas dispatch has no
                    # SPMD rule.
                    isz = jnp.dtype(h.dtype).itemsize
                    fuse = L.FUSE_RELU_POOL or (
                        nxt == "M"
                        and (
                            (
                                L.POOL_4D_PALLAS
                                and pallas_pool_paired.supported_4d(h.shape, 2, isz)
                            )
                            or (
                                L.POOL_LANE_PALLAS
                                and pallas_pool_paired.supported_l(h.shape, 2, isz)
                            )
                            or (
                                L.POOL_XPOSED_PALLAS
                                and pallas_pool_paired.supported_t(h.shape, 2, isz)
                            )
                            or (
                                L.POOL_PAIRED_PALLAS
                                and pallas_pool_paired.supported(h.shape, 2, isz)
                            )
                        )
                    )
                else:
                    fuse = fuse_relu_pool
                if (
                    fuse
                    and nxt == "M"
                    and rname not in taps_wanted
                    and (stop_idx is None or idx + 1 <= stop_idx)
                    # relu_max_pool reshapes into 2x2 windows; odd extents
                    # must take max_pool's reduce_window fallback instead
                    and h.shape[1] % 2 == 0
                    and h.shape[2] % 2 == 0
                ):
                    fuse_next_pool = True  # relu applied inside the pool
                elif rname in stats_set:
                    n_hw = h.shape[1] * h.shape[2]
                    h, s1, s2 = L.relu_stats(h)
                    taps[rname] = stats_from_sums(s1, s2, n_hw)
                else:
                    h = jax.nn.relu(h)
                    if rname in taps_wanted:
                        taps[rname] = h
                idx += 1
                conv_in_block += 1

        final = h.astype(jnp.float32)
        content = [taps[n] for n in content_layers]
        style = [taps[n] for n in style_layers]
        return final, content, style


_CFG_CHANNELS = {}


def _build_cfg_channels():
    block, conv_in_block = 1, 1
    for c in _CFG:
        if c == "M":
            block += 1
            conv_in_block = 1
        else:
            _CFG_CHANNELS[f"conv{block}_{conv_in_block}"] = c
            conv_in_block += 1


_build_cfg_channels()
