"""EfficientNet-B7 U-Net converter wiring: a synthetic smp-style state dict
with the expected keys/shapes must convert and run the full forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iris_style_transfer_tpu.models import port
from iris_style_transfer_tpu.models.efficientnet import (
    BLOCK_ARGS,
    DECODER_CHANNELS,
    EfficientNet,
    SKIP_AFTER,
    STEM_CHANNELS,
)

pytestmark = pytest.mark.slow  # full-tier only: see pyproject.toml


def _bn_keys(sd, prefix, c, rng):
    sd[f"{prefix}.weight"] = rng.standard_normal(c).astype(np.float32)
    sd[f"{prefix}.bias"] = rng.standard_normal(c).astype(np.float32)
    sd[f"{prefix}.running_mean"] = rng.standard_normal(c).astype(np.float32)
    sd[f"{prefix}.running_var"] = rng.random(c).astype(np.float32) + 0.5


def build_fake_smp_state_dict(rng):
    sd = {}
    sd["encoder._conv_stem.weight"] = rng.standard_normal((STEM_CHANNELS, 3, 3, 3)).astype(np.float32) * 0.05
    _bn_keys(sd, "encoder._bn0", STEM_CHANNELS, rng)
    for i, (expand, k, s, cin, cout) in enumerate(BLOCK_ARGS):
        mid = cin * expand
        se = max(1, int(cin * 0.25))
        pre = f"encoder._blocks.{i}"
        if expand != 1:
            sd[f"{pre}._expand_conv.weight"] = rng.standard_normal((mid, cin, 1, 1)).astype(np.float32) * 0.05
            _bn_keys(sd, f"{pre}._bn0", mid, rng)
        sd[f"{pre}._depthwise_conv.weight"] = rng.standard_normal((mid, 1, k, k)).astype(np.float32) * 0.05
        _bn_keys(sd, f"{pre}._bn1", mid, rng)
        sd[f"{pre}._se_reduce.weight"] = rng.standard_normal((se, mid, 1, 1)).astype(np.float32) * 0.05
        sd[f"{pre}._se_reduce.bias"] = rng.standard_normal(se).astype(np.float32)
        sd[f"{pre}._se_expand.weight"] = rng.standard_normal((mid, se, 1, 1)).astype(np.float32) * 0.05
        sd[f"{pre}._se_expand.bias"] = rng.standard_normal(mid).astype(np.float32)
        sd[f"{pre}._project_conv.weight"] = rng.standard_normal((cout, mid, 1, 1)).astype(np.float32) * 0.05
        _bn_keys(sd, f"{pre}._bn2", cout, rng)
    # decoder: in = deepest 640, skips (224, 80, 48, 64, 0)
    skip_ch = [STEM_CHANNELS] + [BLOCK_ARGS[i][4] for i in SKIP_AFTER]
    enc = skip_ch[::-1]
    cin = enc[0]
    skips = enc[1:] + [0]
    for i, cout in enumerate(DECODER_CHANNELS):
        pre = f"decoder.blocks.{i}"
        sd[f"{pre}.conv1.0.weight"] = rng.standard_normal((cout, cin + skips[i], 3, 3)).astype(np.float32) * 0.05
        _bn_keys(sd, f"{pre}.conv1.1", cout, rng)
        sd[f"{pre}.conv2.0.weight"] = rng.standard_normal((cout, cout, 3, 3)).astype(np.float32) * 0.05
        _bn_keys(sd, f"{pre}.conv2.1", cout, rng)
        cin = cout
    sd["segmentation_head.0.weight"] = rng.standard_normal((4, DECODER_CHANNELS[-1], 3, 3)).astype(np.float32) * 0.05
    sd["segmentation_head.0.bias"] = rng.standard_normal(4).astype(np.float32)
    return sd


def test_effnet_converter_wires_and_runs():
    rng = np.random.default_rng(0)
    sd = build_fake_smp_state_dict(rng)
    params = port.convert_efficientnet_unet(sd)
    params = jax.tree.map(jnp.asarray, params)

    # structure matches the seeded init exactly
    ref = EfficientNet.init(jax.random.PRNGKey(0))
    assert jax.tree.structure(params) == jax.tree.structure(ref)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(ref)):
        assert a.shape == b.shape, (a.shape, b.shape)

    # converted params drive the full shell end to end (H+16 and W must be
    # divisible by 32 so decoder upsamples meet the skips, like 400x640)
    x = jnp.ones((1, 112, 128, 1)) * 0.4
    out = EfficientNet.apply(params, x, tta=False)
    assert out.shape == (1, 112, 128)
