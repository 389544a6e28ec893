"""Golden tests: losses/Gram vs the reference's exact torch formulas.

The torch expressions below re-state the formulas from the reference's
``utils.py:242-355`` (GramMatrix / ContentLoss_L2 / StyleLoss_Gram /
StyleLoss_BN) so JAX results are checked against independently-computed
golden values.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from iris_style_transfer_tpu.ops import (
    gram_matrix,
    content_loss_l2,
    style_loss_gram,
    style_loss_bn,
    style_stats,
)


def _rand_feats(shapes, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.standard_normal(s).astype(np.float32) for s in shapes]


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


SHAPES = [(2, 16, 16, 8), (2, 8, 8, 16), (2, 4, 4, 32)]


def torch_gram(x):  # utils.py:242-257, batched convention
    x = x.flatten(start_dim=-2)
    n = x[0].numel()
    return (x @ x.transpose(-2, -1)) / n


def test_gram_matrix_matches_torch():
    (f,) = _rand_feats([(3, 12, 10, 6)])
    got = np.asarray(gram_matrix(jnp.asarray(f)))
    want = torch_gram(_nchw(f)).numpy()
    # f32 summation-order differences only
    np.testing.assert_allclose(got, want, atol=5e-4)
    want64 = np.einsum("bhwc,bhwd->bcd", f.astype(np.float64), f.astype(np.float64)) / (
        f.shape[3] * f.shape[1] * f.shape[2]
    )
    np.testing.assert_allclose(got, want64, atol=5e-4)


def test_content_loss_matches_torch():
    preds = _rand_feats(SHAPES, seed=1)
    targs = _rand_feats(SHAPES, seed=2)
    got = float(content_loss_l2([jnp.asarray(p) for p in preds], [jnp.asarray(t) for t in targs]))
    want = 0.0
    for p, t in zip(preds, targs):
        want += torch.nn.functional.mse_loss(_nchw(p), _nchw(t)).item()
    want *= 0.5
    assert got == pytest.approx(want, rel=1e-5)


def test_style_loss_gram_matches_torch():
    preds = _rand_feats(SHAPES, seed=3)
    targs = _rand_feats(SHAPES, seed=4)
    tg = [gram_matrix(jnp.asarray(t)) for t in targs]
    got = float(style_loss_gram([jnp.asarray(p) for p in preds], tg))
    want = 0.0
    for p, t in zip(preds, targs):
        gp, gt = torch_gram(_nchw(p)), torch_gram(_nchw(t))
        want += ((gp - gt) ** 2).sum().item()
    want *= 0.25
    assert got == pytest.approx(want, rel=1e-4)


def test_style_loss_bn_matches_torch():
    preds = _rand_feats(SHAPES, seed=5)
    targs = _rand_feats(SHAPES, seed=6)
    ts = [style_stats(jnp.asarray(t)) for t in targs]
    got = float(style_loss_bn([jnp.asarray(p) for p in preds], ts))
    want = 0.0
    for p, t in zip(preds, targs):
        tp, tt = _nchw(p), _nchw(t)
        pm, ps = tp.mean(dim=(-2, -1)), tp.std(dim=(-2, -1))  # Bessel, as torch.std
        tm, tsd = tt.mean(dim=(-2, -1)), tt.std(dim=(-2, -1))
        want += (((pm - tm) ** 2 + (ps - tsd) ** 2).sum() / pm.shape[-1]).item()
    assert got == pytest.approx(want, rel=1e-4)


def test_style_stats_bessel():
    (f,) = _rand_feats([(2, 6, 6, 4)], seed=7)
    mean, std = style_stats(jnp.asarray(f))
    tf = _nchw(f)
    np.testing.assert_allclose(np.asarray(mean), tf.mean(dim=(-2, -1)).numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(std), tf.std(dim=(-2, -1)).numpy(), atol=1e-5)
