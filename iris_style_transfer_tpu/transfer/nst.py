"""Neural style transfer as a single jitted program.

Reference: ``pipelines.nst`` (``pipelines.py:8-110``) — Gatys optimization
in image space: init from content clone or uniform noise, precompute
content/style targets with one VGG pass each, then run ``epochs`` closure
evaluations of ``c_loss*alpha + s_loss*beta`` under LBFGS (lr 1), clamping
x to [0,1] at the start of every closure, recording per-closure loss and
image histories.

TPU-first redesign: the whole loop is one ``lax.scan`` inside ``jit`` —
targets, 200 forward+backward VGG passes, L-BFGS state and histories all
stay on device (the reference round-trips x and both losses to the host
every closure, ``pipelines.py:93-95``, serializing the GPU).  The batch is
optimized jointly exactly like the reference (one optimizer over the whole
(B, H, W, 3) batch with summed loss).  Batch-axis sharding over a mesh
turns the same program multi-chip (losses are summed with ``psum`` by XLA
automatically under pjit).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..models import layers as _L
from ..models.vgg import VGG19
from ..ops.gram import gram_matrix
from ..ops.losses import (
    content_loss_l2,
    style_loss_bn,
    style_loss_bn_stats,
    style_loss_gram,
    style_stats,
)
from .lbfgs import lbfgs_init, lbfgs_step


class NSTResult(NamedTuple):
    x: jax.Array  # (B, H, W, 3) stylized images in [0,1]
    c_loss_hist: jax.Array  # (epochs,) content loss per closure
    s_loss_hist: jax.Array  # (epochs,) style loss per closure
    x_hist: jax.Array | None  # (epochs//history_every, B, H, W, 3) or None


def make_nst_fn(
    *,
    epochs: int = 200,
    clone_content: bool = True,
    bn_loss: bool = True,
    c_loss_weight: float = 1.0,
    s_loss_weight: float = 1.0,
    lr: float = 1.0,
    optimizer: str = "lbfgs",
    history_size: int = 10,
    lbfgs_method: str = "compact",
    lbfgs_dtype=jnp.float32,
    pallas_gram: bool | str = "auto",
    stats_taps: bool | None = None,
    lbfgs_flat: bool = False,
    pack_batch: bool = False,
    pack_factor: int = 1,
    scan_unroll: int = 1,
    history_every: int = 0,
    content_layers: Sequence[str] = ("relu4_2",),
    style_layers: Sequence[str] = ("relu1_1", "relu2_1", "relu3_1", "relu4_1"),
    compute_dtype=jnp.float32,
    adam_b1: float = 0.9,
    adam_b2: float = 0.999,
    model_sharded: bool = False,
):
    """Build a jittable ``fn(vgg_params, c_img, s_img, noise_key) ->
    NSTResult``.  Flags mirror ``nst()``'s signature (``pipelines.py:8-19``);
    ``history_every=k`` stores every k-th image snapshot (0 = none) instead
    of the reference's every-closure host copy.

    ``model_sharded=True`` declares that the images will arrive H-sharded
    over a ``model`` mesh axis (``parallel.spatial_sharding``).  The Pallas
    kernels (blockwise Gram, fused relu+stats) have no SPMD partitioning
    rule, so under a model-sharded mesh XLA would replicate their operands
    around the ``pallas_call`` — correct but a silent perf cliff.  Both
    kernels are numerically identical to their XLA forms, so the sharded
    path always takes the XLA form, even when explicitly requested.
    """
    if model_sharded:
        pallas_gram = False
        stats_taps = False
        # relu_max_pool's Pallas dispatch has no SPMD rule either — force
        # the composed relu+pool path regardless of layers.FUSE_RELU_POOL
        fuse_relu_pool: bool | None = False
    else:
        fuse_relu_pool = None  # defer to the module flag

    # pack_batch: run the whole optimization with the batch stacked on the
    # channel axis ((B, H, W, 3) -> (1, H, W, B*3), g-group convs).
    # Numerically identical per-image (BN loss only; the channel-count
    # normalizer is corrected below) but measured 4.4x SLOWER on v5e —
    # XLA's grouped-conv lowering swamps the vreg-occupancy win it was
    # built for (tools/perf_probe12.py).  Kept default-off as the
    # documented dead end.
    #
    # pack_factor=k generalizes it to PARTIAL packing ((B, H, W, C) ->
    # (B/k, H, W, k*C), feature_group_count=k convs): the round-4 bs64
    # trace shows block 1's relu/pool boundary ops tiling at 12.5-50%
    # occupancy because C=64 half-fills the 128 lanes; k=2 fills them
    # while keeping the grouped-conv degradation bounded to g=2
    # (tools/perf_probe25.py).  pack_batch=True is pack_factor=B.
    pack_batch = pack_batch and bn_loss
    if not bn_loss:
        pack_factor = 1
    # stats_taps: the style taps come back from the VGG forward as
    # (mean, std) pairs computed by the fused relu+stats op instead of
    # the full activation tensors (probe15 candidate; None defers to the
    # layers.STATS_TAPS module flag).  BN-loss only — the Gram path needs
    # the tensors.
    # eligibility: every style tap must be a relu that is not also a
    # content tap — otherwise VGG19.apply would return a MIXED style list
    # (some tensors, some (mean, std) pairs) and the stats loss would
    # unpack garbage.  Ineligible layer sets silently run the classic
    # path.  ONE predicate shared with VGG19.apply's hard check.
    stats_eligible = VGG19.stats_taps_eligible(style_layers, content_layers)
    use_stats = (
        (_L.STATS_TAPS if stats_taps is None else stats_taps)
        and bn_loss
        and not pack_batch
        and pack_factor <= 1
        and stats_eligible
    )
    vgg_apply = functools.partial(
        VGG19.apply,
        content_layers=tuple(content_layers),
        style_layers=tuple(style_layers),
        compute_dtype=compute_dtype,
        truncate=True,
        stats_taps=use_stats,
        fuse_relu_pool=fuse_relu_pool,
    )

    # Gram implementation selection: "auto" uses the Pallas blockwise kernel
    # on TPU for large spatial extents (one pass over HBM, measured +6% on
    # the Gram-loss 512px path — see BASELINE.md), XLA's dot otherwise.
    def _gram(f):
        use_pallas = (
            pallas_gram
            if isinstance(pallas_gram, bool)
            else jax.default_backend() == "tpu" and f.shape[1] * f.shape[2] >= 128 * 128
        )
        if use_pallas:
            from ..ops.pallas_gram import gram_matrix_pallas

            return gram_matrix_pallas(f)
        return gram_matrix(f)

    def _pack(img, k):
        """(B, H, W, C) -> (B/k, H, W, k*C): images k*b2+i stack on the
        channel axis (group-major, matching the gN-tiled weights)."""
        b, hh, ww, cc = img.shape
        return jnp.transpose(
            img.reshape(b // k, k, hh, ww, cc), (0, 2, 3, 1, 4)
        ).reshape(b // k, hh, ww, k * cc)

    def _unpack(p, k):
        b2, hh, ww, kc = p.shape
        return jnp.transpose(
            p.reshape(b2, hh, ww, k, kc // k), (0, 3, 1, 2, 4)
        ).reshape(b2 * k, hh, ww, kc // k)

    def fn(vgg_params, c_img, s_img, noise_key=None):
        c_img = c_img.astype(jnp.float32)
        s_img = s_img.astype(jnp.float32)

        nb = c_img.shape[0]
        kpack = nb if pack_batch else pack_factor
        packed = kpack > 1 and nb > 1 and nb % kpack == 0
        if packed:
            c_img = _pack(c_img, kpack)
            s_img = _pack(s_img, kpack)
            va = functools.partial(vgg_apply, batch_groups=kpack)
        else:
            va = vgg_apply

        # target features: one VGG pass each (pipelines.py:62-63)
        _, c_feats, _ = va(vgg_params, c_img)
        _, _, s_feats = va(vgg_params, s_img)
        c_targets = [jax.lax.stop_gradient(f) for f in c_feats]
        if use_stats:
            # taps already arrive as (mean, std) pairs
            s_targets = [tuple(map(jax.lax.stop_gradient, st)) for st in s_feats]
        elif bn_loss:
            s_targets = [
                tuple(map(jax.lax.stop_gradient, style_stats(f))) for f in s_feats
            ]
        else:
            s_targets = [jax.lax.stop_gradient(_gram(f)) for f in s_feats]

        def loss_fn(x):
            _, x_c, x_s = va(vgg_params, x)
            c_loss = content_loss_l2(x_c, c_targets)
            if use_stats:
                s_loss = style_loss_bn_stats(x_s, s_targets)
            elif bn_loss:
                s_loss = style_loss_bn(x_s, s_targets)
                if packed:
                    # style_loss_bn normalizes each tap's term by its
                    # channel count; packed taps have kpack*C channels,
                    # so restore the per-image normalizer
                    s_loss = s_loss * kpack
            else:
                s_loss = style_loss_gram(x_s, s_targets, gram_fn=_gram)
            return c_loss * c_loss_weight + s_loss * s_loss_weight, (c_loss, s_loss)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        if clone_content:
            x0 = c_img
        else:
            if noise_key is None:
                noise_key = jax.random.PRNGKey(0)
            x0 = jax.random.uniform(noise_key, c_img.shape, jnp.float32)

        shape = x0.shape
        # optimizer state in the image's NATIVE shape by default: a flat
        # (N,) state forces tiled<->linear relayouts of the image/gradient
        # every closure, ~5 ms/step at 512px bs4 (perf_probe9/10);
        # lbfgs_flat=True keeps the old layout for A/B probing
        opt_shape = x0.size if lbfgs_flat else shape
        n_snaps = (epochs // history_every) if history_every else 0

        if optimizer == "lbfgs":
            opt_state0 = lbfgs_init(opt_shape, history_size, dtype=lbfgs_dtype)
        elif optimizer == "adam":
            opt_state0 = (
                jnp.zeros(opt_shape, jnp.float32),
                jnp.zeros(opt_shape, jnp.float32),
            )  # (m, v)
        else:
            raise ValueError(f"unknown optimizer: {optimizer}")

        snaps0 = (
            jnp.zeros((n_snaps, *shape), jnp.float32) if n_snaps else jnp.zeros((0,))
        )

        def step(carry, i):
            x, opt_state, snaps = carry
            x = jnp.clip(x, 0.0, 1.0)  # the closure's clamp (pipelines.py:81-82)
            (_, (c_loss, s_loss)), g = grad_fn(x)
            g_opt = g.reshape(-1) if lbfgs_flat else g
            if optimizer == "lbfgs":
                update, opt_state = lbfgs_step(opt_state, g_opt, lr, method=lbfgs_method)
            else:
                m, v = opt_state
                t = i.astype(jnp.float32) + 1.0
                m = adam_b1 * m + (1 - adam_b1) * g_opt
                v = adam_b2 * v + (1 - adam_b2) * g_opt * g_opt
                mhat = m / (1 - adam_b1**t)
                vhat = v / (1 - adam_b2**t)
                update = -lr * mhat / (jnp.sqrt(vhat) + 1e-8)
                opt_state = (m, v)
            if n_snaps:
                slot = i // history_every
                snaps = jax.lax.cond(
                    i % history_every == 0,
                    lambda s: jax.lax.dynamic_update_slice(
                        s, x[None], (slot,) + (0,) * len(shape)
                    ),
                    lambda s: s,
                    snaps,
                )
            x = x + (update.reshape(shape) if lbfgs_flat else update)
            return (x, opt_state, snaps), (c_loss, s_loss)

        (x, _, snaps), (c_hist, s_hist) = jax.lax.scan(
            step, (x0, opt_state0, snaps0), jnp.arange(epochs), unroll=scan_unroll
        )
        x = jnp.clip(x, 0.0, 1.0)  # final clamp (pipelines.py:108-109)
        if packed:
            x = _unpack(x, kpack)
            if n_snaps:
                snaps = jax.vmap(_unpack, in_axes=(0, None))(snaps, kpack)
        return NSTResult(x, c_hist, s_hist, snaps if n_snaps else None)

    return fn


def nst(
    c_img: jax.Array,
    s_img: jax.Array,
    vgg_params,
    clone_content: bool = True,
    BN_loss: bool = True,
    c_loss_weight: float = 1.0,
    s_loss_weight: float = 1.0,
    lr: float = 1.0,
    epochs: int = 200,
    optimizer: str = "lbfgs",
    history_every: int = 0,
    history_size: int = 10,
    compute_dtype=jnp.float32,
    noise_key: jax.Array | None = None,
    scan_unroll: int = 8,
) -> NSTResult:
    """Convenience wrapper with the reference's flag names
    (``pipelines.py:8-19``; ``vgg``/``device``/``use_tqdm`` are replaced by
    explicit params and jit).  Jits on first use per configuration."""
    fn = _cached_nst_fn(
        epochs=epochs,
        clone_content=clone_content,
        bn_loss=BN_loss,
        # resolve the module flag BEFORE the cache key — an 'auto'/None
        # key would pin the flag's value at first build
        stats_taps=bool(_L.STATS_TAPS),
        c_loss_weight=float(c_loss_weight),
        s_loss_weight=float(s_loss_weight),
        lr=float(lr),
        optimizer=optimizer,
        history_every=history_every,
        history_size=history_size,
        scan_unroll=scan_unroll,
        compute_dtype=compute_dtype,
    )
    return fn(vgg_params, c_img, s_img, noise_key)


@functools.lru_cache(maxsize=32)
def _cached_nst_fn(**kwargs):
    compute_dtype = kwargs.pop("compute_dtype")
    return jax.jit(make_nst_fn(compute_dtype=compute_dtype, **kwargs))


def cached_nst_program(
    nst_epochs: int,
    c_w: float,
    s_w: float,
    compute_dtype_name: str,
    scan_unroll: int = 8,
    history_size: int = 10,
    pallas_gram: str = "auto",
    stats_taps: str = "auto",
    model_sharded: bool = False,
):
    """The jitted production NST program keyed on the WorkloadConfig perf
    knobs — one builder shared by both IST workload mains so the two
    evals always benchmark the same program (reference inner loop:
    ``iris_style_transfer_openeds2019.py:93-100`` /
    ``iris_style_transfer_openeds2020.py:103-110``).

    'auto' is resolved against ``layers.STATS_TAPS`` HERE, before the
    cache — baking the flag's build-time value under an 'auto' cache key
    would silently ignore later flag flips (the probe-harness pattern)."""
    if stats_taps == "auto":
        stats_taps = "on" if _L.STATS_TAPS else "off"
    return _cached_nst_program(
        nst_epochs, c_w, s_w, compute_dtype_name,
        scan_unroll, history_size, pallas_gram, stats_taps, model_sharded,
    )


@functools.lru_cache(maxsize=16)
def _cached_nst_program(
    nst_epochs: int,
    c_w: float,
    s_w: float,
    compute_dtype_name: str,
    scan_unroll: int,
    history_size: int,
    pallas_gram: str,
    stats_taps: str,
    model_sharded: bool = False,
):
    compute_dtype = jnp.bfloat16 if compute_dtype_name == "bfloat16" else jnp.float32
    pg = {"auto": "auto", "on": True, "off": False}[pallas_gram]
    st = {"on": True, "off": False}[stats_taps]
    return jax.jit(
        make_nst_fn(
            epochs=nst_epochs,
            c_loss_weight=c_w,
            s_loss_weight=s_w,
            compute_dtype=compute_dtype,
            scan_unroll=scan_unroll,
            history_size=history_size,
            pallas_gram=pg,
            stats_taps=st,
            lbfgs_dtype=jnp.bfloat16,
            model_sharded=model_sharded,
        )
    )
