"""Device mesh and sharding helpers.

The reference has no distributed code at all (SURVEY.md §2.3, §5.8 — a
single ``args.device`` everywhere despite a 4xA100 host).  Here
multi-chip is first-class and TPU-native:

  * a 2-D mesh ``(data, model)`` over ICI (e.g. v5e-8 as 8x1 pure-DP or
    4x2 DP x TP),
  * batch-axis ``NamedSharding`` for NST batches, eval pipelines and
    training steps (the dominant strategy — all workloads are
    batch-parallel),
  * tensor-parallel column/row sharding for the classifier MLP heads
    (25088x4096 / 4096x4096 matmuls, the only parameter blocks worth
    sharding),
  * metric reductions ride XLA collectives (``psum``/``pmean`` inserted by
    the partitioner) instead of the reference's per-batch host gathers.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None,
    model_parallel: int = 1,
    devices=None,
) -> Mesh:
    """Create a ``(data, model)`` mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def make_multislice_mesh(
    n_slices: int,
    model_parallel: int = 1,
    devices=None,
) -> Mesh:
    """3-axis ``(slice, data, model)`` mesh for multi-slice pods.

    TPU slices talk over DCN (slow) while chips within a slice ride ICI
    (fast); batch-sharding over ``("slice", "data")`` keeps per-step
    gradient/metric reductions hierarchical — XLA reduces within each
    slice over ICI first and crosses DCN once with the m-sized partial
    (the standard multi-slice recipe).  The device-major order of
    ``jax.devices()`` on multi-slice deployments already groups chips by
    slice, so a plain reshape yields the right locality.  On single-slice
    or virtual-CPU runs this is structurally identical and serves as the
    dry-run path.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % (n_slices * model_parallel):
        raise ValueError(
            f"{n} devices not divisible by {n_slices} slices x {model_parallel} tp"
        )
    arr = np.asarray(devices).reshape(
        n_slices, n // (n_slices * model_parallel), model_parallel
    )
    return Mesh(arr, ("slice", "data", "model"))


def _batch_spec(mesh: Mesh):
    """The PartitionSpec entry for a batch axis on this mesh — ``data``,
    plus ``slice`` on a multi-slice mesh.  Single source of the mesh-axis
    policy for batch_sharding/spatial_sharding."""
    batch_axes = [ax for ax in ("slice", "data") if ax in mesh.axis_names]
    return tuple(batch_axes) if len(batch_axes) > 1 else batch_axes[0]


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) axis over the data-parallel mesh axes
    (``data``, plus ``slice`` on a multi-slice mesh); replicate the rest."""
    return NamedSharding(mesh, P(_batch_spec(mesh), *([None] * (ndim - 1))))


def make_stager(mesh: Mesh | None):
    """Host array -> device placement function.  With a mesh, every array
    is batch-sharded over the mesh's batch axes (``batch_sharding``); with
    ``None`` it is a plain ``jnp.asarray``.  Shared by the IST workload
    drivers (reference ``iris_style_transfer_openeds2019.py:93-136`` runs
    single-GPU; here the whole pipeline is batch-parallel)."""
    if mesh is None:
        return jnp.asarray

    def stage(a):
        if not isinstance(a, jax.Array):
            a = np.asarray(a)
        return jax.device_put(a, batch_sharding(mesh, a.ndim))

    return stage


def spatial_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard an image batch on BOTH the batch axis (over the data axes)
    and the image height axis (over ``model``) — this domain's analog of
    sequence/context parallelism (SURVEY.md §5.7: "scale" here is spatial).

    Under this sharding XLA's SPMD partitioner runs every conv with halo
    exchanges on the H boundary rows (3x3 kernels move one row per
    neighbor over ICI), keeps reshape-based pooling shard-local, and
    turns the Gram/BN-stats spatial reductions and L-BFGS inner products
    into ``psum`` partials — so one NST problem scales past the batch
    axis.  The practical win: with bs < chips (the bench's 512px bs4 on
    a v5e-8, or the bs1 notebook demo) a ``(data, model)`` mesh with
    model>1 puts otherwise-idle chips on slices of the same image.

    Divisibility: each VGG tap's H extent must split over ``model`` —
    for the relu4_1 pyramid that is ``(H/8) % model == 0`` (H=224 ->
    model in {2,4,7,14,28}; H=512 -> any power of two up to 64).
    """
    return NamedSharding(mesh, P(_batch_spec(mesh), "model", *([None] * (ndim - 2))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """Device-put every array in a pytree with its batch axis sharded."""
    return jax.tree.map(
        lambda a: jax.device_put(a, batch_sharding(mesh, jnp.ndim(a))), tree
    )


def mlp_tp_spec(params: dict) -> dict:
    """Tensor-parallel spec for a 3-layer MLP head ({'fc0','fc1','fc2'}):
    fc0 column-parallel, fc1 row-parallel (Megatron pattern — one
    all-reduce per forward), fc2 replicated."""
    return {
        "fc0": {"w": P(None, "model"), "b": P("model")},
        "fc1": {"w": P("model", None), "b": P()},
        "fc2": {"w": P(), "b": P()},
    }


def shard_params(mesh: Mesh, params: Any, spec: Any = None) -> Any:
    """Place params on the mesh.  ``spec`` is a (possibly PARTIAL) pytree
    of PartitionSpecs: entries that are missing or None replicate.  A
    plain ``jax.tree.map(place, params, spec)`` would raise a
    dict-key-mismatch for partial specs, so the walk aligns the spec to
    the params structure explicitly."""
    def place(a, s):
        return jax.device_put(a, NamedSharding(mesh, s if s is not None else P()))

    def walk(p, s):
        if isinstance(p, dict):
            sd = s if isinstance(s, dict) else {}
            return {k: walk(v, sd.get(k)) for k, v in p.items()}
        if isinstance(p, (list, tuple)):
            ss = s if isinstance(s, (list, tuple)) and len(s) == len(p) else [None] * len(p)
            return type(p)(walk(v, sv) for v, sv in zip(p, ss))
        return place(p, s)

    return walk(params, spec)


def pmean_metrics(metrics: dict, axis_name: str = "data") -> dict:
    """Mean-reduce a metrics dict across the data axis (for shard_map
    bodies; under plain pjit XLA inserts the collectives itself)."""
    return jax.tree.map(lambda v: jax.lax.pmean(v, axis_name), metrics)
