"""Mesh construction, shardings and collectives."""

from .mesh import (
    make_mesh,
    make_multislice_mesh,
    make_stager,
    batch_sharding,
    replicated,
    shard_batch,
    shard_params,
    spatial_sharding,
    mlp_tp_spec,
    pmean_metrics,
)
