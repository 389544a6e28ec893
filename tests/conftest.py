"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated the TPU way — N virtual XLA host devices
(``xla_force_host_platform_device_count``) stand in for an 8-chip slice,
per SURVEY.md §4.  Must run before the first ``import jax``.
"""

import os

# force (not setdefault): the environment exports JAX_PLATFORMS=axon (the
# tunneled TPU) and a sitecustomize that imports jax at interpreter start,
# so plain env vars are too late — use jax.config, which wins as long as no
# backend has been initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
