"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so that multi-chip mesh
logic (shard_map + psum) is exercised without TPU pod hardware — the JAX
analog of a fake-NCCL cluster (SURVEY.md §4d).

This image's ``sitecustomize`` registers a TPU PJRT plugin at interpreter
start (importing jax in the process), so environment-variable-only selection
is too late by the time pytest loads this file; instead we switch the platform
through ``jax.config`` before any backend is initialized. The
``xla_force_host_platform_device_count`` flag is read lazily at CPU backend
init, so setting it here still works.
"""

import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
