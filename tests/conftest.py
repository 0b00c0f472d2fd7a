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


import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Clear JAX's global compilation caches between test MODULES.

    Without this, the full suite accumulates every module's compiled
    executables in one process, and past a threshold the XLA CPU compiler
    segfaults on whichever compile comes next (observed three times
    2026-08-21 at ~the same cumulative point but in DIFFERENT tests:
    twice in test_multichip's sharded-frame compile, then — after that
    test was subprocess-isolated — in test_multipass; always inside
    ``backend_compile_and_load``). Per-module clearing bounds live
    executables at one module's worth. Module scope (not per-test) keeps
    intra-module cache reuse, which
    ``test_interactive.py::test_frame_path_compiles_once`` depends on
    within its own body.
    """
    yield
    jax.clear_caches()
    gc.collect()
