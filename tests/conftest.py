"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so that multi-chip mesh
logic (shard_map + psum) is exercised without TPU pod hardware — the JAX
analog of a fake-NCCL cluster (SURVEY.md §4d). Environment variables must be
set before the first ``import jax`` anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
