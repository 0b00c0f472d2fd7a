"""path_tracer_tpu — a TPU-native physically-based path-tracing framework.

A brand-new JAX/XLA/Pallas implementation with the capabilities of the Rust CPU
renderer ``CouncilmanJeremyJamm/path_tracer`` (reference mounted at /root/reference),
re-architected TPU-first:

* wavefront integrator over SoA ray batches (reference: per-pixel recursive loop,
  ``src/integrator.rs:143-281``),
* batched two-level BVH traversal over flattened node arrays (reference:
  pointer-chasing ordered stacks, ``src/tlas.rs:66-144`` / ``src/tlas/tlas_bvh/blas.rs:214-294``),
* counter-based per-lane RNG (reference: thread-local wyrand),
* multi-chip scaling via ``jax.sharding`` meshes with a final ``psum``
  (reference: rayon thread pool, single process).
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry in a path tracer must be full f32: JAX's default matmul precision
# on TPU rounds through bfloat16, which visibly corrupts ray directions and
# BVH/triangle math (SURVEY.md §7 hard part 5). The few small matmuls here
# (camera NDC transform, ONB frame changes) are not MXU-throughput-bound, so
# force full precision globally.
_jax.config.update("jax_default_matmul_precision", "highest")

from path_tracer_tpu.core import constants  # noqa: F401
