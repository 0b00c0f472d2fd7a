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

from path_tracer_tpu.core import constants  # noqa: F401
