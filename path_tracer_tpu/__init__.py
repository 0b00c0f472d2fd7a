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

# Persistent compilation cache: TPU compiles of the wavefront loop run
# 20-40 s each; caching them on disk makes every bench/CLI process after the
# first start in seconds (and lets a short hardware window cover the whole
# measurement session). PT_COMPILE_CACHE=0 disables; PT_COMPILE_CACHE=<dir>
# relocates. Failures (read-only fs, version skew) degrade to cold compiles.
_cache = __import__("os").environ.get("PT_COMPILE_CACHE", "1")
if _cache != "0":
    import hashlib as _hashlib
    import os as _os
    import platform as _platform

    # XLA:CPU AOT entries embed host ISA features and are NOT keyed by them —
    # reusing a cache dir on a different host risks SIGILL (observed warning,
    # cpu_aot_loader.cc). Partition the dir by a host fingerprint so a new
    # machine starts a fresh cache instead of loading foreign code. TPU
    # entries are keyed by compiler/platform internally, but partitioning is
    # harmless there.
    try:
        _flags = ""
        try:
            with open("/proc/cpuinfo") as _f:
                for _line in _f:
                    if _line.startswith("flags"):
                        _flags = _line
                        break
        except OSError:
            pass
        _fp = _hashlib.sha1((_platform.machine() + _flags).encode()).hexdigest()[:10]
        _cache_dir = (
            _cache
            if _cache not in ("", "1")
            else _os.path.join(
                _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                ".jax_cache",
                _fp,
            )
        )
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

from path_tracer_tpu.core import constants  # noqa: F401
