"""Counter-based, order-invariant RNG for wavefront path tracing.

The reference uses a thread-local wyrand generator (``nanorand::TlsWyRand``,
drawn at e.g. ``src/integrator.rs:169``, ``src/tlas/tlas_bvh/blas/primitive/material.rs:259``),
whose stream depends on rayon scheduling. On TPU we need per-lane streams that
are a pure function of (pixel, sample, bounce, draw-site) so that:

* the image is deterministic regardless of batch/tile order, and
* multi-chip sharded renders are bit-identical to single-chip renders
  (SURVEY.md §7 hard part #6).

We use ``pcg4d`` (Jarzynski & Olano, "Hash Functions for GPU Rendering", JCGT
2020) — 4 rounds of LCG+mix on a uvec4, high-quality and cheap on the VPU.
Each call yields 4 independent uint32 lanes from a 4-word counter.
"""

from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32
# 1 / 2^24, scaling 24 high bits into [0, 1). f32 can represent all 2^24 values.
_INV_24 = jnp.float32(1.0 / 16777216.0)


def pcg4d(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray, d: jnp.ndarray):
    """pcg4d hash of four uint32 arrays -> four uint32 arrays (same shape)."""
    v0 = a.astype(_U32) * _U32(1664525) + _U32(1013904223)
    v1 = b.astype(_U32) * _U32(1664525) + _U32(1013904223)
    v2 = c.astype(_U32) * _U32(1664525) + _U32(1013904223)
    v3 = d.astype(_U32) * _U32(1664525) + _U32(1013904223)

    v0 = v0 + v1 * v3
    v1 = v1 + v2 * v0
    v2 = v2 + v0 * v1
    v3 = v3 + v1 * v2

    v0 = v0 ^ (v0 >> 16)
    v1 = v1 ^ (v1 >> 16)
    v2 = v2 ^ (v2 >> 16)
    v3 = v3 ^ (v3 >> 16)

    v0 = v0 + v1 * v3
    v1 = v1 + v2 * v0
    v2 = v2 + v0 * v1
    v3 = v3 + v1 * v2
    return v0, v1, v2, v3


def u32_to_unit_float(x: jnp.ndarray) -> jnp.ndarray:
    """uint32 -> f32 in [0, 1) using the top 24 bits."""
    return (x >> 8).astype(jnp.float32) * _INV_24


def uniform4(lane_id: jnp.ndarray, sample_id, bounce, stream) -> jnp.ndarray:
    """Four independent U[0,1) floats per lane, shape ``lane_id.shape + (4,)``.

    ``lane_id`` is typically the flat pixel index; ``sample_id``/``bounce``/
    ``stream`` may be scalars (traced or static).
    """
    shp = jnp.shape(lane_id)
    b = jnp.broadcast_to(jnp.asarray(sample_id, _U32), shp)
    c = jnp.broadcast_to(jnp.asarray(bounce, _U32), shp)
    d = jnp.broadcast_to(jnp.asarray(stream, _U32), shp)
    r0, r1, r2, r3 = pcg4d(jnp.asarray(lane_id, _U32), b, c, d)
    return jnp.stack(
        [u32_to_unit_float(r0), u32_to_unit_float(r1), u32_to_unit_float(r2), u32_to_unit_float(r3)],
        axis=-1,
    )


class StreamCounter:
    """Hands out distinct static stream ids for each RNG draw site.

    Used during tracing of the integrator so every ``uniform4`` call in a
    bounce gets its own stream; the ids are Python ints and bake into the
    compiled program.
    """

    def __init__(self, start: int = 0):
        self._next = start

    def next(self) -> int:
        v = self._next
        self._next += 1
        return v
