"""Dense chunked ray x triangle intersection — the mid-size scene engine.

For scenes too big to unroll as a DFS stream (> ~1K rows) but far below the
point where BVH asymptotics beat raw throughput, the fastest TPU strategy is
to skip the BVH entirely: test EVERY triangle against every ray in chunks.
All memory access is sequential (static chunk slices — no gathers), the
ray·plane dot products are ``[N,3] @ [3,C]`` matmuls on the MXU, and the
selection math is elementwise VPU work. Measured against the stack+gather
traversal on v5e this is ~50x faster for few-thousand-triangle scenes.

The test evaluates the same Havel-Herout planes as the other engines
(primitive.rs:117-144 without pre-translation — the reference's
``intersect_naive`` precision), expanded so every per-pair quantity comes
from ray-independent matmuls:

  det = d.n0            td = d0 - o.n0
  ud  = det*(o.n1 + d1) + td*(d.n1)     (p = det*o + td*d substituted)
  vd  = det*(o.n2 + d2) + td*(d.n2)

Same-sign conditions are evaluated on (ud, det-ud) etc. exactly like
``_tri_intersect``; the closest hit is a running min over chunks.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from path_tracer_tpu.core.constants import EPSILON

# Triangle count below which the dense engine replaces stack traversal.
# Generous on purpose: below ~30K triangles the dense engine beats the
# stack+gather engine on v5e, and it has been stable where the stack engine
# intermittently faulted the TPU tunnel.
DENSE_MAX_TRIS = 32768
CHUNK = 512


def pack_dense(tri: dict) -> dict[str, np.ndarray]:
    """Transpose plane data into matmul-ready ``[3, T]`` (padded to CHUNK)."""
    t = np.asarray(tri["d0"]).shape[0]
    pad = (-t) % CHUNK

    def padded(a, fill=0.0):
        a = np.asarray(a, np.float32)
        if pad:
            a = np.concatenate([a, np.full((pad,) + a.shape[1:], fill, np.float32)])
        return a

    from path_tracer_tpu.trace.traversal import pack_tris

    return {
        "n0T": padded(tri["n0"]).T.copy(),  # [3, T'] — pad rows give det==0
        "n1T": padded(tri["n1"]).T.copy(),
        "n2T": padded(tri["n2"]).T.copy(),
        "d0": padded(tri["d0"]),
        "d1": padded(tri["d1"]),
        "d2": padded(tri["d2"]),
        # row table for the final winner u/v recompute
        "tri_rows": pack_tris(tri),
    }


def _chunk_hits(dense, c0, o, d, t_limit):
    """Intersection candidates for triangle chunk [c0, c0+CHUNK)."""
    sl = lambda m: jax.lax.dynamic_slice(m, (0, c0), (3, CHUNK))
    sv = lambda v: jax.lax.dynamic_slice(v, (c0,), (CHUNK,))

    hp = jax.lax.Precision.HIGHEST
    n0 = sl(dense["n0T"])
    det = jnp.dot(d, n0, precision=hp)  # [N, C]
    td = sv(dense["d0"])[None, :] - jnp.dot(o, n0, precision=hp)

    n1 = sl(dense["n1T"])
    ud = det * (jnp.dot(o, n1, precision=hp) + sv(dense["d1"])[None, :]) + td * jnp.dot(d, n1, precision=hp)
    n2 = sl(dense["n2T"])
    vd = det * (jnp.dot(o, n2, precision=hp) + sv(dense["d2"])[None, :]) + td * jnp.dot(d, n2, precision=hp)

    same = lambda a, b: (a >= 0.0) == (b >= 0.0)
    c2 = same(ud, det - ud)
    c3 = same(vd, det - ud - vd)

    safe_det = jnp.where(det == 0.0, 1.0, det)
    t = td / safe_det
    ok = c2 & c3 & (det != 0.0) & (t > EPSILON) & (t < t_limit[:, None])
    return ok, t, ud / safe_det, vd / safe_det


@jax.jit
def dense_closest_hit(dense, origin, direction, t_limit):
    """Same contract as `traversal.closest_hit`: (tri_idx, t, u, v).

    The chunk loop is Python-unrolled and chunks are INDEPENDENT (each masks
    against the caller's ``t_limit``, not a running minimum) so XLA can fuse
    and overlap them — a ``lax.fori_loop`` carrying t_max serializes every
    iteration. The winner's barycentrics are recomputed once at the end from
    its plane rows, avoiding per-chunk ``take_along_axis`` gathers.
    """
    total = dense["n0T"].shape[1]
    chunks = total // CHUNK

    t_bests = []
    j_bests = []
    for c in range(chunks):
        c0 = c * CHUNK
        ok, t, _, _ = _chunk_hits(dense, c0, origin, direction, t_limit)
        t_masked = jnp.where(ok, t, jnp.inf)
        j_bests.append(c0 + jnp.argmin(t_masked, axis=1))
        t_bests.append(jnp.min(t_masked, axis=1))
    t_stack = jnp.stack(t_bests)  # [K, N]
    j_stack = jnp.stack(j_bests)
    k = jnp.argmin(t_stack, axis=0)
    t_best = jnp.min(t_stack, axis=0)
    j_best = jnp.take_along_axis(j_stack, k[None, :], axis=0)[0]
    hit = jnp.isfinite(t_best)
    best = jnp.where(hit, j_best, -1)
    t_max = jnp.where(hit, t_best, t_limit)

    # Winner u/v via one gathered Havel-Herout evaluation (values independent
    # of the t-window; masked on miss lanes).
    from path_tracer_tpu.trace.traversal import _tri_intersect

    _, _, u, v = _tri_intersect(
        dense["tri_rows"], jnp.maximum(best, 0), origin, direction,
        jnp.float32(EPSILON), jnp.where(hit, t_max + 1.0, 1.0),
    )
    u = jnp.where(hit, u, 0.0)
    v = jnp.where(hit, v, 0.0)
    return best, t_max, u, v


@jax.jit
def dense_any_hit(dense, origin, direction, t_limit):
    """Early-exiting shadow test over chunks."""
    total = dense["n0T"].shape[1]
    chunks = total // CHUNK
    n = origin.shape[0]

    def cond(s):
        i, found = s
        return (i < chunks) & ~jnp.all(found | (t_limit <= 0.0))

    def body(s):
        i, found = s
        ok, _, _, _ = _chunk_hits(dense, i * CHUNK, origin, direction, t_limit)
        return i + 1, found | jnp.any(ok, axis=1)

    _, found = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.zeros(n, jnp.bool_)))
    return found
