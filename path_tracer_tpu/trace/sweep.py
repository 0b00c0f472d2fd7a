"""Gather-free BVH traversal: DFS stream sweep with skip links.

Motivation (measured on v5e): XLA's per-lane random gather sustains only
~300M rows/s inside a dependent loop — a hard ceiling of a few Mrays/s for
stack-based traversal. The VPU, however, streams elementwise work at TFLOP/s.
For scenes whose BVH fits a modest instruction stream, the fastest TPU
traversal does *no random access at all*:

The BVH is serialized host-side into a DFS-preorder stream of rows (interior
node / leaf node / triangle). Every lane walks the stream front to back; a
lane that misses a node's AABB sets its ``skip_until`` register to the node's
skip link (the DFS position just past its subtree), masking it off for the
whole subtree. Node data is indexed by the *loop counter* — a scalar
broadcast, not a gather. Triangle rows run the Havel-Herout test with the ray
pre-translated to the enclosing leaf's AABB entry distance, exactly like the
stack traversal (primitive.rs:147-155 semantics).

Row layout ([ROW_W] f32):
  col 0      type: 0 = node, 1 = triangle
  col 1..6   node bb_min / bb_max (triangle rows: +inf/-inf box, never hits)
  col 7      skip_to (exact float value; triangle rows: i+1, a no-op)
  col 8..19  triangle n0,d0,n1,d1,n2,d2 (node rows: zeros -> det==0, no hit)
  col 20     triangle id (exact float value)
  col 21..23 pad

Complexity is O(stream length) per ray — unbeatable for small scenes (the
Cornell-class benchmarks), hopeless for million-triangle meshes, where the
stack+gather traversal (`trace.traversal`) takes over. `scene.Scene.device`
builds the stream only when the scene is under `SWEEP_MAX_ROWS`.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from path_tracer_tpu.core.constants import EPSILON, INFINITY

ROW_W = 24
SWEEP_MAX_ROWS = 8192
# Streams up to this many rows are fully unrolled at trace time with the row
# data baked in as compile-time constants: no loop, no dynamic slices, and
# each row emits only its own kind of math (node slab test OR triangle test).
UNROLL_MAX_ROWS = 1024
UNROLL = 8


@jax.tree_util.register_static
class StaticStream:
    """Hashable compile-time wrapper for a DFS stream.

    Registered as a static pytree node so it can ride inside the scene dict
    through ``jit``/``shard_map`` without becoming a traced array; traversal
    specializes on its contents (equal streams share compiled programs).
    """

    def __init__(self, rows: np.ndarray):
        self.rows = np.ascontiguousarray(rows, np.float32)
        self._key = (self.rows.shape, self.rows.tobytes())

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, StaticStream) and self._key == other._key


def build_stream(flat: dict, tri_packed: np.ndarray) -> np.ndarray:
    """Serialize a flattened dual-child BVH (`scene.bvh.flatten` format) +
    packed triangles into the DFS row stream. Host-side, O(rows)."""
    tri_packed = np.asarray(tri_packed, np.float32)
    rows: list[np.ndarray] = []

    def node_row(bb_min, bb_max):
        r = np.zeros(ROW_W, np.float32)
        r[1:4] = bb_min
        r[4:7] = bb_max
        return r

    def tri_row(tid: int, position: int):
        r = np.zeros(ROW_W, np.float32)
        r[0] = 1.0
        r[1:4] = np.inf
        r[4:7] = -np.inf
        r[7] = np.float32(position + 1)  # no-op skip
        r[8:20] = tri_packed[tid, :12]
        r[20] = np.float32(tid)
        return r

    def emit_record(rec: int):
        for c in ("c0", "c1"):
            count = int(flat[f"{c}_count"][rec])
            if count == -1:
                continue
            idx = int(flat[f"{c}_idx"][rec])
            pos = len(rows)
            rows.append(node_row(flat[f"{c}_min"][rec], flat[f"{c}_max"][rec]))
            if count == 0:
                emit_record(idx)
            else:
                for k in range(count):
                    rows.append(tri_row(idx + k, len(rows)))
            rows[pos][7] = np.float32(len(rows))

    import sys

    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 100000))
    try:
        emit_record(0)
    finally:
        sys.setrecursionlimit(old)
    return np.stack(rows)


def build_flat_stream(tri_packed: np.ndarray) -> np.ndarray:
    """Triangle-only stream: brute force over all T triangles, no node rows.

    On a SIMD machine the BVH node rows of `build_stream` save no time — a
    lane that misses a box is masked, but the row is still processed by every
    lane — so for small scenes the shortest stream is simply the triangles
    themselves (~2.8x fewer rows than the BVH serialization). Precision is
    ``intersect_naive`` (no leaf pre-translation), matching the dense engines.
    """
    tri_packed = np.asarray(tri_packed, np.float32)
    t = tri_packed.shape[0]
    rows = np.zeros((t, ROW_W), np.float32)
    rows[:, 0] = 1.0
    rows[:, 1:4] = np.inf
    rows[:, 4:7] = -np.inf
    rows[:, 7] = np.arange(1, t + 1, dtype=np.float32)  # no-op skip
    rows[:, 8:20] = tri_packed[:, :12]
    rows[:, 20] = np.arange(t, dtype=np.float32)
    return rows


# Scenes at or below this triangle count use the flat (triangle-only) stream.
FLAT_STREAM_MAX_TRIS = 256


def _row_step(row, state, origin, direction, inv_d, i, any_mode):
    """Process stream row ``i`` (a [ROW_W] vector broadcast to all lanes)."""
    skip_until, t_max, best, best_u, best_v, leaf_t, found = state

    active = i >= skip_until

    # --- node part: slab test (boundingbox.rs:115-131) ---
    bb_min = row[1:4]
    bb_max = row[4:7]
    t0 = (bb_min - origin) * inv_d
    t1 = (bb_max - origin) * inv_d
    eps = jnp.float32(EPSILON)
    lim = t_max[:, None]
    t_small = jnp.minimum(jnp.maximum(t0, eps), jnp.maximum(t1, eps))
    t_big = jnp.maximum(jnp.minimum(t0, lim), jnp.minimum(t1, lim))
    t_enter = jnp.max(t_small, axis=-1)
    box_hit = t_enter <= jnp.min(t_big, axis=-1)

    skip_to = row[7].astype(jnp.int32)
    skip_until = jnp.where(active & ~box_hit, skip_to, skip_until)
    is_node = row[0] == 0.0
    leaf_t = jnp.where(active & box_hit & is_node, t_enter, leaf_t)

    # --- triangle part: pre-translated Havel-Herout (primitive.rs:147-178) ---
    n0 = row[8:11]
    d0 = row[11]
    n1 = row[12:15]
    d1 = row[15]
    n2 = row[16:19]
    d2 = row[19]
    t_est = leaf_t
    o = origin + direction * t_est[:, None]
    tmin_l = eps - t_est
    tmax_l = t_max - t_est

    det = direction @ n0
    td = d0 - o @ n0
    same = lambda a, b: (a >= 0.0) == (b >= 0.0)
    c1 = same(td - det * tmin_l, det * tmax_l - td)
    p = det[:, None] * o + td[:, None] * direction
    ud = p @ n1 + det * d1
    c2 = same(ud, det - ud)
    vd = p @ n2 + det * d2
    c3 = same(vd, det - ud - vd)
    tri_hit = active & c1 & c2 & c3 & (det != 0.0)

    inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
    t_world = td * inv_det + t_est
    tid = row[20].astype(jnp.int32)

    if any_mode:
        found = found | tri_hit
    else:
        t_max = jnp.where(tri_hit, t_world, t_max)
        best = jnp.where(tri_hit, tid, best)
        best_u = jnp.where(tri_hit, ud * inv_det, best_u)
        best_v = jnp.where(tri_hit, vd * inv_det, best_v)

    return (skip_until, t_max, best, best_u, best_v, leaf_t, found)


def _sweep(stream, origin, direction, t_limit, any_mode: bool):
    n = origin.shape[0]
    s_rows = stream.shape[0]
    inv_d = 1.0 / direction

    state = (
        jnp.zeros(n, jnp.int32),  # skip_until
        t_limit,  # t_max
        jnp.full(n, -1, jnp.int32),  # best
        jnp.zeros(n, jnp.float32),  # best_u
        jnp.zeros(n, jnp.float32),  # best_v
        jnp.zeros(n, jnp.float32),  # leaf_t
        jnp.zeros(n, jnp.bool_),  # found (any mode)
    )

    steps = -(-s_rows // UNROLL)

    if any_mode:
        # while_loop so fully-found waves exit early
        def cond(c):
            i, state = c
            return (i < steps) & ~jnp.all(state[6] | (t_limit <= 0.0))

        def body(c):
            i, state = c
            base = i * UNROLL
            for k in range(UNROLL):
                idx = jnp.minimum(base + k, s_rows - 1)
                row = jax.lax.dynamic_slice(stream, (idx, 0), (1, ROW_W))[0]
                state = _row_step(row, state, origin, direction, inv_d, base + k, True)
            return (i + 1, state)

        _, state = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
    else:
        def body(i, state):
            base = i * UNROLL
            for k in range(UNROLL):
                idx = jnp.minimum(base + k, s_rows - 1)
                row = jax.lax.dynamic_slice(stream, (idx, 0), (1, ROW_W))[0]
                state = _row_step(row, state, origin, direction, inv_d, base + k, False)
            return state

        state = jax.lax.fori_loop(0, steps, body, state)

    return state


@jax.jit
def sweep_closest_hit(stream, origin, direction, t_limit):
    """Closest hit over the DFS stream. Same contract as
    `traversal.closest_hit`: returns (tri_idx, t, u, v)."""
    sk, t_max, best, bu, bv, _, _ = _sweep(stream, origin, direction, t_limit, False)
    return best, t_max, bu, bv


@jax.jit
def sweep_any_hit(stream, origin, direction, t_limit):
    """Any hit with t in (EPSILON, t_limit), like `traversal.any_hit`."""
    out = _sweep(stream, origin, direction, t_limit, True)
    return out[6]


# --------------------- statically unrolled variant ---------------------
#
# All row data enters as PYTHON FLOAT LITERALS and all per-lane math is on
# [N] component arrays. Two measured v5e reasons (2026-08-16 profile of the
# headline render):
#   * a ``[N,3] @ [3]`` matvec compiles to multiply+cross-lane-reduce over a
#     128-lane-padded tile — 4.2 us each at 16K lanes; the triangle tests'
#     dots were 66% of total device time. Componentwise literal math fuses at
#     full lane density.
#   * ``jnp.asarray(row_slice)`` constants become device buffers whose use
#     inside a loop carries a flat ~240 us/iteration sync; literals don't.


def _node_step_static(box, skip_to, is_leaf, state, rc, i):
    """Node row with compile-time box/skip data: slab test only.
    ``box`` = 6 python floats; ``rc`` = per-component ray arrays."""
    skip_until, t_max, best, best_u, best_v, leaf_t, found = state
    ox, oy, oz, dx, dy, dz, ix, iy, iz = rc
    active = i >= skip_until
    eps = jnp.float32(EPSILON)
    bx0, by0, bz0, bx1, by1, bz1 = box
    tx0 = (bx0 - ox) * ix
    tx1 = (bx1 - ox) * ix
    ty0 = (by0 - oy) * iy
    ty1 = (by1 - oy) * iy
    tz0 = (bz0 - oz) * iz
    tz1 = (bz1 - oz) * iz
    small = lambda a, b: jnp.minimum(jnp.maximum(a, eps), jnp.maximum(b, eps))
    big = lambda a, b: jnp.maximum(jnp.minimum(a, t_max), jnp.minimum(b, t_max))
    t_enter = jnp.maximum(jnp.maximum(small(tx0, tx1), small(ty0, ty1)), small(tz0, tz1))
    t_exit = jnp.minimum(jnp.minimum(big(tx0, tx1), big(ty0, ty1)), big(tz0, tz1))
    box_hit = t_enter <= t_exit
    skip_until = jnp.where(active & ~box_hit, jnp.int32(skip_to), skip_until)
    if is_leaf:
        leaf_t = jnp.where(active & box_hit, t_enter, leaf_t)
    return (skip_until, t_max, best, best_u, best_v, leaf_t, found)


def _tri_step_static(tc, tid, state, rc, i, any_mode, pretranslated):
    """Triangle row with compile-time plane data (Havel-Herout).
    ``tc`` = 12 python floats (n0,d0,n1,d1,n2,d2); ``rc`` = ray components.
    ``pretranslated`` is False for flat (triangle-only) streams, compiling
    out the leaf_t terms entirely."""
    skip_until, t_max, best, best_u, best_v, leaf_t, found = state
    n0x, n0y, n0z, d0, n1x, n1y, n1z, d1, n2x, n2y, n2z, d2 = tc
    ox, oy, oz, dx, dy, dz, _, _, _ = rc
    eps = jnp.float32(EPSILON)

    if pretranslated:
        t_est = leaf_t
        px_o = ox + dx * t_est
        py_o = oy + dy * t_est
        pz_o = oz + dz * t_est
        tmin_l = eps - t_est
        tmax_l = t_max - t_est
    else:
        px_o, py_o, pz_o = ox, oy, oz
        tmin_l = eps
        tmax_l = t_max

    det = dx * n0x + dy * n0y + dz * n0z
    td = d0 - (px_o * n0x + py_o * n0y + pz_o * n0z)
    same = lambda a, b: (a >= 0.0) == (b >= 0.0)
    c1 = same(td - det * tmin_l, det * tmax_l - td)
    px = det * px_o + td * dx
    py = det * py_o + td * dy
    pz = det * pz_o + td * dz
    ud = px * n1x + py * n1y + pz * n1z + det * d1
    c2 = same(ud, det - ud)
    vd = px * n2x + py * n2y + pz * n2z + det * d2
    c3 = same(vd, det - ud - vd)
    tri_hit = c1 & c2 & c3 & (det != 0.0)
    if pretranslated:
        tri_hit = tri_hit & (i >= skip_until)

    if any_mode:
        found = found | tri_hit
    else:
        inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
        t_world = td * inv_det + (t_est if pretranslated else 0.0)
        t_max = jnp.where(tri_hit, t_world, t_max)
        best = jnp.where(tri_hit, jnp.int32(tid), best)
        best_u = jnp.where(tri_hit, ud * inv_det, best_u)
        best_v = jnp.where(tri_hit, vd * inv_det, best_v)
    return (skip_until, t_max, best, best_u, best_v, leaf_t, found)


def _sweep_static(stream: StaticStream, origin, direction, t_limit, any_mode: bool):
    """Straight-line traversal with the stream baked in as literals."""
    rows = stream.rows
    n = origin.shape[0]
    state = (
        jnp.zeros(n, jnp.int32),
        t_limit,
        jnp.full(n, -1, jnp.int32),
        jnp.zeros(n, jnp.float32),
        jnp.zeros(n, jnp.float32),
        jnp.zeros(n, jnp.float32),
        jnp.zeros(n, jnp.bool_),
    )
    s_rows = rows.shape[0]
    skips = rows[:, 7].astype(np.int64)
    types = rows[:, 0]
    has_nodes = bool((types == 0.0).any())
    ox, oy, oz = origin[:, 0], origin[:, 1], origin[:, 2]
    dx, dy, dz = direction[:, 0], direction[:, 1], direction[:, 2]
    if has_nodes:
        rc = (ox, oy, oz, dx, dy, dz, 1.0 / dx, 1.0 / dy, 1.0 / dz)
    else:
        rc = (ox, oy, oz, dx, dy, dz, None, None, None)
    for i in range(s_rows):
        if types[i] == 0.0:
            # leaf iff the next row is a triangle row
            is_leaf = i + 1 < s_rows and types[i + 1] == 1.0
            state = _node_step_static(
                tuple(float(v) for v in rows[i, 1:7]),
                int(skips[i]), is_leaf, state, rc, i,
            )
        else:
            tc = tuple(float(v) for v in rows[i, 8:20])
            tid = int(rows[i, 20])
            state = _tri_step_static(tc, tid, state, rc, i, any_mode, has_nodes)
    return state


def sweep_closest_hit_static(stream: StaticStream, origin, direction, t_limit):
    _, t_max, best, bu, bv, _, _ = _sweep_static(stream, origin, direction, t_limit, False)
    return best, t_max, bu, bv


def sweep_any_hit_static(stream: StaticStream, origin, direction, t_limit):
    return _sweep_static(stream, origin, direction, t_limit, True)[6]
