"""Batched BVH traversal: closest-hit and any-hit over flattened node arrays.

TPU-native replacement for the reference's pointer-chasing ordered-stack
traversal (``src/tlas/tlas_bvh/blas.rs:133-162,214-294``). The whole ray batch
advances in lock-step inside one ``lax.while_loop``; per-lane traversal stacks
live in ``[N, DEPTH]`` arrays, and every memory access is a batched gather
from the SoA node/triangle arrays. Matching reference behaviors:

* ordered near-child-first descent with the far child (and its entry distance)
  pushed for later (``blas.rs:133-162``) — stale entries whose ``t_enter``
  exceeds the current ``t_max`` are discarded on pop (``blas.rs:220-225``),
* slab test with EPSILON entry clamp (``boundingbox.rs:97-131``),
* Havel-Herout triangle test with ray pre-translation to the leaf's AABB entry
  distance for precision (``primitive.rs:117-189``).

Lane state encoding: ``cur >= 0`` — internal node index to expand;
``cur == -1`` — pop needed; ``cur <= -2`` — leaf reference encoding
``(prim_start, count)`` as ``-(start * (MAX_LEAF+1) + count) - 2``.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from path_tracer_tpu.core.constants import EPSILON, INFINITY
from path_tracer_tpu.trace.gather import gather_rows

# Must match the builder's leaf cap (scene/bvh.py uses leaves of any size from
# SAH collapse; the scene assembler passes max_leaf=MAX_LEAF).
MAX_LEAF = 4
STACK_DEPTH = 48
_POP = -1


def _encode_leaf(idx, count):
    return -(idx * (MAX_LEAF + 1) + count) - 2


def _decode_leaf(code):
    v = -(code + 2)
    return v // (MAX_LEAF + 1), v % (MAX_LEAF + 1)


def _slab(bb_min, bb_max, o, inv_d, t_max):
    """Batched AABB slab test (boundingbox.rs:115-131). Returns (hit, t_enter)."""
    t0 = (bb_min - o) * inv_d
    t1 = (bb_max - o) * inv_d
    eps = jnp.float32(EPSILON)
    tmax_v = t_max[..., None]
    t_small = jnp.minimum(jnp.maximum(t0, eps), jnp.maximum(t1, eps))
    t_big = jnp.maximum(jnp.minimum(t0, tmax_v), jnp.minimum(t1, tmax_v))
    t_enter = jnp.max(t_small, axis=-1)
    hit = t_enter <= jnp.min(t_big, axis=-1)
    return hit, t_enter


def _same_sign(a, b):
    return (a >= 0.0) == (b >= 0.0)


def _tri_intersect(tri_packed, idx, o, d, t_min, t_max):
    """Batched Havel-Herout test for triangle ``idx`` per lane.

    ``tri_packed``: the ``[T, 16]`` row table from `pack_tris` — one gather
    fetches all plane data. ``o`` must already be pre-translated
    (primitive.rs:147-155); ``t_min``/``t_max`` are in the translated frame.
    Returns (hit, t, u, v) with t in the translated frame.
    """
    rows = gather_rows(tri_packed, idx)  # [N, 16]
    d0 = rows[:, 3]
    d1 = rows[:, 7]
    d2 = rows[:, 11]

    # Componentwise dots (a jnp.sum over the 3-wide minor axis is a padded
    # cross-lane reduce on TPU — 4.2 us/op at 16K lanes; this form fuses).
    def dot3(ax, ay, az, b):
        return ax * b[:, 0] + ay * b[:, 1] + az * b[:, 2]

    det = dot3(rows[:, 0], rows[:, 1], rows[:, 2], d)
    td = d0 - dot3(rows[:, 0], rows[:, 1], rows[:, 2], o)

    c1 = _same_sign(td - det * t_min, det * t_max - td)

    px = det * o[:, 0] + td * d[:, 0]
    py = det * o[:, 1] + td * d[:, 1]
    pz = det * o[:, 2] + td * d[:, 2]
    ud = rows[:, 4] * px + rows[:, 5] * py + rows[:, 6] * pz + det * d1
    c2 = _same_sign(ud, det - ud)
    vd = rows[:, 8] * px + rows[:, 9] * py + rows[:, 10] * pz + det * d2
    c3 = _same_sign(vd, det - ud - vd)

    hit = c1 & c2 & c3
    inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
    t = td * inv_det
    u = ud * inv_det
    v = vd * inv_det
    # det == 0 (parallel / degenerate) can slip through the sign tests
    hit = hit & (det != 0.0)
    return hit, t, u, v


def pack_bvh(flat: dict) -> jnp.ndarray:
    """Pack the 8 flat node arrays into one ``[M, 16]`` f32 row table.

    HBM-bandwidth optimization: one gather per traversal step instead of
    eight. Row layout: c0_min(3) c0_max(3) c1_min(3) c1_max(3)
    c0_idx c0_count c1_idx c1_count.

    Integer fields are stored as exact float VALUES (not bit patterns):
    the one-hot matmul gather (trace/gather.py) multiplies rows by 0/1, and
    int32 bit patterns reinterpreted as floats are denormals/NaNs that get
    flushed or poisoned by the MXU. Values < 2^24 are exact in f32.
    """
    f = lambda k: np.asarray(flat[k], np.float32)

    def i(k):
        v = np.asarray(flat[k], np.int64)
        assert np.abs(v).max(initial=0) < (1 << 24), "index exceeds f32 exact range"
        return v.astype(np.float32)[:, None]
    rows = np.concatenate(
        [f("c0_min"), f("c0_max"), f("c1_min"), f("c1_max"),
         i("c0_idx"), i("c0_count"), i("c1_idx"), i("c1_count")],
        axis=1,
    )
    return rows.astype(np.float32)


def pack_tris(tri: dict) -> jnp.ndarray:
    """Pack Havel-Herout plane data into one ``[T, 16]`` f32 row table:
    n0(3) d0 n1(3) d1 n2(3) d2 + 4 pad lanes (128-friendly width)."""
    t = np.asarray(tri["d0"]).shape[0]
    rows = np.concatenate(
        [
            np.asarray(tri["n0"], np.float32), np.asarray(tri["d0"], np.float32)[:, None],
            np.asarray(tri["n1"], np.float32), np.asarray(tri["d1"], np.float32)[:, None],
            np.asarray(tri["n2"], np.float32), np.asarray(tri["d2"], np.float32)[:, None],
            np.zeros((t, 4), np.float32),
        ],
        axis=1,
    )
    return rows


def _child_codes_packed(packed: jnp.ndarray, ni):
    """Single-gather fetch of both children of internal nodes ``ni``."""
    rows = gather_rows(packed, ni)  # [N, 16]
    ints = rows[:, 12:16].astype(jnp.int32)  # stored as exact float values
    out = []
    for c in range(2):
        cmin = rows[:, 6 * c : 6 * c + 3]
        cmax = rows[:, 6 * c + 3 : 6 * c + 6]
        cidx = ints[:, 2 * c]
        ccount = ints[:, 2 * c + 1]
        code = jnp.where(ccount > 0, _encode_leaf(cidx, ccount), cidx)
        out.append((cmin, cmax, code, ccount != -1))
    return out


def _stack_read(stack, sp):
    """Per-lane stack top via iota-compare select (TPU scatter/gather-free)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, stack.shape, 1)
    sel = iota == sp[:, None]
    return jnp.sum(jnp.where(sel, stack, jnp.zeros((), stack.dtype)), axis=1)


def _stack_write(stack, sp, value):
    iota = jax.lax.broadcasted_iota(jnp.int32, stack.shape, 1)
    return jnp.where(iota == sp[:, None], value[:, None], stack)


@jax.jit
def _closest_hit_impl(nodes_packed, tri_packed, origin, direction, t_limit):
    n = origin.shape[0]
    inv_d = 1.0 / direction

    state = dict(
        cur=jnp.zeros(n, jnp.int32),  # start at root internal node 0
        cur_t=jnp.zeros(n, jnp.float32),  # entry distance of `cur` (leaf t_estimate)
        sp=jnp.zeros(n, jnp.int32),
        stack_node=jnp.zeros((n, STACK_DEPTH), jnp.int32),
        stack_t=jnp.zeros((n, STACK_DEPTH), jnp.float32),
        t_max=t_limit,
        best=jnp.full(n, -1, jnp.int32),
        best_u=jnp.zeros(n, jnp.float32),
        best_v=jnp.zeros(n, jnp.float32),
    )

    def live(s):
        return (s["cur"] != _POP) | (s["sp"] > 0)

    def cond(s):
        return jnp.any(live(s))

    def body(s):
        cur, cur_t, sp, t_max = s["cur"], s["cur_t"], s["sp"], s["t_max"]
        stack_node, stack_t = s["stack_node"], s["stack_t"]

        # --- pop for lanes needing it (discard stale entries immediately) ---
        do_pop = (cur == _POP) & (sp > 0)
        sp_after = jnp.where(do_pop, sp - 1, sp)
        popped = _stack_read(stack_node, sp_after)
        popped_t = _stack_read(stack_t, sp_after)
        fresh = do_pop & (popped_t <= t_max)
        cur = jnp.where(fresh, popped, cur)
        cur_t = jnp.where(fresh, popped_t, cur_t)
        sp = sp_after

        is_internal = cur >= 0
        is_leaf = cur <= -2

        # --- internal step: test both children, descend near, push far ---
        ni = jnp.where(is_internal, cur, 0)
        (c0min, c0max, code0, ok0), (c1min, c1max, code1, ok1) = _child_codes_packed(nodes_packed, ni)
        hit0, t0 = _slab(c0min, c0max, origin, inv_d, t_max)
        hit1, t1 = _slab(c1min, c1max, origin, inv_d, t_max)
        hit0 = hit0 & ok0
        hit1 = hit1 & ok1

        near_first = t0 <= t1
        ncode = jnp.where(near_first, code0, code1)
        ntime = jnp.where(near_first, t0, t1)
        fcode = jnp.where(near_first, code1, code0)
        ftime = jnp.where(near_first, t1, t0)

        both = hit0 & hit1
        push = is_internal & both
        stack_node = jnp.where(push[:, None], _stack_write(stack_node, sp, fcode), stack_node)
        stack_t = jnp.where(push[:, None], _stack_write(stack_t, sp, ftime), stack_t)
        sp = jnp.where(push, sp + 1, sp)

        next_internal = jnp.where(
            both, ncode,
            jnp.where(hit0, code0, jnp.where(hit1, code1, _POP)),
        )
        next_internal_t = jnp.where(
            both, ntime, jnp.where(hit0, t0, jnp.where(hit1, t1, 0.0)),
        )

        # --- leaf step: test up to MAX_LEAF triangles with pre-translation ---
        start, count = _decode_leaf(jnp.where(is_leaf, cur, -2))
        t_est = cur_t
        o_moved = origin + direction * t_est[:, None]
        best, best_u, best_v = s["best"], s["best_u"], s["best_v"]
        for k in range(MAX_LEAF):
            tri_idx = jnp.clip(start + k, 0, tri_packed.shape[0] - 1)
            lane_on = is_leaf & (k < count)
            h, t, u, v = _tri_intersect(
                tri_packed, tri_idx, o_moved, direction,
                jnp.float32(EPSILON) - t_est, t_max - t_est,
            )
            t_world = t + t_est
            upd = lane_on & h
            t_max = jnp.where(upd, t_world, t_max)
            best = jnp.where(upd, tri_idx, best)
            best_u = jnp.where(upd, u, best_u)
            best_v = jnp.where(upd, v, best_v)

        cur = jnp.where(is_internal, next_internal, _POP)
        cur_t = jnp.where(is_internal, next_internal_t, cur_t)

        return dict(
            cur=cur, cur_t=cur_t, sp=sp, stack_node=stack_node, stack_t=stack_t,
            t_max=t_max, best=best, best_u=best_u, best_v=best_v,
        )

    out = jax.lax.while_loop(cond, body, state)
    return out["best"], out["t_max"], out["best_u"], out["best_v"]


def closest_hit(bvh, tri, origin, direction, t_limit=None):
    """Closest intersection of each ray with the geometry.

    ``bvh``/``tri`` are the scene dicts; their ``"packed"`` row tables (see
    `pack_bvh`/`pack_tris`) are the only arrays touched in the hot loop.
    Returns ``(tri_idx, t, u, v)``; ``tri_idx == -1`` means miss (t is the
    unmodified limit there). Mirrors ``TLAS::intersect``/``BLAS::intersect``
    composition on the flattened world geometry.
    """
    n = origin.shape[0]
    if t_limit is None:
        t_limit = jnp.full(n, INFINITY, jnp.float32)
    if "stream_static" in bvh:
        from path_tracer_tpu.trace.sweep import sweep_closest_hit_static

        return sweep_closest_hit_static(bvh["stream_static"], origin, direction, t_limit)
    if "stream" in bvh:
        from path_tracer_tpu.trace.sweep import sweep_closest_hit

        return sweep_closest_hit(bvh["stream"], origin, direction, t_limit)
    if "dense_pl" in tri:
        from path_tracer_tpu.trace.dense_pallas import dense_pl_closest_hit

        return dense_pl_closest_hit(tri["dense_pl"], origin, direction, t_limit)
    if "dense_stream" in tri:
        from path_tracer_tpu.trace.dense_stream import dense_stream_closest_hit

        return dense_stream_closest_hit(tri["dense_stream"], origin, direction, t_limit)
    if "dense_pl_parts" in tri:
        from path_tracer_tpu.trace.dense_pallas import dense_pl_parts_closest_hit

        return dense_pl_parts_closest_hit(tri["dense_pl_parts"], origin, direction, t_limit)
    if "dense" in tri:
        from path_tracer_tpu.trace.dense import dense_closest_hit

        return dense_closest_hit(tri["dense"], origin, direction, t_limit)
    return _closest_hit_impl(bvh["packed"], tri["packed"], origin, direction, t_limit)


@jax.jit
def _any_hit_impl(nodes_packed, tri_packed, origin, direction, t_limit):
    n = origin.shape[0]
    inv_d = 1.0 / direction

    state = dict(
        cur=jnp.zeros(n, jnp.int32),
        cur_t=jnp.zeros(n, jnp.float32),
        sp=jnp.zeros(n, jnp.int32),
        stack_node=jnp.zeros((n, STACK_DEPTH), jnp.int32),
        stack_t=jnp.zeros((n, STACK_DEPTH), jnp.float32),
        found=jnp.zeros(n, jnp.bool_),
    )

    def cond(s):
        live = ((s["cur"] != _POP) | (s["sp"] > 0)) & ~s["found"]
        return jnp.any(live)

    def body(s):
        cur, cur_t, sp, found = s["cur"], s["cur_t"], s["sp"], s["found"]
        stack_node, stack_t = s["stack_node"], s["stack_t"]

        do_pop = (cur == _POP) & (sp > 0) & ~found
        sp_after = jnp.where(do_pop, sp - 1, sp)
        popped = _stack_read(stack_node, sp_after)
        popped_t = _stack_read(stack_t, sp_after)
        cur = jnp.where(do_pop, popped, cur)
        cur_t = jnp.where(do_pop, popped_t, cur_t)
        sp = sp_after

        is_internal = (cur >= 0) & ~found
        is_leaf = (cur <= -2) & ~found

        ni = jnp.where(is_internal, cur, 0)
        (c0min, c0max, code0, ok0), (c1min, c1max, code1, ok1) = _child_codes_packed(nodes_packed, ni)
        hit0, t0 = _slab(c0min, c0max, origin, inv_d, t_limit)
        hit1, t1 = _slab(c1min, c1max, origin, inv_d, t_limit)
        hit0 = hit0 & ok0
        hit1 = hit1 & ok1

        both = hit0 & hit1
        push = is_internal & both
        # unordered push (any_intersect needs no near-first order, blas.rs:257-294)
        stack_node = jnp.where(push[:, None], _stack_write(stack_node, sp, code1), stack_node)
        stack_t = jnp.where(push[:, None], _stack_write(stack_t, sp, t1), stack_t)
        sp = jnp.where(push, sp + 1, sp)
        next_code = jnp.where(hit0, code0, jnp.where(hit1, code1, _POP))
        next_t = jnp.where(hit0, t0, jnp.where(hit1, t1, 0.0))

        start, count = _decode_leaf(jnp.where(is_leaf, cur, -2))
        t_est = cur_t
        o_moved = origin + direction * t_est[:, None]
        for k in range(MAX_LEAF):
            tri_idx = jnp.clip(start + k, 0, tri_packed.shape[0] - 1)
            lane_on = is_leaf & (k < count)
            h, _, _, _ = _tri_intersect(
                tri_packed, tri_idx, o_moved, direction,
                jnp.float32(EPSILON) - t_est, t_limit - t_est,
            )
            found = found | (lane_on & h)

        cur = jnp.where(is_internal, next_code, _POP)
        cur_t = jnp.where(is_internal, next_t, cur_t)
        return dict(cur=cur, cur_t=cur_t, sp=sp, stack_node=stack_node, stack_t=stack_t, found=found)

    out = jax.lax.while_loop(cond, body, state)
    return out["found"]


def any_hit(bvh, tri, origin, direction, t_limit):
    """True where any intersection exists with ``t in (EPSILON, t_limit)``.

    The shadow-ray test (``TLAS::any_intersect``, tlas.rs:111-144); callers
    pass ``(1 - EPSILON) * distance`` as the limit like ``integrator.rs:56``.
    """
    if "stream_static" in bvh:
        from path_tracer_tpu.trace.sweep import sweep_any_hit_static

        return sweep_any_hit_static(bvh["stream_static"], origin, direction, t_limit)
    if "stream" in bvh:
        from path_tracer_tpu.trace.sweep import sweep_any_hit

        return sweep_any_hit(bvh["stream"], origin, direction, t_limit)
    if "dense_pl" in tri:
        from path_tracer_tpu.trace.dense_pallas import dense_pl_any_hit

        return dense_pl_any_hit(tri["dense_pl"], origin, direction, t_limit)
    if "dense_stream" in tri:
        from path_tracer_tpu.trace.dense_stream import dense_stream_any_hit

        return dense_stream_any_hit(tri["dense_stream"], origin, direction, t_limit)
    if "dense_pl_parts" in tri:
        from path_tracer_tpu.trace.dense_pallas import dense_pl_parts_any_hit

        return dense_pl_parts_any_hit(tri["dense_pl_parts"], origin, direction, t_limit)
    if "dense" in tri:
        from path_tracer_tpu.trace.dense import dense_any_hit

        return dense_any_hit(tri["dense"], origin, direction, t_limit)
    return _any_hit_impl(bvh["packed"], tri["packed"], origin, direction, t_limit)


@jax.jit
def brute_force_closest(tri, origin, direction, t_limit):
    """O(T) reference oracle for tests: test every triangle for every ray."""
    tri_packed = tri["packed"]
    t_count = tri_packed.shape[0]
    n = origin.shape[0]

    def body(i, s):
        best, best_u, best_v, t_max = s
        idx = jnp.full(n, i, jnp.int32)
        h, t, u, v = _tri_intersect(tri_packed, idx, origin, direction, jnp.float32(EPSILON), t_max)
        t_max = jnp.where(h, t, t_max)
        best = jnp.where(h, idx, best)
        best_u = jnp.where(h, u, best_u)
        best_v = jnp.where(h, v, best_v)
        return best, best_u, best_v, t_max

    init = (jnp.full(n, -1, jnp.int32), jnp.zeros(n), jnp.zeros(n), t_limit)
    best, best_u, best_v, t_max = jax.lax.fori_loop(0, t_count, body, init)
    return best, t_max, best_u, best_v
