"""Two-level TLAS/BLAS traversal with per-instance ray transforms.

The default geometry mode bakes instances into one world BVH (see
`scene.Scene`); this module is the memory-scaling alternative for massive
instancing (BASELINE config 5): each model's BLAS is stored once, and rays are
transformed into object space at TLAS leaves exactly like the reference
(``src/tlas.rs:66-110``: leaf -> ``ray.transform(inv_matrix)``, BLAS
traversal, deferred normal transform).

Layout: every BLAS's flat dual-child records (`scene.bvh.flatten`) are
concatenated into one node table with per-BLAS node/triangle offsets already
applied, so a single packed row table serves all BLASes. The TLAS is its own
packed table whose leaves hold instance ids. Instance table rows carry the
object->world rotation, its inverse, translation, and the BLAS id.

Per-lane state machine inside one ``lax.while_loop``:

* phase TLAS — world-space ray walks the TLAS; a hit instance leaf switches
  the lane to BLAS phase, transforming the ray by the instance's inverse.
* phase BLAS — object-space ray walks that BLAS subtree using the shared
  stack above the saved entry depth; exhaustion pops back to TLAS phase.

``t`` values are frame-invariant (rigid transforms, unit directions), so one
shared ``t_max`` orders hits globally, like the reference's shared ``t_max``
across BLAS calls (tlas.rs:93-97).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from path_tracer_tpu.core.constants import EPSILON, INFINITY
from path_tracer_tpu.trace.gather import gather_rows
from path_tracer_tpu.trace.traversal import (
    MAX_LEAF,
    STACK_DEPTH,
    _decode_leaf,
    _encode_leaf,
    _slab,
    _stack_read,
    _stack_write,
    _tri_intersect,
)

_POP = -1

# Instance row layout [28 f32]: rot (9) | inv_rot (9) | translation (3) |
# inv_translation (3) | blas_node_root (1, int) | material/model id (2, int) | pad
INST_ROW_W = 28


def pack_instances(matrices: np.ndarray, blas_roots: np.ndarray, model_ids: np.ndarray) -> np.ndarray:
    """``matrices``: [I,3,4] rigid object->world transforms."""
    count = matrices.shape[0]
    rows = np.zeros((count, INST_ROW_W), np.float32)
    for i in range(count):
        rot = matrices[i, :, :3]
        tr = matrices[i, :, 3]
        inv_rot = rot.T  # rigid
        inv_tr = -inv_rot @ tr
        rows[i, 0:9] = rot.reshape(-1)
        rows[i, 9:18] = inv_rot.reshape(-1)
        rows[i, 18:21] = tr
        rows[i, 21:24] = inv_tr
        rows[i, 24] = np.float32(blas_roots[i])  # exact value, not bit pattern
        rows[i, 25] = np.float32(model_ids[i])
    return rows


@jax.jit
def closest_hit_twolevel(tlas_packed, blas_packed, inst_rows, tri_packed, origin, direction, t_limit):
    """Returns ``(tri_idx, t, u, v, inst_idx)``; miss -> tri_idx == -1."""
    n = origin.shape[0]

    PH_TLAS, PH_BLAS = 0, 1

    state = dict(
        phase=jnp.zeros(n, jnp.int32),
        cur=jnp.zeros(n, jnp.int32),
        cur_t=jnp.zeros(n, jnp.float32),
        sp=jnp.zeros(n, jnp.int32),
        sp_enter=jnp.zeros(n, jnp.int32),  # TLAS stack depth at BLAS entry
        stack_node=jnp.zeros((n, STACK_DEPTH), jnp.int32),
        stack_t=jnp.zeros((n, STACK_DEPTH), jnp.float32),
        inst=jnp.full(n, -1, jnp.int32),  # current instance in BLAS phase
        o2=origin,  # object-space origin (BLAS phase)
        d2=direction,  # object-space direction
        t_max=t_limit,
        best=jnp.full(n, -1, jnp.int32),
        best_inst=jnp.full(n, -1, jnp.int32),
        best_u=jnp.zeros(n, jnp.float32),
        best_v=jnp.zeros(n, jnp.float32),
    )

    def live(s):
        return (s["cur"] != _POP) | (s["sp"] > 0)

    def cond(s):
        return jnp.any(live(s))

    def step_phase(s, nodes_packed, o, d, in_phase):
        """One traversal step (pop + expand/leaf) in the given node table.
        Returns updated fields; caller merges by phase mask."""
        cur, cur_t, sp, t_max = s["cur"], s["cur_t"], s["sp"], s["t_max"]
        stack_node, stack_t = s["stack_node"], s["stack_t"]
        inv_d = 1.0 / d

        floor = jnp.where(in_phase & (s["phase"] == PH_BLAS), s["sp_enter"], 0)
        do_pop = in_phase & (cur == _POP) & (sp > floor)
        sp_after = jnp.where(do_pop, sp - 1, sp)
        popped = _stack_read(stack_node, sp_after)
        popped_t = _stack_read(stack_t, sp_after)
        fresh = do_pop & (popped_t <= t_max)
        cur = jnp.where(fresh, popped, cur)
        cur_t = jnp.where(fresh, popped_t, cur_t)
        sp = sp_after

        is_internal = in_phase & (cur >= 0)
        is_leaf = in_phase & (cur <= -2)

        ni = jnp.where(is_internal, cur, 0)
        rows = gather_rows(nodes_packed, ni)
        ints = rows[:, 12:16].astype(jnp.int32)
        results = []
        for c in range(2):
            cmin = rows[:, 6 * c : 6 * c + 3]
            cmax = rows[:, 6 * c + 3 : 6 * c + 6]
            cidx = ints[:, 2 * c]
            ccount = ints[:, 2 * c + 1]
            code = jnp.where(ccount > 0, _encode_leaf(cidx, ccount), cidx)
            hit, t_en = _slab(cmin, cmax, o, inv_d, t_max)
            results.append((code, hit & (ccount != -1), t_en))
        (code0, hit0, t0), (code1, hit1, t1) = results

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
        next_code = jnp.where(both, ncode, jnp.where(hit0, code0, jnp.where(hit1, code1, _POP)))
        next_t = jnp.where(both, ntime, jnp.where(hit0, t0, jnp.where(hit1, t1, 0.0)))

        cur_out = jnp.where(is_internal, next_code, cur)
        cur_t_out = jnp.where(is_internal, next_t, cur_t)
        return cur_out, cur_t_out, sp, stack_node, stack_t, is_leaf

    def body(s):
        phase = s["phase"]
        in_tlas = (phase == PH_TLAS) & live(s)
        in_blas = (phase == PH_BLAS) & live(s)

        # --- TLAS step (world ray) ---
        cur, cur_t, sp, stack_node, stack_t, tlas_leaf = step_phase(
            s, tlas_packed, origin, direction, in_tlas
        )
        s = dict(s, cur=cur, cur_t=cur_t, sp=sp, stack_node=stack_node, stack_t=stack_t)

        # TLAS leaf = instance: switch to BLAS phase with transformed ray
        start, _count = _decode_leaf(jnp.where(tlas_leaf, s["cur"], -2))
        inst_id = start
        irows = gather_rows(inst_rows, jnp.where(tlas_leaf, inst_id, 0))
        inv_tr = irows[:, 21:24]
        root = irows[:, 24].astype(jnp.int32)

        # rigid transform expanded row-by-row (irows 9:18 is the row-major
        # inverse rotation) — a per-lane 3x3 einsum compiles to padded
        # cross-lane reduces on TPU (see vecmath.dot)
        def rot_apply(v):
            vx, vy, vz = v[:, 0], v[:, 1], v[:, 2]
            return jnp.stack(
                [
                    irows[:, 9] * vx + irows[:, 10] * vy + irows[:, 11] * vz,
                    irows[:, 12] * vx + irows[:, 13] * vy + irows[:, 14] * vz,
                    irows[:, 15] * vx + irows[:, 16] * vy + irows[:, 17] * vz,
                ],
                axis=-1,
            )

        o_obj = rot_apply(origin) + inv_tr
        d_obj = rot_apply(direction)

        enter = tlas_leaf
        s["phase"] = jnp.where(enter, PH_BLAS, s["phase"])
        s["inst"] = jnp.where(enter, inst_id, s["inst"])
        s["o2"] = jnp.where(enter[:, None], o_obj, s["o2"])
        s["d2"] = jnp.where(enter[:, None], d_obj, s["d2"])
        s["sp_enter"] = jnp.where(enter, s["sp"], s["sp_enter"])
        s["cur"] = jnp.where(enter, root, s["cur"])
        # keep cur_t (instance box entry) as initial BLAS t-estimate context

        # --- BLAS step (object ray) ---
        cur, cur_t, sp, stack_node, stack_t, blas_leaf = step_phase(
            s, blas_packed, s["o2"], s["d2"], in_blas
        )
        s = dict(s, cur=cur, cur_t=cur_t, sp=sp, stack_node=stack_node, stack_t=stack_t)

        # BLAS leaf: triangle tests in object space (t is frame-invariant)
        start, count = _decode_leaf(jnp.where(blas_leaf, s["cur"], -2))
        t_est = s["cur_t"]
        o_moved = s["o2"] + s["d2"] * t_est[:, None]
        t_max, best, best_u, best_v, best_inst = (
            s["t_max"], s["best"], s["best_u"], s["best_v"], s["best_inst"]
        )
        for k in range(MAX_LEAF):
            tri_idx = jnp.clip(start + k, 0, tri_packed.shape[0] - 1)
            lane_on = blas_leaf & (k < count)
            h, t, u, v = _tri_intersect(
                tri_packed, tri_idx, o_moved, s["d2"],
                jnp.float32(EPSILON) - t_est, t_max - t_est,
            )
            upd = lane_on & h
            t_max = jnp.where(upd, t + t_est, t_max)
            best = jnp.where(upd, tri_idx, best)
            best_u = jnp.where(upd, u, best_u)
            best_v = jnp.where(upd, v, best_v)
            best_inst = jnp.where(upd, s["inst"], best_inst)
        s = dict(s, t_max=t_max, best=best, best_u=best_u, best_v=best_v, best_inst=best_inst)

        s["cur"] = jnp.where(blas_leaf, _POP, s["cur"])

        # BLAS exhausted -> back to TLAS phase
        done_blas = in_blas & (s["cur"] == _POP) & (s["sp"] <= s["sp_enter"])
        s["phase"] = jnp.where(done_blas, PH_TLAS, s["phase"])
        return s

    out = jax.lax.while_loop(cond, body, state)
    return out["best"], out["t_max"], out["best_u"], out["best_v"], out["best_inst"]


@jax.jit
def any_hit_twolevel(tlas_packed, blas_packed, inst_rows, tri_packed, origin, direction, t_limit):
    """Shadow-ray variant with a TRUE first-hit early exit: a lane that finds
    any intersection in ``(EPSILON, t_limit)`` immediately goes dead (its
    stack is abandoned), matching ``BLAS::any_intersect``/``TLAS::any_intersect``
    (blas.rs:257-294, tlas.rs:111-144) instead of paying full closest-hit
    traversal. No near-first ordering is needed either — children are pushed
    unordered like the single-level ``_any_hit_impl``."""
    n = origin.shape[0]

    PH_TLAS, PH_BLAS = 0, 1

    state = dict(
        phase=jnp.zeros(n, jnp.int32),
        cur=jnp.zeros(n, jnp.int32),
        cur_t=jnp.zeros(n, jnp.float32),
        sp=jnp.zeros(n, jnp.int32),
        sp_enter=jnp.zeros(n, jnp.int32),
        stack_node=jnp.zeros((n, STACK_DEPTH), jnp.int32),
        stack_t=jnp.zeros((n, STACK_DEPTH), jnp.float32),
        inst=jnp.full(n, -1, jnp.int32),
        o2=origin,
        d2=direction,
        found=jnp.zeros(n, jnp.bool_),
    )

    def live(s):
        return ((s["cur"] != _POP) | (s["sp"] > 0)) & ~s["found"]

    def cond(s):
        return jnp.any(live(s))

    def step_phase(s, nodes_packed, o, d, in_phase):
        cur, cur_t, sp = s["cur"], s["cur_t"], s["sp"]
        stack_node, stack_t = s["stack_node"], s["stack_t"]
        inv_d = 1.0 / d

        floor = jnp.where(in_phase & (s["phase"] == PH_BLAS), s["sp_enter"], 0)
        do_pop = in_phase & (cur == _POP) & (sp > floor)
        sp_after = jnp.where(do_pop, sp - 1, sp)
        popped = _stack_read(stack_node, sp_after)
        popped_t = _stack_read(stack_t, sp_after)
        cur = jnp.where(do_pop, popped, cur)
        cur_t = jnp.where(do_pop, popped_t, cur_t)
        sp = sp_after

        is_internal = in_phase & (cur >= 0)
        is_leaf = in_phase & (cur <= -2)

        ni = jnp.where(is_internal, cur, 0)
        rows = gather_rows(nodes_packed, ni)
        ints = rows[:, 12:16].astype(jnp.int32)
        results = []
        for c in range(2):
            cmin = rows[:, 6 * c : 6 * c + 3]
            cmax = rows[:, 6 * c + 3 : 6 * c + 6]
            cidx = ints[:, 2 * c]
            ccount = ints[:, 2 * c + 1]
            code = jnp.where(ccount > 0, _encode_leaf(cidx, ccount), cidx)
            hit, t_en = _slab(cmin, cmax, o, inv_d, t_limit)
            results.append((code, hit & (ccount != -1), t_en))
        (code0, hit0, t0), (code1, hit1, t1) = results

        both = hit0 & hit1
        push = is_internal & both
        stack_node = jnp.where(push[:, None], _stack_write(stack_node, sp, code1), stack_node)
        stack_t = jnp.where(push[:, None], _stack_write(stack_t, sp, t1), stack_t)
        sp = jnp.where(push, sp + 1, sp)
        next_code = jnp.where(hit0, code0, jnp.where(hit1, code1, _POP))
        next_t = jnp.where(hit0, t0, jnp.where(hit1, t1, 0.0))

        cur_out = jnp.where(is_internal, next_code, cur)
        cur_t_out = jnp.where(is_internal, next_t, cur_t)
        return cur_out, cur_t_out, sp, stack_node, stack_t, is_leaf

    def body(s):
        phase = s["phase"]
        in_tlas = (phase == PH_TLAS) & live(s)
        in_blas = (phase == PH_BLAS) & live(s)

        cur, cur_t, sp, stack_node, stack_t, tlas_leaf = step_phase(
            s, tlas_packed, origin, direction, in_tlas
        )
        s = dict(s, cur=cur, cur_t=cur_t, sp=sp, stack_node=stack_node, stack_t=stack_t)

        start, _count = _decode_leaf(jnp.where(tlas_leaf, s["cur"], -2))
        inst_id = start
        irows = gather_rows(inst_rows, jnp.where(tlas_leaf, inst_id, 0))
        inv_tr = irows[:, 21:24]
        root = irows[:, 24].astype(jnp.int32)

        def rot_apply(v):
            vx, vy, vz = v[:, 0], v[:, 1], v[:, 2]
            return jnp.stack(
                [
                    irows[:, 9] * vx + irows[:, 10] * vy + irows[:, 11] * vz,
                    irows[:, 12] * vx + irows[:, 13] * vy + irows[:, 14] * vz,
                    irows[:, 15] * vx + irows[:, 16] * vy + irows[:, 17] * vz,
                ],
                axis=-1,
            )

        o_obj = rot_apply(origin) + inv_tr
        d_obj = rot_apply(direction)

        enter = tlas_leaf
        s["phase"] = jnp.where(enter, PH_BLAS, s["phase"])
        s["inst"] = jnp.where(enter, inst_id, s["inst"])
        s["o2"] = jnp.where(enter[:, None], o_obj, s["o2"])
        s["d2"] = jnp.where(enter[:, None], d_obj, s["d2"])
        s["sp_enter"] = jnp.where(enter, s["sp"], s["sp_enter"])
        s["cur"] = jnp.where(enter, root, s["cur"])

        cur, cur_t, sp, stack_node, stack_t, blas_leaf = step_phase(
            s, blas_packed, s["o2"], s["d2"], in_blas
        )
        s = dict(s, cur=cur, cur_t=cur_t, sp=sp, stack_node=stack_node, stack_t=stack_t)

        start, count = _decode_leaf(jnp.where(blas_leaf, s["cur"], -2))
        t_est = s["cur_t"]
        o_moved = s["o2"] + s["d2"] * t_est[:, None]
        found = s["found"]
        for k in range(MAX_LEAF):
            tri_idx = jnp.clip(start + k, 0, tri_packed.shape[0] - 1)
            lane_on = blas_leaf & (k < count)
            h, _, _, _ = _tri_intersect(
                tri_packed, tri_idx, o_moved, s["d2"],
                jnp.float32(EPSILON) - t_est, t_limit - t_est,
            )
            found = found | (lane_on & h)
        s["found"] = found

        s["cur"] = jnp.where(blas_leaf, _POP, s["cur"])

        done_blas = in_blas & (s["cur"] == _POP) & (s["sp"] <= s["sp_enter"])
        s["phase"] = jnp.where(done_blas, PH_TLAS, s["phase"])
        return s

    out = jax.lax.while_loop(cond, body, state)
    return out["found"]
