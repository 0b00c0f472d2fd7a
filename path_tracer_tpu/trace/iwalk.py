"""Instanced walk — the fast two-level (TLAS/BLAS) traversal engine.

The reference traverses a TLAS of instance AABBs, then transforms the ray
into object space and descends the instance's shared BLAS
(tlas.rs:66-110, blas.rs:214-294). The TPU-first mapping reuses the walk
engine's split of labor (trace/walk.py):

* XLA gates every ray BLOCK against every INSTANCE world AABB at once —
  the same vectorized slab-in-multiply-form + two-level bitmask machinery
  (`walk._build_mask`), with instance boxes where walk has chunk boxes,
  and per-octant front-to-back instance orders resolved statically from a
  SAH tree over the instance boxes (the reference's near-child-first TLAS
  descent, tlas_bvh.rs:85-138, at instance granularity).
* The Pallas kernel scans each block's surviving instances front-to-back.
  Per instance it reads the 12 inverse-rigid scalars from SMEM, transforms
  the block's rays into object space on the VPU (rigid ⇒ t is unchanged,
  model.rs:40-43 guarantees no scale — so the live t-window and the winner
  compare need NO rescaling), and runs the instance's model's dense chunk
  list with the exact-f32 Havel-Herout chunk test. Model chunk tables are
  shared across instances — that is the two-level memory saving.
* Shading attributes resolve XLA-side from the winner (instance, slot):
  object-space t/u/v recomputed in the kernel's exact expression order
  from the gathered inverse transform, object normals interpolated from
  the aux table and rotated to world by the instance's forward rotation
  (the reference's deferred normal transform, tlas.rs:103-109).

VMEM holds the concatenated model chunk tables (64 B/tri), so the engine
serves scenes whose total OBJECT-space geometry fits `walk.WALK_MAX_TRIS` —
massive instancing of moderate models (BASELINE config 5's regime), not
two-level dragons (those take the baked multi-part walk path).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from path_tracer_tpu.core.constants import EPSILON
from path_tracer_tpu.scene.bvh import build_sah_tree, chunk_partition
from path_tracer_tpu.trace.dense_pallas import _BIG, AUX_COLS, _same
from path_tracer_tpu.trace.walk import (
    CH_W,
    G_BLK,
    SBLK,
    WALK_LSKIP,
    WALK_MAX_TRIS,
    WALK_SORT,
    WALK_SORT_ANY,
    _build_mask,
    _win_admits,
    _chunk_t,
    _chunk_terms,
    _coherence_order,
    _interpret_default,
    _load_w,
    _octant_orders,
    _pack_rays_cols,
    _pad_all,
    _scan_mask,
    WALK_FLAT,
    _unsort_rows,
)

# Conservative tri-count gate for scene wiring; the binding limit is model
# CHUNKS (IWALK_MAX_TOTAL_CHUNKS below — pack_iwalk raises past it, and
# twolevel_scene falls back to the gather machine).
IWALK_MAX_OBJECT_TRIS = 1_000_000


# ---------------------------------------------------------------------------
# host-side packing
# ---------------------------------------------------------------------------

def _model_chunk_tables(tri_sub: dict, normals9, pos, model_id: int,
                        tri_off: int):
    """One model's chunk tables in partition-DFS layout: ``w`` [8, k*2*CH_W]
    compact plane table (walk layout), ``aux`` [k*CH_W, AUX_COLS]
    OBJECT-space shading rows, ``orig`` [k*CH_W] global tri index, ``k``,
    and per-chunk OBJECT AABBs ``(cmin, cmax)`` [k, 3] (multi-part
    instance-box clipping)."""
    bmin = pos.min(axis=1)
    bmax = pos.max(axis=1)
    perm, starts, spans = chunk_partition(bmin, bmax, CH_W)
    k = len(starts)
    # chunks tile [0, t) contiguously: segment reduceat + ragged scatter
    # replace the per-chunk python loops (see walk.pack_walk)
    from path_tracer_tpu.trace.walk import _ragged_arange

    cmin = np.minimum.reduceat(bmin[perm], starts, axis=0)
    cmax = np.maximum.reduceat(bmax[perm], starts, axis=0)
    S = k * CH_W
    slots = np.full(S, -1, np.int64)
    spans_a = np.asarray(spans)
    within = _ragged_arange(spans_a)
    rows = np.repeat(np.arange(k, dtype=np.int64) * CH_W, spans_a) + within
    slots[rows] = perm[np.repeat(np.asarray(starts), spans_a) + within]
    valid = slots >= 0
    idx = slots[valid]

    def fld(name):
        return np.asarray(tri_sub[name], np.float32)

    n0, n1, n2 = fld("n0"), fld("n1"), fld("n2")
    d0, d1, d2 = fld("d0"), fld("d1"), fld("d2")
    plane16 = np.zeros((16, S), np.float32)
    plane16[0:3, valid] = n0[idx].T
    plane16[3, valid] = d0[idx]
    plane16[4:7, valid] = n1[idx].T
    plane16[7, valid] = d1[idx]
    plane16[8:11, valid] = n2[idx].T
    plane16[11, valid] = d2[idx]
    w = (
        plane16.reshape(2, 8, k, CH_W)
        .transpose(1, 2, 0, 3)
        .reshape(8, k * 2 * CH_W)
    )
    aux = np.zeros((S, AUX_COLS), np.float32)
    a = aux[valid]
    a[:, 0:3] = n0[idx]
    a[:, 3] = d0[idx]
    a[:, 4:7] = n1[idx]
    a[:, 7] = d1[idx]
    a[:, 8:11] = n2[idx]
    a[:, 11] = d2[idx]
    a[:, 12:21] = np.asarray(normals9, np.float32)[idx]
    a[:, 21] = float(model_id)
    aux[valid] = a
    orig = np.where(valid, tri_off + np.maximum(slots, 0), 0).astype(np.int32)
    return w, aux, orig, k, cmin, cmax


def _aabb_corners_world(bb_min, bb_max, matrix):
    """Conservative world box: all 8 corners through the rigid transform
    (fixes the reference's 2-corner transform, boundingbox.rs:51-57)."""
    rot, tr = matrix[:, :3], matrix[:, 3]
    pts = np.array(
        [[x, y, z]
         for x in (bb_min[0], bb_max[0])
         for y in (bb_min[1], bb_max[1])
         for z in (bb_min[2], bb_max[2])], np.float32,
    )
    world = pts @ rot.T + tr
    return world.min(axis=0), world.max(axis=0)


import os as _os

IWALK_PART_CHUNKS = 1536          # single-part chunk cap (VMEM, 12 MB)
# Per-part chunks in multi-part mode. Gating is per (instance, part): the
# kernel walks EVERY clipped chunk of a gated-in instance brute-force, so
# smaller parts = finer culling at the cost of more kernel launches —
# PT_IWALK_SPLIT A/Bs the trade on hardware (two-level dragon regime).
IWALK_SPLIT_CHUNKS = max(64, int(_os.environ.get("PT_IWALK_SPLIT", "768")))
IWALK_MAX_PARTS = 16
IWALK_MAX_TOTAL_CHUNKS = 16 * 768  # engine capacity: independent of the knob


def _inst_orders(ibmin, ibmax, n_inst):
    """Per-octant front-to-back instance orders + permuted padded boxes.
    Instances with degenerate boxes (ibmin > ibmax: empty in this part)
    sort to the back with +inf gate boxes."""
    live = (ibmin <= ibmax).all(axis=1)
    live_ids = np.flatnonzero(live)
    dead_ids = np.flatnonzero(~live)
    if len(live_ids) > 1:
        nodes, perm2, root = build_sah_tree(
            ibmin[live_ids], ibmax[live_ids], max_leaf=1)
        orders_local = perm2[_octant_orders(nodes, root, len(live_ids))]
        orders = live_ids[orders_local]
    else:
        orders = np.broadcast_to(live_ids, (8, len(live_ids))).copy()
    kq = ((n_inst + 127) // 128) * 128
    cb_oct = np.full((8, 6, kq), 2.0e30, np.float32)
    ord_pad = np.zeros((8, kq), np.int32)
    nl = len(live_ids)
    for o in range(8):
        po = orders[o] if nl else np.zeros(0, np.int64)
        cb_oct[o, 0:3, :nl] = ibmin[po].T
        cb_oct[o, 3:6, :nl] = ibmax[po].T
        ord_pad[o, :nl] = po
        ord_pad[o, nl : nl + len(dead_ids)] = dead_ids  # gated out (inf box)
    return cb_oct, ord_pad


def pack_iwalk(models, part_chunks: int = IWALK_PART_CHUNKS,
               split_chunks: int = IWALK_SPLIT_CHUNKS) -> dict:
    """Pack the instanced-walk engine from a Model list (host numpy).

    Beyond ``IWALK_PART_CHUNKS`` total model chunks the engine goes
    multi-part: the concatenated chunk table splits into contiguous slices,
    each instance's chunk range is CLIPPED per part (localized for the
    kernel), and per-(instance, part) world boxes — the transform of the
    union of the clipped range's object chunk boxes — drive tighter gating
    than whole-instance boxes. The public API threads one live t-window
    through the part loop, exactly like ``walk`` multi-part. This is how a
    two-level dragon (multi-hundred-K-tri shared BLAS) traces without
    baking."""
    from path_tracer_tpu.scene import triangle as tri_mod

    w_model, aux_parts, orig_parts = [], [], []
    chunk_off = [0]
    tri_off = 0
    cbox_min, cbox_max = [], []
    for mid, model in enumerate(models):
        pos = np.asarray(model.positions, np.float32)
        pre = tri_mod.precompute(pos)
        w, aux, orig, k, cmin, cmax = _model_chunk_tables(
            pre, np.asarray(model.normals, np.float32).reshape(-1, 9),
            pos, mid, tri_off,
        )
        w_model.append(w)
        aux_parts.append(aux)
        orig_parts.append(orig)
        chunk_off.append(chunk_off[-1] + k)
        cbox_min.append(cmin)
        cbox_max.append(cmax)
        tri_off += pos.shape[0]

    K = chunk_off[-1]
    if K > IWALK_MAX_TOTAL_CHUNKS:
        raise ValueError(
            f"iwalk caps at {IWALK_MAX_TOTAL_CHUNKS} model chunks, got {K}")
    w_all = np.concatenate(w_model, axis=1)
    aux_all = np.concatenate(aux_parts)
    orig_all = np.concatenate(orig_parts)
    cbox_min = np.concatenate(cbox_min)  # [K, 3] object space (per model)
    cbox_max = np.concatenate(cbox_max)

    # instance list
    inst_f, inst_range, inst_rows, inst_mats = [], [], [], []
    for mid, model in enumerate(models):
        for matrix in model.matrices:
            m = np.asarray(matrix, np.float32)
            rot, tr = m[:, :3], m[:, 3]
            rinv = rot.T
            tinv = -rinv @ tr
            inst_f.append(np.concatenate([rinv.reshape(9), tinv]))
            inst_range.append((chunk_off[mid], chunk_off[mid + 1]))
            row = np.zeros(24, np.float32)
            row[0:9] = rinv.reshape(9)
            row[9:12] = tinv
            row[12:21] = rot.reshape(9)  # forward rotation (normals)
            row[21] = float(mid)
            inst_rows.append(row)
            inst_mats.append(m)
    n_inst = len(inst_f)
    inst_f = np.stack(inst_f).astype(np.float32)
    inst_range = np.asarray(inst_range, np.int64)

    def _world_boxes(pc0, pc1):
        """Per-instance world box of the chunks clipped to [pc0, pc1);
        empty instances get inverted boxes (lo > hi)."""
        lo = np.full((n_inst, 3), 1.0, np.float32)
        hi = np.full((n_inst, 3), -1.0, np.float32)
        clip_lo = np.maximum(inst_range[:, 0], pc0)
        clip_hi = np.minimum(inst_range[:, 1], pc1)
        for i in range(n_inst):
            if clip_lo[i] >= clip_hi[i]:
                continue
            olo = cbox_min[clip_lo[i] : clip_hi[i]].min(axis=0)
            ohi = cbox_max[clip_lo[i] : clip_hi[i]].max(axis=0)
            lo[i], hi[i] = _aabb_corners_world(olo, ohi, inst_mats[i])
        return lo, hi, clip_lo, clip_hi

    def _part(pc0, pc1, kmax):
        lo, hi, clip_lo, clip_hi = _world_boxes(pc0, pc1)
        cb_oct, ord_pad = _inst_orders(lo, hi, n_inst)
        empty = clip_lo >= clip_hi
        inst_c = np.stack(
            [np.where(empty, 0, clip_lo - pc0),
             np.where(empty, 0, clip_hi - pc0)], axis=1,
        ).astype(np.int32)
        w = np.zeros((8, kmax * 2 * CH_W), np.float32)
        w[:, : (pc1 - pc0) * 2 * CH_W] = w_all[:, pc0 * 2 * CH_W : pc1 * 2 * CH_W]
        live = ~empty
        plo = lo[live].min(axis=0) if live.any() else np.zeros(3, np.float32)
        phi = hi[live].max(axis=0) if live.any() else np.zeros(3, np.float32)
        pad = 1e-4 * float(max(np.abs(plo).max(), np.abs(phi).max(), 1.0)) + 1e-6
        return {
            "w": w, "cb_oct": cb_oct, "ord_oct": ord_pad,
            "inst_f": inst_f, "inst_c": inst_c,
            "root_lo": (plo - pad).astype(np.float32),
            "root_hi": (phi + pad).astype(np.float32),
        }

    # global sort quantizers / root box (whole-instance world boxes)
    glob_lo, glob_hi, _, _ = _world_boxes(0, K)
    scene_lo = glob_lo.min(axis=0)
    scene_hi = glob_hi.max(axis=0)
    extent = np.maximum(scene_hi - scene_lo, 1e-6)
    pad = 1e-4 * float(max(np.abs(scene_lo).max(), np.abs(scene_hi).max(), 1.0)) + 1e-6
    out = {
        "inst_rows": np.stack(inst_rows),
        "aux": aux_all,
        "origmap": orig_all,
        "sort_lo": scene_lo.astype(np.float32),
        "sort_scale": (1.0 / extent).astype(np.float32),
        "root_lo": (scene_lo - pad).astype(np.float32),
        "root_hi": (scene_hi + pad).astype(np.float32),
    }
    if K <= part_chunks:
        single = _part(0, K, K)
        single.update(out)
        return single
    bounds = list(range(0, K, split_chunks))
    if bounds[-1] != K:
        bounds.append(K)
    kmax = max(b - a for a, b in zip(bounds, bounds[1:]))
    out["parts"] = tuple(
        _part(a, b, kmax) for a, b in zip(bounds, bounds[1:])
    )
    out["slot_off"] = np.asarray(
        [a * CH_W for a in bounds[:-1]], np.float32)
    return out


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _obj_rays(inst_f, i, rc):
    """Transform block rays into instance ``i``'s object space: 12 SMEM
    scalar reads + VPU FMAs. Rigid, so |d'| == |d| and t needs no rescale."""
    dx, dy, dz, ox, oy, oz = rc
    r = [inst_f[i, j] for j in range(12)]
    ox2 = r[0] * ox + r[1] * oy + r[2] * oz + r[9]
    oy2 = r[3] * ox + r[4] * oy + r[5] * oz + r[10]
    oz2 = r[6] * ox + r[7] * oy + r[8] * oz + r[11]
    dx2 = r[0] * dx + r[1] * dy + r[2] * dz
    dy2 = r[3] * dx + r[4] * dy + r[5] * dz
    dz2 = r[6] * dx + r[7] * dy + r[8] * dz
    return (dx2, dy2, dz2, ox2, oy2, oz2)


def _iwalk_closest_kernel(
    summ_ref, words_ref, tent_ref, wtent_ref, stent_ref, oct_ref, rays_ref,
    ord_ref, inst_f, inst_c, w_hbm, out_ref, wv, m_ref, c_ref, i_ref,
    lst_ref, smin_ref, sem_w,
    *, s, gblk, lskip, flat, budget=None,
):
    """Output block [gblk*SBLK, 4]: best_t | winner slot (chunk*CH_W+lane,
    global across the concatenated model tables) | instance | pad."""
    _load_w(w_hbm, wv, sem_w)
    eps = jnp.float32(EPSILON)
    chf = jnp.float32(CH_W)
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (SBLK, CH_W), 1).astype(jnp.float32)

    def g_body(g):
        rays8 = rays_ref[0, g]
        rc = (rays8[:, 0:1], rays8[:, 1:2], rays8[:, 2:3],
              rays8[:, 3:4], rays8[:, 4:5], rays8[:, 5:6])
        tlim = rays8[:, 7:8]
        m_ref[...] = jnp.full((SBLK, 1), _BIG, jnp.float32)
        c_ref[...] = jnp.full((SBLK, 1), -1.0, jnp.float32)
        i_ref[...] = jnp.full((SBLK, 1), -1.0, jnp.float32)
        oct = oct_ref[0, g, 0]

        def test(p, win):
            i = ord_ref[oct, p]
            rc2 = _obj_rays(inst_f, i, rc)
            c_end = inst_c[i, 1]
            inf = jnp.float32(i)

            def chunk_body(cw):
                c, win = cw
                tm = _chunk_t(wv, rc2, c, tlim, eps)
                rowmin = jnp.min(tm, axis=1, keepdims=True)
                lane = jnp.min(
                    jnp.where(tm == rowmin, lane_row, _BIG),
                    axis=1, keepdims=True,
                )
                gid = c.astype(jnp.float32) * chf + lane
                upd = rowmin < m_ref[...]
                c_ref[...] = jnp.where(upd, gid, c_ref[...])
                i_ref[...] = jnp.where(upd, inf, i_ref[...])
                m_ref[...] = jnp.where(upd, rowmin, m_ref[...])
                win2 = jnp.max(jnp.minimum(m_ref[...], tlim))
                return c + 1, jnp.minimum(win, win2)

            _, win = jax.lax.while_loop(
                lambda cw: cw[0] < c_end, chunk_body, (inst_c[i, 0], win)
            )
            return win

        def visit(p, win):
            te = tent_ref[0, g, p]
            return jax.lax.cond(
                _win_admits(te, win), lambda w: test(p, w), lambda w: w, win
            )

        rem = _scan_mask(
            lambda sw: summ_ref[0, g, sw],
            lambda wi: words_ref[0, g, wi],
            s, visit, jnp.max(tlim),
            read_wtent=(lambda wi: wtent_ref[0, g, wi]) if lskip else None,
            read_stent=(lambda sw: stent_ref[0, g, sw]) if lskip else None,
            lst_ref=lst_ref if flat else None,
            test=test if flat else None,
            read_tent=(lambda p: tent_ref[0, g, p]) if flat else None,
            smin_ref=smin_ref if flat else None,
            budget=budget,
        )
        t_p = m_ref[...]
        hit = t_p < _BIG
        out_ref[0, g, :, 0:1] = t_p
        out_ref[0, g, :, 1:2] = jnp.where(hit, c_ref[...], -1.0)
        out_ref[0, g, :, 2:3] = jnp.where(hit, i_ref[...], -1.0)
        if budget is not None:
            out_ref[0, g, :, 3:4] = jnp.full((SBLK, 1), rem, jnp.float32)
        else:
            out_ref[0, g, :, 3:4] = jnp.zeros((SBLK, 1), jnp.float32)

    for g in range(gblk):  # static unroll — see _walk_closest_kernel
        g_body(g)


def _iwalk_any_kernel(
    summ_ref, words_ref, tent_ref, wtent_ref, stent_ref, oct_ref, rays_ref,
    ord_ref, inst_f, inst_c, w_hbm, out_ref, wv, occ_ref, lst_ref, smin_ref,
    sem_w, *, s, gblk, lskip, flat, budget=None,
):
    _load_w(w_hbm, wv, sem_w)
    eps = jnp.float32(EPSILON)

    def g_body(g):
        rays8 = rays_ref[0, g]
        rc = (rays8[:, 0:1], rays8[:, 1:2], rays8[:, 2:3],
              rays8[:, 3:4], rays8[:, 4:5], rays8[:, 5:6])
        tlim = rays8[:, 7:8]
        occ_ref[...] = jnp.zeros((SBLK, 1), jnp.float32)
        oct = oct_ref[0, g, 0]

        def test(p, win):
            i = ord_ref[oct, p]
            rc2 = _obj_rays(inst_f, i, rc)
            c_end = inst_c[i, 1]

            def chunk_body(cw):
                c, win = cw
                det, td, ud, vd = _chunk_terms(wv, rc2, c)
                c1 = _same(td - det * eps, det * tlim - td)
                c2 = _same(ud, det - ud)
                c3 = _same(vd, det - ud - vd)
                ok = c1 & c2 & c3 & (det != 0.0)
                hit = jnp.max(ok.astype(jnp.float32), axis=1, keepdims=True)
                occ_ref[...] = jnp.maximum(occ_ref[...], hit)
                win2 = jnp.max(jnp.where(occ_ref[...] > 0.5, 0.0, tlim))
                return c + 1, jnp.minimum(win, win2)

            def chunk_cond(cw):
                return (cw[0] < c_end) & (cw[1] > 0.0)

            _, win = jax.lax.while_loop(
                chunk_cond, chunk_body, (inst_c[i, 0], win)
            )
            return win

        def visit(p, win):
            te = tent_ref[0, g, p]
            return jax.lax.cond(
                _win_admits(te, win), lambda w: test(p, w), lambda w: w, win
            )

        _scan_mask(
            lambda sw: summ_ref[0, g, sw],
            lambda wi: words_ref[0, g, wi],
            s, visit, jnp.max(tlim), early_exit=True,
            read_wtent=(lambda wi: wtent_ref[0, g, wi]) if lskip else None,
            read_stent=(lambda sw: stent_ref[0, g, sw]) if lskip else None,
            lst_ref=lst_ref if flat else None,
            test=test if flat else None,
            read_tent=(lambda p: tent_ref[0, g, p]) if flat else None,
            smin_ref=smin_ref if flat else None,
        )
        out_ref[0, g, :, 0:1] = occ_ref[...]

    for g in range(gblk):
        g_body(g)


# ---------------------------------------------------------------------------
# jitted call wrappers
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("interpret", "lskip", "budget"))
def _iwalk_closest_call(eng, origin, direction, t_limit, interpret,
                        lskip=True, budget=None):
    from path_tracer_tpu.trace.walk import _exit_clamp

    w = eng["w"]
    t_limit = _exit_clamp(eng, origin, direction, t_limit)
    rays_c, n = _pack_rays_cols(origin, direction, t_limit)
    npad = rays_c.shape[0]
    nbg = npad // SBLK // G_BLK
    o_p, d_p, tl_p = _pad_all(origin, direction, t_limit, npad, n)
    summ, words, tent, oct_b, wtent, stent = _build_mask(eng, o_p, d_p, tl_p)
    s = summ.shape[1]
    kq = tent.shape[1]
    out = pl.pallas_call(
        functools.partial(_iwalk_closest_kernel, s=s, gblk=G_BLK, lskip=lskip,
                          flat=WALK_FLAT, budget=budget),
        grid=(nbg,),
        out_shape=jax.ShapeDtypeStruct((nbg, G_BLK, SBLK, 4), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, G_BLK, s), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G_BLK, s * 32), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G_BLK, kq), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G_BLK, kq // 32), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G_BLK, s), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G_BLK, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G_BLK, SBLK, 8), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, G_BLK, SBLK, 4), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM(w.shape, jnp.float32),
            pltpu.VMEM((SBLK, 1), jnp.float32),
            pltpu.VMEM((SBLK, 1), jnp.float32),
            pltpu.VMEM((SBLK, 1), jnp.float32),
            pltpu.SMEM((kq,), jnp.int32),
            pltpu.SMEM((kq + 1,), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        summ.reshape(nbg, G_BLK, s),
        words.reshape(nbg, G_BLK, s * 32),
        tent.reshape(nbg, G_BLK, kq),
        wtent.reshape(nbg, G_BLK, kq // 32),
        stent.reshape(nbg, G_BLK, s),
        oct_b.reshape(nbg, G_BLK, 1),
        rays_c.reshape(nbg, G_BLK, SBLK, 8),
        eng["ord_oct"], eng["inst_f"], eng["inst_c"], w,
    )
    return out.reshape(npad, 4)[:n]


@functools.partial(
    jax.jit, static_argnames=("interpret", "lskip", "budget"))
def _iwalk_any_call(eng, origin, direction, t_limit, interpret, lskip=True,
                    budget=None):
    from path_tracer_tpu.trace.walk import _exit_clamp

    w = eng["w"]
    t_limit = _exit_clamp(eng, origin, direction, t_limit)
    rays_c, n = _pack_rays_cols(origin, direction, t_limit)
    npad = rays_c.shape[0]
    nbg = npad // SBLK // G_BLK
    o_p, d_p, tl_p = _pad_all(origin, direction, t_limit, npad, n)
    summ, words, tent, oct_b, wtent, stent = _build_mask(eng, o_p, d_p, tl_p)
    s = summ.shape[1]
    kq = tent.shape[1]
    ocols = 1 if budget is None else 2
    out = pl.pallas_call(
        functools.partial(_iwalk_any_kernel, s=s, gblk=G_BLK, lskip=lskip,
                          flat=WALK_FLAT, budget=budget),
        grid=(nbg,),
        out_shape=jax.ShapeDtypeStruct((nbg, G_BLK, SBLK, ocols), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, G_BLK, s), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G_BLK, s * 32), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G_BLK, kq), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G_BLK, kq // 32), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G_BLK, s), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G_BLK, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G_BLK, SBLK, 8), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, G_BLK, SBLK, ocols), lambda b: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM(w.shape, jnp.float32),
            pltpu.VMEM((SBLK, 1), jnp.float32),
            pltpu.SMEM((kq,), jnp.int32),
            pltpu.SMEM((kq + 1,), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        summ.reshape(nbg, G_BLK, s),
        words.reshape(nbg, G_BLK, s * 32),
        tent.reshape(nbg, G_BLK, kq),
        wtent.reshape(nbg, G_BLK, kq // 32),
        stent.reshape(nbg, G_BLK, s),
        oct_b.reshape(nbg, G_BLK, 1),
        rays_c.reshape(nbg, G_BLK, SBLK, 8),
        eng["ord_oct"], eng["inst_f"], eng["inst_c"], w,
    )
    if budget is not None:
        return out.reshape(npad, 2)[:n]
    return out.reshape(-1)[:n]


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def _closest_call_for(part):
    """vwalk parts carry virtual-slot tables; iwalk parts carry clipped
    instance chunk ranges — same output columns either way."""
    return _vwalk_closest_call if "vinst" in part else _iwalk_closest_call


def _any_call_for(part):
    return _vwalk_any_call if "vinst" in part else _iwalk_any_call


def _iclosest_parts(eng: dict, o_s, d_s, tl_s, interp, budget=None):
    """Part loop with one live t-window (see walk._closest_parts); columns
    (best_t | global slot | instance | pad). With ``budget``, col 3 is the
    MIN over parts of the unvisited-suffix bound."""
    parts = eng.get("parts")
    if parts is None:
        return _closest_call_for(eng)(eng, o_s, d_s, tl_s, interp,
                                      lskip=WALK_LSKIP, budget=budget)
    best = None
    rem = None
    for pi, part in enumerate(parts):
        off = eng["slot_off"][pi]
        tl_i = tl_s if best is None else jnp.minimum(tl_s, best[:, 0])
        out = _closest_call_for(part)(part, o_s, d_s, tl_i, interp,
                                      lskip=WALK_LSKIP, budget=budget)
        hit_i = out[:, 0] < _BIG
        slot_i = jnp.where(hit_i, out[:, 1] + off, -1.0)
        if budget is not None:
            rem = out[:, 3] if rem is None else jnp.minimum(rem, out[:, 3])
        if best is None:
            best = jnp.stack([out[:, 0], slot_i, out[:, 2], out[:, 3]], axis=1)
        else:
            upd = out[:, 0] < best[:, 0]
            best = jnp.stack(
                [jnp.where(upd, out[:, 0], best[:, 0]),
                 jnp.where(upd, slot_i, best[:, 1]),
                 jnp.where(upd, out[:, 2], best[:, 2]),
                 best[:, 3]], axis=1,
            )
    if budget is not None:
        best = jnp.concatenate([best[:, :3], rem[:, None]], axis=1)
    return best


def _ieng_multi(eng: dict) -> bool:
    """Multi-pass gate for the two-level engines: total GATE entries
    (virtual chunks for vwalk, instances for iwalk) across parts."""
    from path_tracer_tpu.trace.walk import (
        WALK_BUDGET, WALK_FLAT as _FLAT, WALK_MP_MIN, WALK_PASSES)

    parts = eng.get("parts") or (eng,)
    gates = sum(int(p["ord_oct"].shape[1]) for p in parts)
    return (WALK_BUDGET > 0 and WALK_PASSES > 1 and _FLAT
            and gates >= WALK_MP_MIN)


def _iclosest_multi(eng: dict, origin, direction, t_limit, interp):
    """Budgeted multi-pass two-level closest hit (see walk._closest_multi:
    bit-identical to the single-pass scan). Returns [n, 4]."""
    from path_tracer_tpu.trace.walk import WALK_BUDGET, WALK_PASSES

    best = None
    tl_cur = t_limit
    for p in range(WALK_PASSES):
        last = p == WALK_PASSES - 1
        budget = None if last else WALK_BUDGET * (4 ** p)
        if WALK_SORT:
            order = _coherence_order(eng, origin, direction, tl_cur)
            o_s, d_s, tl_s = origin[order], direction[order], tl_cur[order]
        else:
            o_s, d_s, tl_s = origin, direction, tl_cur
        out = _iclosest_parts(eng, o_s, d_s, tl_s, interp, budget=budget)
        if WALK_SORT:
            out = _unsort_rows(out, order)
        if best is None:
            best = out[:, :3]
        else:
            upd = out[:, 0] < best[:, 0]
            best = jnp.stack(
                [jnp.where(upd, out[:, 0], best[:, 0]),
                 jnp.where(upd, out[:, 1], best[:, 1]),
                 jnp.where(upd, out[:, 2], best[:, 2])], axis=1,
            )
        if last:
            break
        lane_win = jnp.minimum(best[:, 0], tl_cur)
        unresolved = _win_admits(out[:, 3], lane_win)
        tl_cur = jnp.where(unresolved, lane_win, 0.0)
    return jnp.concatenate(
        [best, jnp.zeros((best.shape[0], 1), jnp.float32)], axis=1)


def iwalk_closest_hit_shade(eng: dict, origin, direction, t_limit):
    """Closest hit through instances: ``(tri_idx, t, u, v, normal_world
    [N,3], model_id [N] i32, inst [N] i32)`` — tri_idx in the engine's
    global object-tri order."""
    if _ieng_multi(eng):
        out = _iclosest_multi(eng, origin, direction, t_limit,
                              _interpret_default())
    elif WALK_SORT:
        order = _coherence_order(eng, origin, direction, t_limit)
        o_s, d_s, tl_s = origin[order], direction[order], t_limit[order]
        out = _iclosest_parts(eng, o_s, d_s, tl_s, _interpret_default())
        out = _unsort_rows(out, order)
    else:
        out = _iclosest_parts(eng, origin, direction, t_limit,
                              _interpret_default())
    gl = out[:, 1].astype(jnp.int32)
    inst = out[:, 2].astype(jnp.int32)
    hit = gl >= 0
    glc = jnp.maximum(gl, 0)
    row = jnp.take(eng["aux"], glc, axis=0)
    irow = jnp.take(eng["inst_rows"], jnp.maximum(inst, 0), axis=0)

    # object-space ray through the winner instance's inverse transform, in
    # the kernel's exact expression order (f32 FMA chain parity)
    ox = irow[:, 0] * origin[:, 0] + irow[:, 1] * origin[:, 1] + irow[:, 2] * origin[:, 2] + irow[:, 9]
    oy = irow[:, 3] * origin[:, 0] + irow[:, 4] * origin[:, 1] + irow[:, 5] * origin[:, 2] + irow[:, 10]
    oz = irow[:, 6] * origin[:, 0] + irow[:, 7] * origin[:, 1] + irow[:, 8] * origin[:, 2] + irow[:, 11]
    dx = irow[:, 0] * direction[:, 0] + irow[:, 1] * direction[:, 1] + irow[:, 2] * direction[:, 2]
    dy = irow[:, 3] * direction[:, 0] + irow[:, 4] * direction[:, 1] + irow[:, 5] * direction[:, 2]
    dz = irow[:, 6] * direction[:, 0] + irow[:, 7] * direction[:, 1] + irow[:, 8] * direction[:, 2]

    col = lambda k: row[:, k]
    det = col(0) * dx + col(1) * dy + col(2) * dz
    td = col(3) - (col(0) * ox + col(1) * oy + col(2) * oz)
    px = det * ox + td * dx
    py = det * oy + td * dy
    pz = det * oz + td * dz
    ud = col(4) * px + col(5) * py + col(6) * pz + det * col(7)
    vd = col(8) * px + col(9) * py + col(10) * pz + det * col(11)
    inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
    t = jnp.where(hit, td * inv_det, t_limit)
    u = jnp.where(hit, ud * inv_det, 0.0)
    v = jnp.where(hit, vd * inv_det, 0.0)
    w_ = 1.0 - u - v
    n_obj = (
        w_[:, None] * row[:, 12:15]
        + u[:, None] * row[:, 15:18]
        + v[:, None] * row[:, 18:21]
    )
    # deferred normal transform: world n = forward R @ object n
    nx, ny, nz = n_obj[:, 0], n_obj[:, 1], n_obj[:, 2]
    normal = jnp.stack(
        [
            irow[:, 12] * nx + irow[:, 13] * ny + irow[:, 14] * nz,
            irow[:, 15] * nx + irow[:, 16] * ny + irow[:, 17] * nz,
            irow[:, 18] * nx + irow[:, 19] * ny + irow[:, 20] * nz,
        ],
        axis=-1,
    )
    model = jnp.where(hit, row[:, 21].astype(jnp.int32), 0)
    orig = jnp.where(hit, jnp.take(eng["origmap"], glc), -1)
    inst = jnp.where(hit, inst, -1)
    return orig, t, u, v, normal, model, inst


def _iany_parts(eng: dict, o, d, tl, interp, budget=None):
    parts = eng.get("parts")
    if parts is None:
        out = _any_call_for(eng)(eng, o, d, tl, interp,
                                 lskip=WALK_LSKIP, budget=budget)
        if budget is not None:
            return out[:, 0] > 0.0, out[:, 1]
        return out > 0.0
    occ = jnp.zeros(o.shape[0], bool)
    rem = None
    for part in parts:
        tl_i = jnp.where(occ, 0.0, tl)
        out = _any_call_for(part)(part, o, d, tl_i, interp,
                                  lskip=WALK_LSKIP, budget=budget)
        if budget is not None:
            occ = occ | (out[:, 0] > 0.0)
            rem = out[:, 1] if rem is None else jnp.minimum(rem, out[:, 1])
        else:
            occ = occ | (out > 0.0)
    if budget is not None:
        return occ, rem
    return occ


def _iany_multi(eng: dict, origin, direction, t_limit, interp):
    """Budgeted multi-pass two-level any-hit (see walk._any_multi)."""
    from path_tracer_tpu.trace.walk import WALK_BUDGET, WALK_PASSES

    occ = jnp.zeros(origin.shape[0], bool)
    tl_cur = t_limit
    for p in range(WALK_PASSES):
        last = p == WALK_PASSES - 1
        budget = None if last else WALK_BUDGET * (4 ** p)
        if WALK_SORT_ANY:
            order = _coherence_order(eng, origin, direction, tl_cur)
            o_s, d_s, tl_s = origin[order], direction[order], tl_cur[order]
        else:
            o_s, d_s, tl_s = origin, direction, tl_cur
        out = _iany_parts(eng, o_s, d_s, tl_s, interp, budget=budget)
        if last:
            occ_p = out
            if WALK_SORT_ANY:
                occ_p = _unsort_rows(occ_p, order)
            return occ | occ_p
        occ_p, rem = out
        if WALK_SORT_ANY:
            occ_p = _unsort_rows(occ_p, order)
            rem = _unsort_rows(rem, order)
        occ = occ | occ_p
        unresolved = ~occ & _win_admits(rem, tl_cur)
        tl_cur = jnp.where(unresolved, tl_cur, 0.0)
    return occ


def iwalk_any_hit(eng: dict, origin, direction, t_limit):
    if _ieng_multi(eng):
        return _iany_multi(eng, origin, direction, t_limit,
                           _interpret_default())
    if WALK_SORT_ANY:
        order = _coherence_order(eng, origin, direction, t_limit)
        out = _iany_parts(
            eng, origin[order], direction[order], t_limit[order],
            _interpret_default(),
        )
        return _unsort_rows(out, order)
    return _iany_parts(eng, origin, direction, t_limit, _interpret_default())


# ---------------------------------------------------------------------------
# vwalk: virtual-chunk two-level engine (iwalk v2)
# ---------------------------------------------------------------------------
#
# iwalk gates whole INSTANCES and then brute-walks every clipped chunk of a
# gated-in instance — no per-chunk culling, no tent skips inside the range.
# vwalk expands the (instance x chunk) product into VIRTUAL chunks: each has
# a world box (the instance transform of the object chunk box, all 8
# corners), so the walk engine's whole gating stack — per-chunk block gates,
# octant front-to-back orders, live t-window, hierarchical word/summary
# skips — applies at (instance, chunk) granularity. Plane tables stay in
# OBJECT space and are shared per model; the kernel transforms the block's
# rays per visit (12 SMEM scalars + VPU FMAs; rigid => t unchanged,
# model.rs:40-43). This is blas.rs:214-294 + tlas.rs:66-110 fused into one
# flat gated stream.

VWALK_SPLIT_VCH = max(64, int(_os.environ.get("PT_VWALK_SPLIT", "1024")))
VWALK_MAX_VCH = 16 * 1536  # total virtual chunks across parts


def pack_vwalk(models, split_vch: int = VWALK_SPLIT_VCH) -> dict:
    """Pack the virtual-chunk two-level engine (host numpy).

    Per part kernel tables: ``w`` [8, nloc*2*CH_W] object-space plane table
    of the part's REFERENCED object chunks (compacted — sharing is lost only
    when one part spans several instances of the same model); ``cb_oct`` /
    ``cb_lay`` / ``pos_valid`` / ``ord_oct`` exactly as in walk.pack_walk
    but over virtual-chunk world boxes; ``vinst``/``vchunk``/``vglob``
    [kvq] i32 per layout slot: owning instance, part-local w chunk, global
    object chunk (for aux/origmap resolution). Top-level: ``aux``/``origmap``
    in global object-slot order, ``inst_rows`` for the shading epilogue,
    global sort quantizers and root box, ``slot_off`` zeros (winner slots
    are already object-global)."""
    from path_tracer_tpu.scene import triangle as tri_mod

    w_model, aux_parts, orig_parts = [], [], []
    chunk_off = [0]
    tri_off = 0
    cbox_min, cbox_max = [], []
    for mid, model in enumerate(models):
        pos = np.asarray(model.positions, np.float32)
        pre = tri_mod.precompute(pos)
        w, aux, orig, k, cmin, cmax = _model_chunk_tables(
            pre, np.asarray(model.normals, np.float32).reshape(-1, 9),
            pos, mid, tri_off,
        )
        w_model.append(w)
        aux_parts.append(aux)
        orig_parts.append(orig)
        chunk_off.append(chunk_off[-1] + k)
        cbox_min.append(cmin)
        cbox_max.append(cmax)
        tri_off += pos.shape[0]
    K = chunk_off[-1]
    w_all = np.concatenate(w_model, axis=1).reshape(8, K, 2 * CH_W)
    aux_all = np.concatenate(aux_parts)
    orig_all = np.concatenate(orig_parts)
    cbox_min = np.concatenate(cbox_min)
    cbox_max = np.concatenate(cbox_max)

    inst_f, inst_rows, inst_mats, inst_mid = [], [], [], []
    for mid, model in enumerate(models):
        for matrix in model.matrices:
            m = np.asarray(matrix, np.float32)
            rot, tr = m[:, :3], m[:, 3]
            rinv = rot.T
            tinv = -rinv @ tr
            inst_f.append(np.concatenate([rinv.reshape(9), tinv]))
            row = np.zeros(24, np.float32)
            row[0:9] = rinv.reshape(9)
            row[9:12] = tinv
            row[12:21] = rot.reshape(9)
            row[21] = float(mid)
            inst_rows.append(row)
            inst_mats.append(m)
            inst_mid.append(mid)
    n_inst = len(inst_f)
    inst_f = np.stack(inst_f).astype(np.float32)

    # virtual chunks: world boxes of every (instance, object chunk) pair —
    # all 8 corners through the rigid transform (boundingbox.rs:51-57 fix)
    v_inst, v_chunk, vb_lo, vb_hi = [], [], [], []
    for i, mid in enumerate(inst_mid):
        c0, c1 = chunk_off[mid], chunk_off[mid + 1]
        rot, tr = inst_mats[i][:, :3], inst_mats[i][:, 3]
        lo, hi = cbox_min[c0:c1], cbox_max[c0:c1]
        corners = np.stack(
            [np.stack([hi[:, 0] if j & 4 else lo[:, 0],
                       hi[:, 1] if j & 2 else lo[:, 1],
                       hi[:, 2] if j & 1 else lo[:, 2]], axis=1)
             for j in range(8)], axis=1)           # [k, 8, 3]
        world = corners @ rot.T + tr
        vb_lo.append(world.min(axis=1).astype(np.float32))
        vb_hi.append(world.max(axis=1).astype(np.float32))
        v_inst.append(np.full(c1 - c0, i, np.int32))
        v_chunk.append(np.arange(c0, c1, dtype=np.int32))
    v_inst = np.concatenate(v_inst)
    v_chunk = np.concatenate(v_chunk)
    vb_lo = np.concatenate(vb_lo)
    vb_hi = np.concatenate(vb_hi)
    KV = v_inst.shape[0]
    if KV > VWALK_MAX_VCH:
        raise ValueError(
            f"vwalk caps at {VWALK_MAX_VCH} virtual chunks, got {KV}")

    def _pack_part(ids):
        kv = len(ids)
        if kv > 1:
            nodes, perm2, root = build_sah_tree(
                vb_lo[ids], vb_hi[ids], max_leaf=1)
            ords = _octant_orders(nodes, root, kv)
        else:
            perm2 = np.zeros(1, np.int64)
            ords = np.zeros((8, 1), np.int32)
        lay = ids[perm2]                       # global virtual id per slot
        kvq = ((kv + 127) // 128) * 128
        cb_lo, cb_hi = vb_lo[lay], vb_hi[lay]
        cb_oct = np.full((8, 6, kvq), 2.0e30, np.float32)
        ord_pad = np.zeros((8, kvq), np.int32)
        for o in range(8):
            po = ords[o]
            cb_oct[o, 0:3, :kv] = cb_lo[po].T
            cb_oct[o, 3:6, :kv] = cb_hi[po].T
            ord_pad[o, :kv] = po
        cb_lay = np.full((6, kvq), 2.0e30, np.float32)
        cb_lay[0:3, :kv] = cb_lo.T
        cb_lay[3:6, :kv] = cb_hi.T
        pos_valid = np.zeros(kvq, bool)
        pos_valid[:kv] = True
        # compact the referenced object chunks into a part-local w table
        uniq, vchunk_loc = np.unique(v_chunk[lay], return_inverse=True)
        w = w_all[:, uniq].reshape(8, len(uniq) * 2 * CH_W)
        vi = np.zeros(kvq, np.int32)
        vc = np.zeros(kvq, np.int32)
        vg = np.zeros(kvq, np.int32)
        vi[:kv] = v_inst[lay]
        vc[:kv] = vchunk_loc
        vg[:kv] = v_chunk[lay]
        pad = 1e-4 * float(
            max(np.abs(cb_lo).max(initial=0.0),
                np.abs(cb_hi).max(initial=0.0), 1.0)) + 1e-6
        return {
            "w": w, "cb_oct": cb_oct, "cb_lay": cb_lay,
            "pos_valid": pos_valid, "ord_oct": ord_pad,
            "vinst": vi, "vchunk": vc, "vglob": vg, "inst_f": inst_f,
            "root_lo": (cb_lo.min(axis=0) - pad).astype(np.float32),
            "root_hi": (cb_hi.max(axis=0) + pad).astype(np.float32),
        }

    scene_lo = vb_lo.min(axis=0)
    scene_hi = vb_hi.max(axis=0)
    extent = np.maximum(scene_hi - scene_lo, 1e-6)
    pad = 1e-4 * float(
        max(np.abs(scene_lo).max(), np.abs(scene_hi).max(), 1.0)) + 1e-6
    out = {
        "inst_rows": np.stack(inst_rows),
        "aux": aux_all,
        "origmap": orig_all,
        "sort_lo": scene_lo.astype(np.float32),
        "sort_scale": (1.0 / extent).astype(np.float32),
        "root_lo": (scene_lo - pad).astype(np.float32),
        "root_hi": (scene_hi + pad).astype(np.float32),
    }
    if KV <= split_vch:
        single = _pack_part(np.arange(KV, dtype=np.int64))
        single.update(out)
        return single
    vperm, starts, spans = chunk_partition(vb_lo, vb_hi, split_vch)
    parts = [
        _pack_part(vperm[starts[c] : starts[c] + spans[c]].astype(np.int64))
        for c in range(len(starts))
    ]
    # pad every part to ONE compiled kernel shape
    kw = max(p["w"].shape[1] for p in parts)
    kvq = max(p["ord_oct"].shape[1] for p in parts)
    for p in parts:
        if p["w"].shape[1] < kw:
            w = np.zeros((8, kw), np.float32)
            w[:, : p["w"].shape[1]] = p["w"]
            p["w"] = w
        q0 = p["ord_oct"].shape[1]
        if q0 < kvq:
            cb = np.full((8, 6, kvq), 2.0e30, np.float32)
            cb[:, :, :q0] = p["cb_oct"]
            cl = np.full((6, kvq), 2.0e30, np.float32)
            cl[:, :q0] = p["cb_lay"]
            p["cb_oct"], p["cb_lay"] = cb, cl
            for key in ("ord_oct",):
                od = np.zeros((8, kvq), np.int32)
                od[:, :q0] = p[key]
                p[key] = od
            for key in ("vinst", "vchunk", "vglob"):
                v = np.zeros(kvq, np.int32)
                v[:q0] = p[key]
                p[key] = v
            pv = np.zeros(kvq, bool)
            pv[:q0] = p["pos_valid"]
            p["pos_valid"] = pv
    out["parts"] = tuple(parts)
    out["slot_off"] = np.zeros(len(parts), np.float32)  # slots are global
    return out


def _vwalk_closest_kernel(
    summ_ref, words_ref, tent_ref, wtent_ref, stent_ref, oct_ref, rays_ref,
    ord_ref, vinst_ref, vchunk_ref, vglob_ref, inst_f, w_hbm,
    out_ref, wv, m_ref, c_ref, i_ref, lst_ref, smin_ref, sem_w,
    *, s, gblk, lskip, flat, budget=None,
):
    """One gated visit = ONE object chunk of ONE instance. Output block
    [gblk*SBLK, 4]: best_t | object-global slot | instance | pad."""
    _load_w(w_hbm, wv, sem_w)
    eps = jnp.float32(EPSILON)
    chf = jnp.float32(CH_W)
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (SBLK, CH_W), 1).astype(jnp.float32)

    def g_body(g):
        rays8 = rays_ref[0, g]
        rc = (rays8[:, 0:1], rays8[:, 1:2], rays8[:, 2:3],
              rays8[:, 3:4], rays8[:, 4:5], rays8[:, 5:6])
        tlim = rays8[:, 7:8]
        m_ref[...] = jnp.full((SBLK, 1), _BIG, jnp.float32)
        c_ref[...] = jnp.full((SBLK, 1), -1.0, jnp.float32)
        i_ref[...] = jnp.full((SBLK, 1), -1.0, jnp.float32)
        oct = oct_ref[0, g, 0]

        def test(p, win):
            slot = ord_ref[oct, p]
            i = vinst_ref[slot]
            c = vchunk_ref[slot]
            rc2 = _obj_rays(inst_f, i, rc)
            tm = _chunk_t(wv, rc2, c, tlim, eps)
            rowmin = jnp.min(tm, axis=1, keepdims=True)
            lane = jnp.min(
                jnp.where(tm == rowmin, lane_row, _BIG),
                axis=1, keepdims=True,
            )
            gid = vglob_ref[slot].astype(jnp.float32) * chf + lane
            upd = rowmin < m_ref[...]
            c_ref[...] = jnp.where(upd, gid, c_ref[...])
            i_ref[...] = jnp.where(upd, i.astype(jnp.float32), i_ref[...])
            m_ref[...] = jnp.where(upd, rowmin, m_ref[...])
            win2 = jnp.max(jnp.minimum(m_ref[...], tlim))
            return jnp.minimum(win, win2)

        def visit(p, win):
            te = tent_ref[0, g, p]
            return jax.lax.cond(
                _win_admits(te, win), lambda w: test(p, w), lambda w: w, win
            )

        rem = _scan_mask(
            lambda sw: summ_ref[0, g, sw],
            lambda wi: words_ref[0, g, wi],
            s, visit, jnp.max(tlim),
            read_wtent=(lambda wi: wtent_ref[0, g, wi]) if lskip else None,
            read_stent=(lambda sw: stent_ref[0, g, sw]) if lskip else None,
            lst_ref=lst_ref if flat else None,
            test=test if flat else None,
            read_tent=(lambda p: tent_ref[0, g, p]) if flat else None,
            smin_ref=smin_ref if flat else None,
            budget=budget,
        )
        t_p = m_ref[...]
        hit = t_p < _BIG
        out_ref[0, g, :, 0:1] = t_p
        out_ref[0, g, :, 1:2] = jnp.where(hit, c_ref[...], -1.0)
        out_ref[0, g, :, 2:3] = jnp.where(hit, i_ref[...], -1.0)
        if budget is not None:
            out_ref[0, g, :, 3:4] = jnp.full((SBLK, 1), rem, jnp.float32)
        else:
            out_ref[0, g, :, 3:4] = jnp.zeros((SBLK, 1), jnp.float32)

    for g in range(gblk):  # static unroll — see walk._walk_closest_kernel
        g_body(g)


def _vwalk_any_kernel(
    summ_ref, words_ref, tent_ref, wtent_ref, stent_ref, oct_ref, rays_ref,
    ord_ref, vinst_ref, vchunk_ref, vglob_ref, inst_f, w_hbm,
    out_ref, wv, occ_ref, lst_ref, smin_ref, sem_w,
    *, s, gblk, lskip, flat, budget=None,
):
    _load_w(w_hbm, wv, sem_w)
    eps = jnp.float32(EPSILON)

    def g_body(g):
        rays8 = rays_ref[0, g]
        rc = (rays8[:, 0:1], rays8[:, 1:2], rays8[:, 2:3],
              rays8[:, 3:4], rays8[:, 4:5], rays8[:, 5:6])
        tlim = rays8[:, 7:8]
        occ_ref[...] = jnp.zeros((SBLK, 1), jnp.float32)
        oct = oct_ref[0, g, 0]

        def test(p, win):
            slot = ord_ref[oct, p]
            i = vinst_ref[slot]
            c = vchunk_ref[slot]
            rc2 = _obj_rays(inst_f, i, rc)
            det, td, ud, vd = _chunk_terms(wv, rc2, c)
            c1 = _same(td - det * eps, det * tlim - td)
            c2 = _same(ud, det - ud)
            c3 = _same(vd, det - ud - vd)
            ok = c1 & c2 & c3 & (det != 0.0)
            hit = jnp.max(ok.astype(jnp.float32), axis=1, keepdims=True)
            occ_ref[...] = jnp.maximum(occ_ref[...], hit)
            win2 = jnp.max(jnp.where(occ_ref[...] > 0.5, 0.0, tlim))
            return jnp.minimum(win, win2)

        def visit(p, win):
            te = tent_ref[0, g, p]
            return jax.lax.cond(
                _win_admits(te, win), lambda w: test(p, w), lambda w: w, win
            )

        rem = _scan_mask(
            lambda sw: summ_ref[0, g, sw],
            lambda wi: words_ref[0, g, wi],
            s, visit, jnp.max(tlim), early_exit=True,
            read_wtent=(lambda wi: wtent_ref[0, g, wi]) if lskip else None,
            read_stent=(lambda sw: stent_ref[0, g, sw]) if lskip else None,
            lst_ref=lst_ref if flat else None,
            test=test if flat else None,
            read_tent=(lambda p: tent_ref[0, g, p]) if flat else None,
            smin_ref=smin_ref if flat else None,
            budget=budget,
        )
        out_ref[0, g, :, 0:1] = occ_ref[...]
        if budget is not None:
            out_ref[0, g, :, 1:2] = jnp.full((SBLK, 1), rem, jnp.float32)

    for g in range(gblk):
        g_body(g)


@functools.partial(
    jax.jit, static_argnames=("interpret", "lskip", "budget"))
def _vwalk_closest_call(eng, origin, direction, t_limit, interpret,
                        lskip=True, budget=None):
    from path_tracer_tpu.trace.walk import _exit_clamp

    w = eng["w"]
    t_limit = _exit_clamp(eng, origin, direction, t_limit)
    rays_c, n = _pack_rays_cols(origin, direction, t_limit)
    npad = rays_c.shape[0]
    nbg = npad // SBLK // G_BLK
    o_p, d_p, tl_p = _pad_all(origin, direction, t_limit, npad, n)
    summ, words, tent, oct_b, wtent, stent = _build_mask(eng, o_p, d_p, tl_p)
    s = summ.shape[1]
    kq = tent.shape[1]
    out = pl.pallas_call(
        functools.partial(_vwalk_closest_kernel, s=s, gblk=G_BLK, lskip=lskip,
                          flat=WALK_FLAT, budget=budget),
        grid=(nbg,),
        out_shape=jax.ShapeDtypeStruct((nbg, G_BLK, SBLK, 4), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, G_BLK, s), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G_BLK, s * 32), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G_BLK, kq), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G_BLK, kq // 32), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G_BLK, s), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G_BLK, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G_BLK, SBLK, 8), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, G_BLK, SBLK, 4), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM(w.shape, jnp.float32),
            pltpu.VMEM((SBLK, 1), jnp.float32),
            pltpu.VMEM((SBLK, 1), jnp.float32),
            pltpu.VMEM((SBLK, 1), jnp.float32),
            pltpu.SMEM((kq,), jnp.int32),
            pltpu.SMEM((kq + 1,), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        summ.reshape(nbg, G_BLK, s),
        words.reshape(nbg, G_BLK, s * 32),
        tent.reshape(nbg, G_BLK, kq),
        wtent.reshape(nbg, G_BLK, kq // 32),
        stent.reshape(nbg, G_BLK, s),
        oct_b.reshape(nbg, G_BLK, 1),
        rays_c.reshape(nbg, G_BLK, SBLK, 8),
        eng["ord_oct"], eng["vinst"], eng["vchunk"], eng["vglob"],
        eng["inst_f"], w,
    )
    return out.reshape(npad, 4)[:n]


@functools.partial(
    jax.jit, static_argnames=("interpret", "lskip", "budget"))
def _vwalk_any_call(eng, origin, direction, t_limit, interpret, lskip=True,
                    budget=None):
    from path_tracer_tpu.trace.walk import _exit_clamp

    w = eng["w"]
    t_limit = _exit_clamp(eng, origin, direction, t_limit)
    rays_c, n = _pack_rays_cols(origin, direction, t_limit)
    npad = rays_c.shape[0]
    nbg = npad // SBLK // G_BLK
    o_p, d_p, tl_p = _pad_all(origin, direction, t_limit, npad, n)
    summ, words, tent, oct_b, wtent, stent = _build_mask(eng, o_p, d_p, tl_p)
    s = summ.shape[1]
    kq = tent.shape[1]
    ocols = 1 if budget is None else 2
    out = pl.pallas_call(
        functools.partial(_vwalk_any_kernel, s=s, gblk=G_BLK, lskip=lskip,
                          flat=WALK_FLAT, budget=budget),
        grid=(nbg,),
        out_shape=jax.ShapeDtypeStruct((nbg, G_BLK, SBLK, ocols), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, G_BLK, s), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G_BLK, s * 32), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G_BLK, kq), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G_BLK, kq // 32), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G_BLK, s), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G_BLK, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G_BLK, SBLK, 8), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, G_BLK, SBLK, ocols), lambda b: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM(w.shape, jnp.float32),
            pltpu.VMEM((SBLK, 1), jnp.float32),
            pltpu.SMEM((kq,), jnp.int32),
            pltpu.SMEM((kq + 1,), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        summ.reshape(nbg, G_BLK, s),
        words.reshape(nbg, G_BLK, s * 32),
        tent.reshape(nbg, G_BLK, kq),
        wtent.reshape(nbg, G_BLK, kq // 32),
        stent.reshape(nbg, G_BLK, s),
        oct_b.reshape(nbg, G_BLK, 1),
        rays_c.reshape(nbg, G_BLK, SBLK, 8),
        eng["ord_oct"], eng["vinst"], eng["vchunk"], eng["vglob"],
        eng["inst_f"], w,
    )
    if budget is not None:
        return out.reshape(npad, 2)[:n]
    return out.reshape(-1)[:n]
