"""Gating headroom: block-gate listed chunks vs the per-ray optimum.

The block gate lists every chunk whose slab interval intersects the BLOCK's
conservative bounds (origin box x direction intervals x max t). Two tighter
references bound what any gate could achieve:

* **per-ray listed**: chunks whose box the individual ray segment
  [0, t_limit] hits — what a perfect per-ray traversal would consider.
* **block union**: the union of the block's 128 per-ray sets — the floor
  for ANY per-block gating scheme given the current sort (the gate cannot
  do better than the union without dropping correct chunks).

gate_slack = listed / union measures gate looseness (fixable by better
gate math or key shape); union / per_ray measures ray-aggregation dilution
(fixable only by a better sort or smaller blocks). Everything here is pure
XLA slab math — backend-independent, no kernel, no hardware needed.

Usage: python benches/walk_gate_headroom.py [--scene dragon]
       [--rays 262144] [--obits 15] [--regime bounce-room|camera]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="dragon", choices=["mesh", "dragon"])
    ap.add_argument("--rays", type=int, default=262144)
    ap.add_argument("--obits", type=int, default=15)
    ap.add_argument("--regime", default="bounce-room",
                    choices=["bounce-room", "camera"])
    ap.add_argument("--groups", default="",
                    help="also report the interval gate at sub-block "
                         "granularities, OR-ed back to 128-ray blocks "
                         "(e.g. 64,32,16) — the sub-gate design space")
    ap.add_argument("--predicted", action="store_true",
                    help="ALSO gate with per-ray t_limit = (first chunk-"
                         "entry t + 2 chunk diameters): the ceiling of a "
                         "hash-based predicted-t two-pass scheme "
                         "(arxiv 1910.01304) at the gate level")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from path_tracer_tpu.scene import procedural, triangle
    from path_tracer_tpu.trace import walk
    from path_tracer_tpu.utils.disk_cache import cached_arrays

    if args.scene == "dragon":
        pos, nrm = cached_arrays(procedural.knot, scale=42.0)
    else:
        pos, nrm = cached_arrays(procedural.bumpy_sphere, nu=192, nv=192)
    t = pos.shape[0]
    tri = triangle.precompute(pos)
    packer = (walk.pack_walk if t <= walk.WALK_MAX_TRIS
              else walk.pack_walk_parts)
    eng_np = packer(tri, nrm.reshape(-1, 9), None, pos)

    def up(x):
        if isinstance(x, dict):
            return {k: up(v) for k, v in x.items()}
        if isinstance(x, tuple):
            return tuple(up(v) for v in x)
        return jnp.asarray(x)

    eng = up(eng_np)
    parts = eng.get("parts") or (eng,)
    n = args.rays
    rng = np.random.default_rng(3)
    ctr = pos.reshape(-1, 3).mean(axis=0)
    ext = float(np.abs(pos - ctr).max())

    if args.regime == "camera":
        org = ctr + np.float32([0.0, 0.0, 3.0 * ext])
        tgt = pos[rng.integers(0, t, n)].mean(axis=1)
        d = tgt - org
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        o = np.broadcast_to(org, d.shape).astype(np.float32)
        lim = np.full(n, 3.0e38, np.float32)
    else:
        o = (pos[rng.integers(0, t, n)].mean(axis=1)
             + rng.standard_normal((n, 3)) * 0.01 * ext).astype(np.float32)
        d = rng.standard_normal((n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        room_lo = ctr - 1.6 * ext
        room_hi = ctr + 1.6 * ext
        with np.errstate(divide="ignore"):
            inv = np.where(d == 0.0, np.inf, 1.0 / d)
        t1 = (room_lo - o) * inv
        t2 = (room_hi - o) * inv
        lim = np.minimum(
            np.nan_to_num(np.maximum(t1, t2), posinf=3.0e38), 3.0e38
        ).min(axis=1)
        lim = np.maximum(lim, 0.0).astype(np.float32)

    walk._KEY_OBITS = max(0, min(15, args.obits))
    o_j, d_j, lim_j = jnp.asarray(o), jnp.asarray(d), jnp.asarray(lim)
    order = walk._coherence_order(eng, o_j, d_j, lim_j)
    o_s, d_s, tl_s = o_j[order], d_j[order], lim_j[order]

    @jax.jit
    def block_listed(part, o_b, d_b, tl_b):
        tl_c = walk._exit_clamp(part, o_b, d_b, tl_b)
        tent = walk._build_mask(part, o_b, d_b, tl_c)[2]
        return (tent < walk._BIG).sum()

    @functools.partial(jax.jit, static_argnames=("g",))
    def group_listed(part, o_b, d_b, tl_b, g):
        """Interval gate at g-ray granularity (walk's exact slab math via
        _slab_lo_hi on g-sized bounds), OR-ed back to 128-ray blocks."""
        tl_c = walk._exit_clamp(part, o_b, d_b, tl_b)
        sblk, walk.SBLK = walk.SBLK, g
        try:
            bb = walk._block_bounds(o_b, d_b, tl_c)
            oct_g = walk._block_octant(d_b)
        finally:
            walk.SBLK = sblk
        sel = part["cb_oct"][oct_g]
        ok, _ = walk._slab_lo_hi(sel, bb, oct_g.shape[0], sel.shape[2])
        return ok.reshape(-1, walk.SBLK // g, sel.shape[2]).any(axis=1).sum()

    @jax.jit
    def per_ray_hits(lo, hi, o_b, d_b, tl_b):
        """[rays, k] bool: ray segment [0, tl] intersects chunk box.
        Same conservative slab-in-multiply form as the gate, per ray."""
        d0 = d_b == 0.0
        inv = 1.0 / jnp.where(d0, 1.0, d_b)
        t_lo = jnp.zeros((o_b.shape[0], lo.shape[0]), jnp.float32)
        t_hi = jnp.broadcast_to(tl_b[:, None], t_lo.shape)
        for a in range(3):
            n1 = lo[None, :, a] - o_b[:, a, None]
            n2 = hi[None, :, a] - o_b[:, a, None]
            r = inv[:, a, None]
            lo_a = jnp.minimum(n1 * r, n2 * r)
            hi_a = jnp.maximum(n1 * r, n2 * r)
            inside = (o_b[:, a, None] >= lo[None, :, a]) & (
                o_b[:, a, None] <= hi[None, :, a])
            crs = d0[:, a, None]
            lo_a = jnp.where(crs, jnp.where(inside, -walk._BIG, walk._BIG), lo_a)
            hi_a = jnp.where(crs, jnp.where(inside, walk._BIG, -walk._BIG), hi_a)
            t_lo = jnp.maximum(t_lo, lo_a)
            t_hi = jnp.minimum(t_hi, hi_a)
        return t_lo <= t_hi

    @jax.jit
    def per_ray_entry(lo, hi, o_b, d_b, tl_b):
        """Per-ray MIN conservative entry t over the part's chunks (BIG if
        the ray hits none) — a stand-in for 'distance to first geometry'."""
        d0 = d_b == 0.0
        inv = 1.0 / jnp.where(d0, 1.0, d_b)
        t_lo = jnp.zeros((o_b.shape[0], lo.shape[0]), jnp.float32)
        t_hi = jnp.broadcast_to(tl_b[:, None], t_lo.shape)
        for a in range(3):
            n1 = lo[None, :, a] - o_b[:, a, None]
            n2 = hi[None, :, a] - o_b[:, a, None]
            r = inv[:, a, None]
            lo_a = jnp.minimum(n1 * r, n2 * r)
            hi_a = jnp.maximum(n1 * r, n2 * r)
            inside = (o_b[:, a, None] >= lo[None, :, a]) & (
                o_b[:, a, None] <= hi[None, :, a])
            crs = d0[:, a, None]
            lo_a = jnp.where(crs, jnp.where(inside, -walk._BIG, walk._BIG), lo_a)
            hi_a = jnp.where(crs, jnp.where(inside, walk._BIG, -walk._BIG), hi_a)
            t_lo = jnp.maximum(t_lo, lo_a)
            t_hi = jnp.minimum(t_hi, hi_a)
        ok = t_lo <= t_hi
        return jnp.min(jnp.where(ok, jnp.maximum(t_lo, 0.0), walk._BIG),
                       axis=1)

    SB = walk.SBLK
    nb = -(-n // SB)
    t0 = time.time()
    listed = per_ray = union = 0
    groups = [int(g) for g in args.groups.split(",") if g]
    g_listed = {g: 0 for g in groups}
    pred_listed = 0
    if args.predicted:
        # first chunk-entry t per ray across ALL parts, then a slack of two
        # typical chunk diameters (predictions must stay conservative-ish)
        entry = jnp.full((n,), walk._BIG, jnp.float32)
        diam = 0.0
        for part in parts:
            pv = np.asarray(part["pos_valid"])
            kk = int(pv.sum())
            cl = np.asarray(part["cb_lay"])
            lo_h, hi_h = cl[0:3, :kk].T, cl[3:6, :kk].T
            diam = max(diam, float(np.linalg.norm(hi_h - lo_h, axis=1).mean()))
            B = 8192
            for s0 in range(0, n, B):
                e = per_ray_entry(jnp.asarray(lo_h), jnp.asarray(hi_h),
                                  o_s[s0 : s0 + B], d_s[s0 : s0 + B],
                                  tl_s[s0 : s0 + B])
                entry = entry.at[s0 : s0 + B].set(
                    jnp.minimum(entry[s0 : s0 + B], e))
        tl_pred = jnp.minimum(tl_s, jnp.where(
            entry < walk._BIG, entry + 2.0 * diam, tl_s))
        for part in parts:
            pred_listed += int(block_listed(part, o_s, d_s, tl_pred))
    for part in parts:
        # chunk boxes in layout order; only the real (non-pad) chunks —
        # a padded part's trailing slots would otherwise test garbage
        pv = np.asarray(part["pos_valid"])
        k = int(pv.sum())
        cl = np.asarray(part["cb_lay"])
        lo = jnp.asarray(cl[0:3, :k].T)
        hi = jnp.asarray(cl[3:6, :k].T)

        listed += int(block_listed(part, o_s, d_s, tl_s))
        for g in groups:
            g_listed[g] += int(group_listed(part, o_s, d_s, tl_s, g))
        B = 8192
        for s0 in range(0, n, B):
            hits = per_ray_hits(
                lo, hi, o_s[s0 : s0 + B], d_s[s0 : s0 + B], tl_s[s0 : s0 + B]
            )
            per_ray += int(hits.sum())
            union += int(
                hits.reshape(-1, SB, k).any(axis=1).sum()
            )
    print(json.dumps({
        "scene": args.scene, "tris": t, "parts": len(parts),
        "regime": args.regime, "rays": n, "blocks": nb,
        "obits": args.obits,
        "listed_per_block": round(listed / nb, 1),
        **({"listed_pred": round(pred_listed / nb, 1)} if args.predicted
           else {}),
        **{f"listed_g{g}": round(g_listed[g] / nb, 1) for g in groups},
        "union_per_block": round(union / nb, 1),
        "per_ray_mean": round(per_ray / n, 2),
        "gate_slack": round(listed / max(union, 1), 2),
        # union-per-block over mean per-ray set size: how much ray
        # aggregation inflates the best possible per-block list
        "aggregation_dilution": round(
            (union / nb) / max(per_ray / n, 1e-9), 2),
        "wall_s": round(time.time() - t0, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
