"""Walk-engine phase breakdown on hardware: coherence sort, mask build,
kernel stream, unsort — per ray-coherence regime and scene scale.

Times each phase by building jitted programs that stop at that phase
(device work synchronized by a host transfer — block_until_ready lies on
this tunneled platform). Also prints walk_stats (chunks tested vs
window-skipped) for the visit-efficiency picture.

Usage: python benches/profile_walk.py [--tris 74000|dragon] [--rays 65536]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, reps=5):
    import numpy as np

    fn(*args)  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax_leaf(out))
        best = min(best, time.perf_counter() - t0)
    return best


def jax_leaf(x):
    import jax

    return jax.tree_util.tree_leaves(x)[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="mesh", choices=["mesh", "dragon"])
    ap.add_argument("--rays", type=int, default=65536)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from path_tracer_tpu.scene import procedural, triangle
    from path_tracer_tpu.trace import walk

    from path_tracer_tpu.utils.disk_cache import cached_arrays

    if args.scene == "dragon":
        pos, nrm = cached_arrays(procedural.knot, scale=42.0)  # ~885K tris
    else:
        pos, nrm = cached_arrays(procedural.bumpy_sphere, nu=192, nv=192)  # ~74K tris
    t = pos.shape[0]
    tri = triangle.precompute(pos)
    packer = (walk.pack_walk if t <= walk.WALK_MAX_TRIS
              else walk.pack_walk_parts)
    t0 = time.time()
    eng_np = packer(tri, nrm.reshape(-1, 9), None, pos)
    pack_s = time.time() - t0

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

    # camera-style bundle: one origin, directions at mesh points
    org = ctr + np.float32([0.0, 0.0, 3.0 * ext])
    tgt = pos[rng.integers(0, t, n)].mean(axis=1)
    d_cam = tgt - org
    d_cam /= np.linalg.norm(d_cam, axis=1, keepdims=True)
    o_cam = np.broadcast_to(org, d_cam.shape).astype(np.float32)

    # incoherent bounce-style: origins on the mesh, random directions
    o_inc = (pos[rng.integers(0, t, n)].mean(axis=1)
             + rng.standard_normal((n, 3)) * 0.01 * ext).astype(np.float32)
    d_inc = rng.standard_normal((n, 3)).astype(np.float32)
    d_inc /= np.linalg.norm(d_inc, axis=1, keepdims=True)

    lim = jnp.full(n, 3.0e38, jnp.float32)
    # room-bounded bounce regime: in real scenes (Cornell shell around the
    # dragon) every bounce ray hits SOMETHING — at latest the wall — so each
    # lane's effective t is bounded along ITS ray. Model the wall hit as the
    # exit distance from a room box 1.6x the mesh box (a uniform clamp would
    # not shrink the block window: skips need the WORST lane bounded).
    room_lo = ctr - 1.6 * ext
    room_hi = ctr + 1.6 * ext
    with np.errstate(divide="ignore"):
        inv = np.where(d_inc == 0.0, np.inf, 1.0 / d_inc)
    t1 = (room_lo - o_inc) * inv
    t2 = (room_hi - o_inc) * inv
    t_room = np.minimum(np.nan_to_num(np.maximum(t1, t2), posinf=3.0e38), 3.0e38).min(axis=1)
    lim_room = jnp.asarray(np.maximum(t_room, 0.0).astype(np.float32))

    sort_j = jax.jit(walk._coherence_order)
    mask_j = jax.jit(walk._build_mask)

    for name, o, d, tl in (
        ("camera", o_cam, d_cam, lim),
        ("incoherent", o_inc, d_inc, lim),
        ("bounce-room", o_inc, d_inc, lim_room),
    ):
        o, d = jnp.asarray(o), jnp.asarray(d)
        order = sort_j(eng, o, d, tl)
        o_s, d_s, tl_s = o[order], d[order], tl[order]

        t_sort = timed(lambda: sort_j(eng, o, d, tl))
        t_mask = sum(
            timed(lambda p=p: mask_j(p, o_s, d_s, tl_s)) for p in parts
        )
        t_full = timed(
            lambda: walk.walk_closest_hit(eng, o, d, tl)[1]
        )
        stats = walk.walk_stats(eng, o, d, tl)
        nb = -(-n // walk.SBLK)
        print(json.dumps({
            "scene": args.scene, "tris": t, "parts": len(parts),
            "regime": name, "rays": n,
            "pack_s": round(pack_s, 2),
            "sort_ms": round(t_sort * 1e3, 3),
            "mask_ms": round(t_mask * 1e3, 3),
            "end_to_end_ms": round(t_full * 1e3, 3),
            "mrays_per_s": round(n / t_full / 1e6, 1),
            "visits_per_block": round(stats["visits"] / nb, 1),
            "skipped_per_block": round(stats["skipped"] / nb, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
