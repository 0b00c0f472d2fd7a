"""Backend-independent gate-tightness sweep for the coherence-sort key.

The walk engine's cost splits into (a) chunks the BLOCK GATE lists — pure
XLA slab math, identical on CPU and TPU — and (b) the subset the kernel's
live t-window then actually tests. PT_WALK_KEY_OBITS reshapes the sort key
(origin-cell bits vs direction-cone bits), which moves (a) directly: tighter
block frusta list fewer chunks. This script measures listed-chunks/block at
REAL wave scale (256K rays -> ~2000 blocks) across key shapes and regimes,
on any backend — answering the A/B without a hardware window. The t-window
then only shrinks each ranking's absolute numbers (walk_stats measures that
part; it needs the kernel).

Usage: python benches/walk_gate_stats.py [--scene dragon] [--rays 262144]
       [--obits 15,12,9,6,3,0]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="dragon", choices=["mesh", "dragon"])
    ap.add_argument("--rays", type=int, default=262144)
    ap.add_argument("--obits", default="15,12,9,6,3,0")
    ap.add_argument("--two-level", action="store_true",
                    help="gate the TWO-LEVEL engine (vwalk virtual chunks "
                         "over the dragon instance pair) instead of the "
                         "baked walk engine")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from path_tracer_tpu.scene import procedural, triangle
    from path_tracer_tpu.trace import walk
    from path_tracer_tpu.utils.disk_cache import cached_arrays

    if args.two_level:
        from path_tracer_tpu import scenes
        from path_tracer_tpu.trace import iwalk

        baked, _ = (scenes.dragon_scene(env_h=64) if args.scene == "dragon"
                    else scenes.many_instance_scene(grid=6, subdivisions=2))
        eng_np = iwalk.pack_vwalk(baked.models)
        # world-space surface points for ray targets/origins: bake a
        # subsample of every instance (the engine gates in world space)
        pts = []
        for m in baked.models:
            P = np.asarray(m.positions, np.float32)
            step = max(1, P.shape[0] // 20000)
            for mat in m.matrices:
                mt = np.asarray(mat, np.float32)
                pts.append((P[::step].reshape(-1, 3) @ mt[:, :3].T
                            + mt[:, 3]).reshape(-1, 3, 3))
        pos = np.concatenate(pts)
        t = pos.shape[0]
    else:
        if args.scene == "dragon":
            pos, nrm = cached_arrays(procedural.knot, scale=42.0)  # ~885K
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

    # same regimes as profile_walk (camera bundle / room-bounded bounce)
    org = ctr + np.float32([0.0, 0.0, 3.0 * ext])
    tgt = pos[rng.integers(0, t, n)].mean(axis=1)
    d_cam = tgt - org
    d_cam /= np.linalg.norm(d_cam, axis=1, keepdims=True)
    o_cam = np.broadcast_to(org, d_cam.shape).astype(np.float32)

    o_inc = (pos[rng.integers(0, t, n)].mean(axis=1)
             + rng.standard_normal((n, 3)) * 0.01 * ext).astype(np.float32)
    d_inc = rng.standard_normal((n, 3)).astype(np.float32)
    d_inc /= np.linalg.norm(d_inc, axis=1, keepdims=True)

    lim = np.full(n, 3.0e38, np.float32)
    room_lo = ctr - 1.6 * ext
    room_hi = ctr + 1.6 * ext
    with np.errstate(divide="ignore"):
        inv = np.where(d_inc == 0.0, np.inf, 1.0 / d_inc)
    t1 = (room_lo - o_inc) * inv
    t2 = (room_hi - o_inc) * inv
    t_room = np.minimum(
        np.nan_to_num(np.maximum(t1, t2), posinf=3.0e38), 3.0e38
    ).min(axis=1)
    lim_room = np.maximum(t_room, 0.0).astype(np.float32)

    @jax.jit
    def listed_per_part(part, o_s, d_s, tl_s):
        # same pre-clamp the real call applies (_walk_closest_call)
        tl_c = walk._exit_clamp(part, o_s, d_s, tl_s)
        tent = walk._build_mask(part, o_s, d_s, tl_c)[2]
        return (tent < walk._BIG).sum()

    nb = -(-n // walk.SBLK)
    for name, o, d, tl in (
        ("camera", o_cam, d_cam, lim),
        ("bounce-room", o_inc, d_inc, lim_room),
    ):
        o, d, tl = jnp.asarray(o), jnp.asarray(d), jnp.asarray(tl)
        for obits in [int(x) for x in args.obits.split(",")]:
            walk._KEY_OBITS = obits
            t0 = time.time()
            order = walk._coherence_order(eng, o, d, tl)
            o_s, d_s, tl_s = o[order], d[order], tl[order]
            listed = sum(
                int(listed_per_part(p, o_s, d_s, tl_s)) for p in parts
            )
            print(json.dumps({
                "scene": args.scene,
                "mode": "two-level-vwalk" if args.two_level else "baked-walk",
                "tris": t, "parts": len(parts),
                "regime": name, "rays": n, "blocks": nb, "obits": obits,
                "listed_per_block": round(listed / nb, 1),
                "wall_s": round(time.time() - t0, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
