"""Multi-pass walk A/B on bounce-regime rays at BVH scale.

Times the PUBLIC closest/any walk entry points (which engage budgeted
multi-pass above PT_WALK_MP_MIN gate entries) on fully incoherent rays —
origins uniform in the scene box, random directions, per-ray t_limit set
to the exit of a room box 1.6x the mesh (every real bounce ray hits
SOMETHING; an unbounded t_limit would overstate the single-pass
pathology). Scalar-reduction sync (see profile_walk_call.py).

Usage: python benches/profile_multi.py [--scene mesh6|dragon] [--rays 262144]
Compare: PT_WALK_BUDGET=0 python benches/profile_multi.py  (single-pass)
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=262144)
    ap.add_argument("--scene", default="dragon", choices=["mesh6", "dragon"])
    ap.add_argument("--reps", type=int, default=3)
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
    n = args.rays
    rng = np.random.default_rng(7)
    ctr = pos.reshape(-1, 3).mean(axis=0)
    ext = float(np.abs(pos - ctr).max())
    o = rng.uniform(ctr - ext, ctr + ext, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    # room-box exit t per ray (see profile_walk.py's bounce-room regime)
    room_lo, room_hi = ctr - 1.6 * ext, ctr + 1.6 * ext
    with np.errstate(divide="ignore"):
        inv = np.where(d == 0.0, np.inf, 1.0 / d)
    t1, t2 = (room_lo - o) * inv, (room_hi - o) * inv
    t_room = np.nan_to_num(np.maximum(t1, t2), posinf=3.0e38).min(axis=1)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    tl = jnp.asarray(np.maximum(t_room, 1e-3).astype(np.float32))

    mp = walk._multi_pass(eng)
    print(f"scene={args.scene} tris={t} chunks={walk._eng_chunks(eng)} "
          f"multi_pass={mp} budget={walk.WALK_BUDGET} "
          f"passes={walk.WALK_PASSES}", flush=True)

    def timed(make, name):
        # eng/rays must be jit ARGUMENTS, not closures: closed-over arrays
        # become program literals, and XLA constant-folds through them —
        # measured on the dragon (13258 chunks x 3 passes): a 243 MB MLIR
        # module whose executable failed the 2 GiB proto cap at serialize.
        red = jax.jit(make)
        np.asarray(red(eng, oj, dj, tl))
        best = 1e9
        for _ in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(red(eng, oj, dj, tl))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:8s}: {best*1e3:10.2f} ms  {n/best/1e6:8.2f} Mrays/s",
              flush=True)

    timed(lambda e, o, d, t: jnp.sum(
        walk.walk_closest_hit(e, o, d, t)[1]), "closest")
    timed(lambda e, o, d, t: jnp.sum(
        walk.walk_any_hit(e, o, d, t)), "any")


if __name__ == "__main__":
    main()
