"""Walk CALL phase profile with honest synchronization.

Times `_walk_closest_call` / `_walk_any_call` / the coherence sort /
`_build_mask` on bounce-regime (fully incoherent) rays, syncing through a
jitted SCALAR reduction — transferring a full [n, 4] output over the
tunneled TPU costs ~80 ms for 4 MB and completely swamps the kernel
(the bench.py HONESTY NOTE applies to every microbench too; this file
exists because an earlier probe mistook that transfer for per-block
fixed cost).

Usage: python benches/profile_walk_call.py [--rays 262144] [--scene mesh_scene]
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
    ap.add_argument("--scene", default="mesh_scene")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    os.environ.setdefault("PT_WALK_MIN", "0")

    import numpy as np
    import jax
    import jax.numpy as jnp

    from path_tracer_tpu import scenes
    from path_tracer_tpu.trace import walk

    scene_host, cam = getattr(scenes, args.scene)()
    scene = scene_host.device()
    assert "walk" in scene["tri"], "walk engine not packed (PT_WALK_MIN)"
    eng = scene["tri"]["walk"]
    lo = np.asarray(eng["root_lo"])
    hi = np.asarray(eng["root_hi"])

    n = args.rays
    rng = np.random.default_rng(7)
    o = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    tl = jnp.full(n, 3.0e38, jnp.float32)
    order = walk._coherence_order(eng, oj, dj, tl)
    os_, ds_ = oj[order], dj[order]

    def timed(make, name, per=None):
        red = jax.jit(make)
        np.asarray(red())  # compile + warm
        best = 1e9
        for _ in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(red())
            best = min(best, time.perf_counter() - t0)
        extra = f"  {per(best):8.2f} {per.__name__}" if per else ""
        print(f"{name:12s}: {best*1e3:9.2f} ms  {n/best/1e6:8.2f} Mrays/s{extra}",
              flush=True)
        return best

    interp = walk._interpret_default()
    timed(lambda: jnp.sum(
        walk._walk_closest_call(eng, os_, ds_, tl, interp,
                                lskip=walk.WALK_LSKIP)[0]), "closest")
    timed(lambda: jnp.sum(
        walk._walk_any_call(eng, os_, ds_, tl, interp,
                            lskip=walk.WALK_LSKIP)), "any")
    tl0 = jnp.full(n, 2e-3, jnp.float32)
    timed(lambda: jnp.sum(
        walk._walk_closest_call(eng, os_, ds_, tl0, interp,
                                lskip=walk.WALK_LSKIP)[0]), "fixed(0vis)")
    timed(lambda: jnp.sum(walk._coherence_order(eng, oj, dj, tl)), "sort")
    timed(lambda: jnp.sum(walk._radix_order(
        jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(2654435761),
        walk.WALK_SORT_BITS)), "radix")
    timed(lambda: jnp.sum(walk._build_mask(eng, os_, ds_, tl)[2]), "mask")

    st = walk.walk_stats(eng, oj, dj, tl)
    nblk = n // walk.SBLK
    print(f"stats: visits/block={st['visits']/nblk:.1f} "
          f"(kq={eng['cb_oct'].shape[2]}, blocks={nblk})", flush=True)


if __name__ == "__main__":
    main()
