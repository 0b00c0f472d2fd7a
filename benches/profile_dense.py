"""Per-piece timing of the dense-Pallas engine on mesh_scene geometry.

Answers: for one integrator iteration on a mid-size scene, how much is
(a) the closest-hit kernel sweep, (b) the any-hit kernel, (c) everything
else (XLA shading/regeneration)?  Usage:

    python benches/profile_dense.py [--scene mesh_scene] [--lanes 16384]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *a, reps=20):
    out = fn(*a)
    jax_block(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    jax_block(out)
    return (time.perf_counter() - t0) / reps


def jax_block(x):
    import jax

    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="mesh_scene")
    ap.add_argument("--lanes", type=int, default=16384)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from path_tracer_tpu import scenes
    from path_tracer_tpu.integrator.wavefront import trace_lanes
    from path_tracer_tpu.trace.dense_pallas import (
        dense_pl_any_hit,
        dense_pl_closest_hit_shade,
    )

    scene_host, cam = getattr(scenes, args.scene)()
    scene = scene_host.device()
    dense_pl = scene["tri"].get("dense_pl")
    if dense_pl is None:
        print("scene has no dense_pl engine on this backend")
        return
    t = scene_host.num_world_tris
    n = args.lanes
    print(f"{args.scene}: {t} tris, {n} rays")

    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    lim = jnp.full(n, 1e30, jnp.float32)

    closest = jax.jit(lambda o, d, lim: dense_pl_closest_hit_shade(dense_pl, o, d, lim))
    anyh = jax.jit(lambda o, d, lim: dense_pl_any_hit(dense_pl, o, d, lim))
    dt_c = timeit(closest, o, d, lim)
    dt_a = timeit(anyh, o, d, lim)
    # shadow batch in the integrator is 2N rays
    o2, d2, l2 = jnp.tile(o, (2, 1)), jnp.tile(d, (2, 1)), jnp.tile(lim, (2,))
    dt_a2 = timeit(anyh, o2, d2, l2)
    pairs = n * t
    print(f"closest+shade kernel: {dt_c*1e3:8.3f} ms  ({pairs/dt_c/1e9:6.1f} G pairs/s)")
    print(f"any-hit kernel (N):   {dt_a*1e3:8.3f} ms  ({pairs/dt_a/1e9:6.1f} G pairs/s)")
    print(f"any-hit kernel (2N):  {dt_a2*1e3:8.3f} ms")

    # one full integrator iteration (steps_per_iter=1, pool) minus loop count:
    # run trace_lanes at max_bounces=1 (1-2 iterations) vs 2 to difference out
    lane = jnp.arange(n, dtype=jnp.uint32)
    kw = dict(
        width=128, height=128, max_bounces=1, enable_nee=True,
        has_lights="light" in scene, spp=1, mtypes=scene_host.active_mtypes,
        any_volumes=scene_host.has_volumes, pool=True,
    )
    ndc = jnp.asarray(cam.view_proj_inverse())
    org = jnp.asarray(cam.origin)
    f = jax.jit(lambda s: trace_lanes(scene, ndc, org, s, lane, **kw))
    dt1 = timeit(f, jnp.uint32(0), reps=5)
    kw2 = dict(kw, max_bounces=4)
    f2 = jax.jit(lambda s: trace_lanes(scene, ndc, org, s, lane, **kw2))
    dt2 = timeit(f2, jnp.uint32(0), reps=5)
    print(f"trace_lanes mb=1: {dt1*1e3:8.2f} ms   mb=4: {dt2*1e3:8.2f} ms")
    print(f"  => per extra bounce-iteration: ~{(dt2-dt1)/3*1e3:6.2f} ms "
          f"(kernels account for {(dt_c+dt_a2)*1e3:5.2f} ms)")


if __name__ == "__main__":
    main()
