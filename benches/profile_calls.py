"""Profile the per-call cost of each engine kernel + integrator pieces on TPU.

Times `_closest_call` / `_any_call` (dense Pallas), the visit-plan XLA
prologue, and one full integrator while-iteration, at several scene sizes and
ray distributions (coherent camera block vs incoherent bounce-like).

Usage: python benches/profile_calls.py
"""

from __future__ import annotations

import sys, os, time, functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=20, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from path_tracer_tpu import scenes
    from path_tracer_tpu.trace import dense_pallas as dp

    n = 16384
    rng = np.random.default_rng(0)

    for name in ("cornell_specular", "mesh_scene", "many_instance_scene"):
        host, cam = getattr(scenes, name)()
        scene = host.device()
        eng = scene["tri"]["dense_pl"]
        tris = host.num_world_tris
        pos = host.tri["positions"]
        lo, hi = pos.min(axis=(0, 1)), pos.max(axis=(0, 1))
        ctr, ext = (lo + hi) / 2, (hi - lo)

        # coherent: camera-like fan from one point toward scene center
        o_coh = jnp.asarray(np.broadcast_to(ctr + ext * 2.0, (n, 3)).astype(np.float32))
        d = (ctr[None] - np.asarray(o_coh)) + rng.standard_normal((n, 3)) * 0.1 * ext[None]
        d_coh = jnp.asarray((d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32))
        # incoherent: random origins in box, random dirs
        o_inc = jnp.asarray((ctr + (rng.random((n, 3)) - 0.5) * ext).astype(np.float32))
        d = rng.standard_normal((n, 3))
        d_inc = jnp.asarray((d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32))
        tl = jnp.full((n,), 1e30, jnp.float32)

        for tag, o, dd in (("coh", o_coh, d_coh), ("inc", o_inc, d_inc)):
            dt_c = timeit(dp._closest_call, eng["w"], eng["aux"], eng.get("cab"),
                          o, dd, tl, False)
            dt_a = timeit(dp._any_call, eng["w"], eng.get("cab"), o, dd, tl, False)
            print(f"{name:22s} T={tris:6d} {tag}: closest {dt_c*1e3:7.2f} ms  "
                  f"any {dt_a*1e3:7.2f} ms  ({n/dt_c/1e6:6.1f} / {n/dt_a/1e6:6.1f} Mrays/s)",
                  flush=True)

        chunks, ch = dp._geom(np.asarray(eng["w"]))
        print(f"  chunks={chunks} ch={ch}", flush=True)


if __name__ == "__main__":
    main()
