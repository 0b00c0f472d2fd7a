"""Decompose the dense-Pallas call cost: XLA wrapper vs kernel vs gates.

Times _closest_call / _any_call variants on one scene:
  - 1x vs 2x kernel invocations in one jit (marginal = pure kernel cost)
  - cull=True vs cab=None (gate/bound overhead)
Usage: python benches/profile_kernel_overhead.py
"""

from __future__ import annotations

import sys, os, time, functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from path_tracer_tpu import scenes
    from path_tracer_tpu.trace import dense_pallas as dp

    n = 16384
    rng = np.random.default_rng(0)
    host, cam = scenes.cornell_specular()
    scene = host.device()
    eng = scene["tri"]["dense_pl"]
    pos = host.tri["positions"]
    lo, hi = pos.min(axis=(0, 1)), pos.max(axis=(0, 1))
    ctr, ext = (lo + hi) / 2, (hi - lo)
    o = jnp.asarray(np.broadcast_to(ctr + ext * 2.0, (n, 3)).astype(np.float32))
    d = (ctr[None] - np.asarray(o)) + rng.standard_normal((n, 3)) * 0.1 * ext[None]
    d = jnp.asarray((d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32))
    tl = jnp.full((n,), 1e30, jnp.float32)

    w, aux, cab = eng["w"], eng["aux"], eng.get("cab")

    @jax.jit
    def one(o, d, tl):
        return dp._closest_call(w, aux, cab, o, d, tl, False)

    @jax.jit
    def two(o, d, tl):
        r1 = dp._closest_call(w, aux, cab, o, d, tl, False)
        r2 = dp._closest_call(w, aux, cab, o, d, r1[:, 0], False)
        return r2

    @jax.jit
    def nocull(o, d, tl):
        return dp._closest_call(w, aux, None, o, d, tl, False)

    @jax.jit
    def anyone(o, d, tl):
        return dp._any_call(w, cab, o, d, tl, False)

    @jax.jit
    def anynone(o, d, tl):
        return dp._any_call(w, None, o, d, tl, False)

    t1 = timeit(one, o, d, tl)
    t2 = timeit(two, o, d, tl)
    tn = timeit(nocull, o, d, tl)
    ta = timeit(anyone, o, d, tl)
    tan = timeit(anynone, o, d, tl)
    print(f"closest 1x: {t1*1e3:7.2f} ms   2x: {t2*1e3:7.2f} ms  "
          f"-> marginal {(t2-t1)*1e3:7.2f} ms", flush=True)
    print(f"closest nocull: {tn*1e3:7.2f} ms", flush=True)
    print(f"any cull: {ta*1e3:7.2f} ms   nocull: {tan*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
