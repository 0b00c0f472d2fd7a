"""Probe: per-LANE dynamic gather from a VMEM-resident table inside Pallas.

Round-1 probed per-row DMA gathers (8M rows/s, issue-bound) and one-hot MXU
gathers (O(table) per access) — both rule out per-lane BVH traversal. This
probe measures Mosaic's `tpu.dynamic_gather` (exposed via
`jnp.take_along_axis` on 2D operands with operand/indices/output all the SAME
shape):

  mode 0 (sublane gather): out[i,j] = x[idx[i,j], j]  — x [M, 128] with every
      lane-column holding the same M-entry table ⇒ M*128 lanes fetch their own
      entry in ONE op.
  mode 1 (lane gather):    out[i,j] = x[i, idx[i,j]]  — x [8, M] with every
      sublane-row holding the table ⇒ 8*M lanes per op.

Tables larger than the wave tile split into T/M pieces selected by index high
bits (cost O(T/M) gathers). If one gather over a [512,128] tile costs ~µs,
per-lane stack BVH traversal (top tree over dense leaf chunks) becomes the
≥100 Mrays/s engine for big scenes.

Usage: python benches/pallas_lane_gather_probe.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _time(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def _kern(tbl_ref, idx_ref, out_ref, *, axis, reps):
    tbl = tbl_ref[...]
    idx = idx_ref[...]
    m = tbl.shape[axis]
    acc = jnp.zeros(idx.shape, jnp.float32)
    for k in range(reps):
        ik = idx + k if k else idx
        if k:
            ik = jnp.where(ik >= m, ik - m, ik)
        acc = acc + jnp.take_along_axis(tbl, ik, axis=axis)
    out_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("axis", "reps"))
def probe(tbl, idx, axis, reps=1):
    return pl.pallas_call(
        functools.partial(_kern, axis=axis, reps=reps),
        out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tbl, idx)


def run(tag, shape, axis):
    rng = np.random.default_rng(0)
    m = shape[axis]
    lanes = shape[0] * shape[1]
    tbl = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    idx = jnp.asarray(rng.integers(0, m, shape), jnp.int32)
    try:
        dt1, o1 = _time(probe, tbl, idx, axis)
        dt16, _ = _time(functools.partial(probe, reps=16), tbl, idx, axis)
        per = (dt16 - dt1) / 15.0
        # correctness spot check vs numpy
        ref = np.take_along_axis(np.asarray(tbl), np.asarray(idx), axis=axis)
        ok = np.allclose(np.asarray(o1), ref)
        print(
            f"{tag:28s} shape={str(shape):12s} M={m:5d}: "
            f"1-gather call {dt1*1e6:7.1f} us, marginal {per*1e6:7.2f} us "
            f"({lanes/max(per,1e-9)/1e9:8.2f} Gelem/s)  correct={ok}"
        )
        return per
    except Exception as e:  # noqa: BLE001
        print(f"{tag:28s} shape={shape}: FAILED {type(e).__name__}: {str(e)[:160]}")
        return None


def main():
    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}")
    print("--- mode 0: sublane gather (table replicated across 128 lanes) ---")
    for m in (8, 64, 128, 256, 512, 1024):
        run("sublane", (m, 128), axis=0)
    print("--- mode 1: lane gather (table replicated across 8 sublanes) ---")
    for m in (128, 256, 512, 1024, 2048, 4096, 8192):
        run("lane", (8, m), axis=1)
    print("--- bigger waves, fixed table (sublane mode, tall idx) ---")
    # idx taller than table is NOT expressible in one op (shapes must match) —
    # instead measure a [512,128] wave against a 512-entry table, which is the
    # natural traversal tile, at 16 components per fetch.
    run("sublane 512x128", (512, 128), axis=0)


if __name__ == "__main__":
    main()
