"""Experiment: Pallas DMA row-gather vs XLA gather (round-2 groundwork).

The large-scene stack traversal is capped by XLA's latency-bound gather
(~300M rows/s measured in a dependent loop). This probe measures a Pallas
kernel that gathers N rows of an HBM-resident ``[M, 16]`` f32 table with
per-row async copies, double-buffered in VMEM. If manual DMA pipelining beats
the XLA gather meaningfully, the round-2 plan is to move the whole stack
traversal step (pop + node fetch + slab + push) into a Pallas kernel.

Run on TPU: ``python benches/pallas_gather_probe.py``

MEASURED RESULT (v5e, 2026-08-16): per-row DMA pipelining does NOT beat XLA:
~8M rows/s (Pallas, BUFS=8) vs ~10M rows/s (jnp.take) at 128-float rows —
the scalar fori_loop issuing one DMA per row is issue-rate-bound
(~120ns/row). Conclusion for round 2: a Pallas traversal kernel must fetch
in bulk (multi-row descriptors, sublane-grouped requests, or sorting lanes by
node id to coalesce), or keep avoiding random access altogether like the
stream-sweep engine does.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_W = 128  # Mosaic slices must be 128-lane aligned; 512B DMAs
BUFS = 8  # DMA pipeline depth


def pallas_gather(table, idx):
    """Gather ``table[idx]`` rows via a DMA pipeline inside one kernel."""
    n = idx.shape[0]

    def kernel(idx_ref, table_ref, out_ref):
        def body(scratch, sems):
            def get_dma(slot, i):
                return pltpu.make_async_copy(
                    table_ref.at[idx_ref[i]],
                    scratch.at[slot],
                    sems.at[slot],
                )

            for k in range(BUFS):
                get_dma(k, k).start()

            def loop(i, _):
                slot = jax.lax.rem(i, BUFS)
                get_dma(slot, i).wait()
                out_ref[i, :] = scratch[slot]

                @pl.when(i + BUFS < n)
                def _():
                    get_dma(slot, i + BUFS).start()

                return 0

            jax.lax.fori_loop(0, n, loop, 0)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((BUFS, ROW_W), jnp.float32),
            sems=pltpu.SemaphoreType.DMA((BUFS,)),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, ROW_W), jnp.float32),
        grid_spec=grid_spec,
    )(idx, table)


def main():
    key = jax.random.PRNGKey(0)
    m = 65536
    n = 16384  # rows are 128 floats: pack multiple BVH nodes per row in practice
    table = jax.random.normal(key, (m, ROW_W), jnp.float32)
    idx = jax.random.randint(key, (n,), 0, m, jnp.int32)

    out = pallas_gather(table, idx)
    ref = jnp.take(table, idx, axis=0)
    err = float(jnp.abs(out - ref).max())
    print(f"correctness max err: {err}")

    @jax.jit
    def chain_pallas(idx):
        def body(i, c):
            rows = pallas_gather(table, c)
            return (c + rows[:, 0].astype(jnp.int32) + 1) % m

        return jax.lax.fori_loop(0, 20, body, idx)

    @jax.jit
    def chain_take(idx):
        def body(i, c):
            rows = jnp.take(table, c, axis=0)
            return (c + rows[:, 0].astype(jnp.int32) + 1) % m

        return jax.lax.fori_loop(0, 20, body, idx)

    for name, fn in [("pallas", chain_pallas), ("xla take", chain_take)]:
        r = fn(idx)
        r.block_until_ready()
        t0 = time.perf_counter()
        r = fn(idx)
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / 20
        print(f"{name}: {dt*1e6:.0f} us per {n}-row gather -> {n/dt/1e6:.0f}M rows/s")


if __name__ == "__main__":
    main()
