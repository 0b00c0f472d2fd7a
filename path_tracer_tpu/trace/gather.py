"""Row-gather strategies tuned to TPU realities.

Measured on v5e: XLA's native gather sustains only ~300M rows/s inside a
dependent computation (latency-bound scalar fetches), i.e. ~0.2 ms for a
65K-lane gather regardless of table size. For SMALL tables the same gather is
exact and far faster as a one-hot matmul on the MXU: ``onehot(idx) @ table``
touches every row but runs at matrix-unit throughput, and is bit-exact in f32
because each output sums exactly one nonzero product.

`gather_rows` picks the strategy by table height; the threshold keeps the
one-hot cost (N*M*C MACs) well under the equivalent latency-bound gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Above this many rows, one-hot MAC cost exceeds the native gather.
# Measured on v5e (2026-08-16): a 16K-lane jnp.take costs ~600 us regardless
# of table height (latency-bound scalar fetches), while the one-hot matmul
# for a [16K, M] @ [M, 16] gather runs at MXU speed (~280 us at M=32K, ~25 us
# at M=2.5K). Crossover is ~M=32K; the dense-engine scene ceiling
# (DENSE_PL_MAX_TRIS=64K) stays above it only for the rarely-hit winner
# recompute, which is still within 2x of take there.
ONE_HOT_MAX_ROWS = 32768


def gather_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of a 2-D ``[M, C]`` table by ``[N]`` indices -> ``[N, C]``.

    Small tables use the exact one-hot matmul path; large ones fall back to
    ``jnp.take``. Indices must be in range (clamp at call sites).
    """
    m = table.shape[0]
    if m <= ONE_HOT_MAX_ROWS:
        iota = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], m), 1)
        onehot = (idx[:, None] == iota).astype(table.dtype)
        return jax.lax.dot_general(
            onehot, table,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
    return jnp.take(table, idx, axis=0)


def searchsorted_small(cdf: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """``searchsorted(cdf, u, side='left')`` as a vectorized count — no
    binary-search gathers. Intended for small CDFs (light tables)."""
    return jnp.sum(cdf[None, :] < u[:, None], axis=1).astype(jnp.int32)
