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


# Above this many CDF entries the flat [N, L] compare-count costs more than
# the two-level segmented search (which replaces it with [N, L/SEG] + [N, SEG]
# compares + one row fetch). 4K keeps the flat path for every Cornell-class
# light table while mesh lights (thousands+ of emissive triangles,
# light_sampler.rs:31-37 handles these with binary search) take the
# segmented path.
SEARCH_FLAT_MAX = 4096
_SEG = 128


def searchsorted_cdf(cdf: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Scalable ``searchsorted(cdf, u, side='left')`` for light CDFs.

    Flat compare-count for small tables; for large ones a TWO-LEVEL search:
    (1) count over the per-segment maxima (a [N, L/128] compare — the segment
    holding the answer is the first whose max >= u), (2) fetch that segment's
    128 entries with one `gather_rows` and count within. Exact same result as
    the flat count for sorted ``cdf`` (the reference uses binary search,
    light_sampler.rs:31-37; a bit-walk over gathers would be latency-bound on
    TPU, while this is two dense compares + one row fetch)."""
    l = cdf.shape[0]
    if l <= SEARCH_FLAT_MAX:
        return searchsorted_small(cdf, u)
    nseg = -(-l // _SEG)
    pad = nseg * _SEG - l
    if pad:
        # pad with a huge FINITE value: padded entries never compare < u (CDF
        # probes are <= 1) and the padded segment maxima never attract a
        # search. NOT inf — `gather_rows` is a one-hot matmul and 0 * inf
        # from unselected pad rows would poison gathered columns with NaN
        # (same pitfall as bvh.NO_CHILD_BOUND).
        cdf = jnp.concatenate([cdf, jnp.full((pad,), 3.0e38, cdf.dtype)])
    segs = cdf.reshape(nseg, _SEG)
    seg_max = segs[:, -1]  # sorted => per-segment maximum
    k = jnp.sum(seg_max[None, :] < u[:, None], axis=1).astype(jnp.int32)
    k = jnp.minimum(k, nseg - 1)
    rows = gather_rows(segs, k)  # [N, SEG]
    within = jnp.sum(rows < u[:, None], axis=1).astype(jnp.int32)
    return jnp.minimum(k * _SEG + within, l - 1)
