"""Fused Pallas dense intersection — the mid-size scene engine on real TPUs.

The XLA dense engine (trace/dense.py) expresses ray x triangle-chunk testing
as [N,3]@[3,C] matmuls plus ~10 elementwise [N,C] combiners. Two problems on
v5e: a K=3 contraction uses 3/128 of the MXU's systolic depth (~2%
utilization), and XLA materializes the [N,C] temporaries through HBM, so the
whole thing runs at HBM speed (~1-3 Mrays/s on the benchmark scenes).

This engine runs the same Havel-Herout math (primitive.rs:117-144,
``intersect_naive`` precision — no pre-translation) as ONE Pallas kernel:

* the triangle plane table is a component-major ``[16, T']`` f32 array
  (n0 xyz, d0, n1 xyz, d1, n2 xyz, d2, 4 pad rows; 2 MB at 32K triangles),
* rays ride the sublane axis, triangles the lane axis: every per-pair
  quantity is a ``[B, C]`` VPU op built from ``[B,1] x [1,C]`` broadcasts —
  no MXU, no gathers, and every temporary stays on-chip,
* the chunk loop is unrolled in groups inside the kernel with a running
  per-ray (best_t, best_idx) carried in registers,
* ``t`` uses the VPU's approximate reciprocal plus one Newton step instead
  of a full-precision divide (the winner's exact t/u/v are recomputed
  outside from one row gather, like trace/dense.py's winner recompute).

MEASURED MOSAIC PITFALL (v5e, 2026-08-16): passing the table as a normal
VMEM input with a constant ``index_map`` (``lambda i: (0, 0)``) adds a FLAT
~600 us to every kernel invocation, independent of grid size or table size —
it swamps small scenes entirely (16K rays vs 128 tris: 697 us with the VMEM
input, 17 us without). The fix used here: the table is passed in ``pl.ANY``
memory space and DMA'd ONCE into a VMEM scratch buffer at grid step 0;
scratch persists across the (sequential) grid steps.

The per-pair cost is ~60 VPU ops; measured end-to-end rates (16K rays):
~250 Mrays/s at 128 tris, ~12 Mrays/s at 5.6K tris — versus 0.4-3.5 Mrays/s
for the XLA dense engine it replaces.

CPU fallback: the kernel also runs under the Pallas interpreter (tests); the
scene assembler only attaches this engine on TPU backends.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from path_tracer_tpu.core.constants import EPSILON

# Table capacity: [16, T'] f32 in VMEM scratch = T'/16 KB; 64K tris = 4 MB,
# leaving plenty for the [B, C] working set.
DENSE_PL_MAX_TRIS = 65536
BLOCK = 256  # rays per grid step (sublane axis)
UNROLL = 4  # chunk-loop unroll group (bounds Mosaic's stack frame)
_BIG_LANE = 1 << 30  # lane-index sentinel (plain int: jnp consts can't be captured)


def _chunk_width(n_tris: int) -> int:
    """Lane width of one chunk step: small scenes use one narrow chunk."""
    for w in (128, 256):
        if n_tris <= w:
            return w
    return 512


def pack_dense_pl(tri: dict) -> np.ndarray:
    """Component-major ``[16, T']`` plane table (T' padded to the chunk width).

    Rows: n0x n0y n0z d0 n1x n1y n1z d1 n2x n2y n2z d2, then 4 zero pad rows.
    Pad triangles are all-zero -> det == 0 -> never hit.
    """
    n0 = np.asarray(tri["n0"], np.float32)
    t = n0.shape[0]
    ch = _chunk_width(t)
    tp = -(-t // ch) * ch
    tab = np.zeros((16, tp), np.float32)
    tab[0:3, :t] = n0.T
    tab[3, :t] = np.asarray(tri["d0"], np.float32)
    tab[4:7, :t] = np.asarray(tri["n1"], np.float32).T
    tab[7, :t] = np.asarray(tri["d1"], np.float32)
    tab[8:11, :t] = np.asarray(tri["n2"], np.float32).T
    tab[11, :t] = np.asarray(tri["d2"], np.float32)
    return tab


def _same(a, b):
    return (a >= 0.0) == (b >= 0.0)


def _pair_terms(tab, c0, ch, ox, oy, oz, dx, dy, dz):
    """Havel-Herout per-pair quantities for triangle lanes [c0, c0+ch).

    ``tab`` is the VMEM scratch ref. Returns (det, td, ud, vd) as [B, ch].
    """
    row = lambda r: tab[r : r + 1, pl.ds(c0, ch)]  # [1, ch]
    n0x, n0y, n0z, d0 = row(0), row(1), row(2), row(3)
    det = dx * n0x + dy * n0y + dz * n0z
    td = d0 - (ox * n0x + oy * n0y + oz * n0z)

    n1x, n1y, n1z, d1 = row(4), row(5), row(6), row(7)
    ud = det * ((ox * n1x + oy * n1y + oz * n1z) + d1) + td * (dx * n1x + dy * n1y + dz * n1z)

    n2x, n2y, n2z, d2 = row(8), row(9), row(10), row(11)
    vd = det * ((ox * n2x + oy * n2y + oz * n2z) + d2) + td * (dx * n2x + dy * n2y + dz * n2z)
    return det, td, ud, vd


def _load_table_once(t_hbm, t_vmem, sem):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dma = pltpu.make_async_copy(t_hbm, t_vmem, sem)
        dma.start()
        dma.wait()


def _ray_cols(rays_ref):
    return tuple(rays_ref[:, k : k + 1] for k in range(7))  # ox..dz, tlim


def _closest_kernel(rays_ref, t_hbm, out_ref, t_vmem, sem, *, chunks, ch):
    _load_table_once(t_hbm, t_vmem, sem)
    ox, oy, oz, dx, dy, dz, tlim = _ray_cols(rays_ref)
    b = ox.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, ch), 1)
    eps = jnp.float32(EPSILON)

    def step(c0, carry):
        best_t, best_i = carry
        det, td, ud, vd = _pair_terms(t_vmem, c0, ch, ox, oy, oz, dx, dy, dz)
        c2 = _same(ud, det - ud)
        c3 = _same(vd, det - ud - vd)
        safe = jnp.where(det == 0.0, 1.0, det)
        r_ = pl.reciprocal(safe, approx=True)
        r_ = r_ * (2.0 - safe * r_)  # one Newton step: ~1 ulp of f32
        t = td * r_
        ok = c2 & c3 & (det != 0.0) & (t > eps) & (t < tlim)
        tm = jnp.where(ok, t, jnp.inf)
        t_c = jnp.min(tm, axis=1, keepdims=True)  # [B, 1]
        i_c = jnp.min(jnp.where(tm == t_c, lane, _BIG_LANE), axis=1, keepdims=True)
        upd = t_c < best_t
        best_i = jnp.where(upd, (i_c + c0).astype(jnp.float32), best_i)
        best_t = jnp.where(upd, t_c, best_t)
        return best_t, best_i

    carry = (
        jnp.full((b, 1), jnp.inf, jnp.float32),
        jnp.full((b, 1), -1.0, jnp.float32),
    )
    # head chunks unrolled, tail in a fori_loop over UNROLL-groups (bounds
    # the kernel's VMEM stack frame: a full unroll OOMs scoped vmem at 32K+)
    head = chunks % UNROLL if chunks > UNROLL else chunks
    for c in range(head):
        carry = step(c * ch, carry)
    ngroups = (chunks - head) // UNROLL
    if ngroups:
        def gbody(g, s):
            base = head * ch + g * (UNROLL * ch)
            for k in range(UNROLL):
                s = step(base + k * ch, s)
            return s

        carry = jax.lax.fori_loop(0, ngroups, gbody, carry)

    best_t, best_i = carry
    out_ref[:, 0:1] = best_t
    out_ref[:, 1:2] = best_i
    out_ref[:, 2:8] = jnp.zeros((b, 6), jnp.float32)


def _any_kernel(rays_ref, t_hbm, out_ref, t_vmem, sem, *, chunks, ch):
    """Shadow test: division-free via the sign-consistent t-window check
    (sweep.py's c1 with t_est = 0): hit iff
    sign(td - det*eps) == sign(det*tlim - td)."""
    _load_table_once(t_hbm, t_vmem, sem)
    ox, oy, oz, dx, dy, dz, tlim = _ray_cols(rays_ref)
    b = ox.shape[0]
    eps = jnp.float32(EPSILON)

    def step(c0, found):
        det, td, ud, vd = _pair_terms(t_vmem, c0, ch, ox, oy, oz, dx, dy, dz)
        c1 = _same(td - det * eps, det * tlim - td)
        c2 = _same(ud, det - ud)
        c3 = _same(vd, det - ud - vd)
        ok = c1 & c2 & c3 & (det != 0.0)
        return jnp.maximum(found, jnp.max(ok.astype(jnp.float32), axis=1, keepdims=True))

    found = jnp.zeros((b, 1), jnp.float32)
    head = chunks % UNROLL if chunks > UNROLL else chunks
    for c in range(head):
        found = step(c * ch, found)
    ngroups = (chunks - head) // UNROLL
    if ngroups:
        def gbody(g, s):
            base = head * ch + g * (UNROLL * ch)
            for k in range(UNROLL):
                s = step(base + k * ch, s)
            return s

        found = jax.lax.fori_loop(0, ngroups, gbody, found)

    out_ref[:, 0:1] = found
    out_ref[:, 1:8] = jnp.zeros((b, 7), jnp.float32)


def _pack_rays(origin, direction, t_limit, block):
    """[N,3]x2 + [N] -> [N', 8] ray rows padded to a BLOCK multiple.

    Pad rays have zero direction (det==0 everywhere -> no hits)."""
    n = origin.shape[0]
    pad = (-n) % block
    rays = jnp.concatenate(
        [origin, direction, t_limit[:, None], jnp.zeros((n, 1), jnp.float32)],
        axis=1,
    )
    if pad:
        rays = jnp.concatenate([rays, jnp.zeros((pad, 8), jnp.float32)], axis=0)
    return rays, n


@functools.partial(jax.jit, static_argnames=("any_mode", "interpret"))
def _dense_pl_call(tab, origin, direction, t_limit, any_mode: bool, interpret: bool):
    rays, n = _pack_rays(origin, direction, t_limit, BLOCK)
    np_total = rays.shape[0]
    t_total = tab.shape[1]
    ch = min(t_total, 512)
    chunks = t_total // ch
    kernel = _any_kernel if any_mode else _closest_kernel

    out = pl.pallas_call(
        functools.partial(kernel, chunks=chunks, ch=ch),
        out_shape=jax.ShapeDtypeStruct((np_total, 8), jnp.float32),
        grid=(np_total // BLOCK,),
        in_specs=[
            pl.BlockSpec((BLOCK, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((BLOCK, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(tab.shape, jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(rays, tab)
    return out[:n]


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def dense_pl_closest_hit(dense_pl: dict, origin, direction, t_limit):
    """Same contract as `traversal.closest_hit`: (tri_idx, t, u, v)."""
    out = _dense_pl_call(
        dense_pl["tab"], origin, direction, t_limit,
        any_mode=False, interpret=_interpret_default(),
    )
    t_kern = out[:, 0]
    best = out[:, 1].astype(jnp.int32)
    hit = jnp.isfinite(t_kern)
    best = jnp.where(hit, best, -1)

    # Winner t/u/v via one gathered exact Havel-Herout evaluation
    # (trace/dense.py's winner-recompute; also replaces the kernel's
    # Newton-refined t with the exact-division t).
    from path_tracer_tpu.trace.traversal import _tri_intersect

    _, t, u, v = _tri_intersect(
        dense_pl["tri_rows"], jnp.maximum(best, 0), origin, direction,
        jnp.float32(EPSILON), jnp.where(hit, t_kern + 1.0, 1.0),
    )
    t_max = jnp.where(hit, t, t_limit)
    u = jnp.where(hit, u, 0.0)
    v = jnp.where(hit, v, 0.0)
    return best, t_max, u, v


def dense_pl_any_hit(dense_pl: dict, origin, direction, t_limit):
    out = _dense_pl_call(
        dense_pl["tab"], origin, direction, t_limit,
        any_mode=True, interpret=_interpret_default(),
    )
    return out[:, 0] > 0.0
