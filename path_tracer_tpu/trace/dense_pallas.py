"""Fused Pallas dense intersection — the mid-size scene engine on real TPUs.

The XLA dense engine (trace/dense.py) expresses ray x triangle-chunk testing
as [N,3]@[3,C] matmuls plus ~10 elementwise [N,C] combiners; XLA materializes
the [N,C] temporaries through HBM, so it runs at HBM speed (~1-3 Mrays/s on
the benchmark scenes). This engine runs the same Havel-Herout math
(primitive.rs:117-144, ``intersect_naive`` precision — no pre-translation) as
ONE Pallas kernel with everything VMEM-resident.

MXU + VPU SPLIT (the round-1 profiling lesson, measured on v5e): a pure-VPU
formulation costs ~56 ops/pair (3.2 ms for 16K rays x 5.6K tris). But the six
per-pair dot families — det = d.n0, td = d0 - o.n0, o.n1 + d1, d.n1,
o.n2 + d2, d.n2 — are outer products of an 8-vector per ray with an 8-vector
per triangle: ONE f32 ``[B, 8] @ [8, 6*ch]`` matmul per chunk computes all
six on the MXU (~free: 8/128 systolic depth but microseconds total), leaving
~15 VPU ops/pair for the combine (ud/vd FMAs, sign tests, reciprocal, min).
Matmuls use ``Precision.HIGHEST`` (bf16x3 ~ exact f32).

Kernel layout: rays ride the sublane axis, triangles the lane axis. The
weight table W ``[8, chunks*6*ch]`` is chunk-interleaved (chunk c occupies
columns [c*6*ch, (c+1)*6*ch) as six ch-wide blocks det|td|q1|r1|q2|r2), so a
chunk step is one contiguous slice. Ray 8-vector: (dx dy dz ox oy oz 1 tlim);
weight columns: det=(n0,0,0,0,0), td=(0,0,0,-n0, d0, 0), q1=(0,0,0,n1, d1, 0),
r1=(n1,0,0,0,0), q2/r2 likewise with n2/d2 — the +d constant folds into the
matmul via the ray's constant-1 slot.

SHADING EPILOGUE: with the winner's global index known, a second pass over
the chunks accumulates ``onehot(idx) @ aux_chunk`` on the MXU, fetching the
winner's plane rows, vertex normals and model id without materializing a
[N, T] one-hot through HBM (the XLA-side equivalents measured ~2x the whole
kernel). Exact t/u/v come from one full-precision divide on the fetched
plane rows in the same expression order as ``traversal._tri_intersect``.
The one-hot fetch is EXACT in f32: each output sums exactly one product and
bf16x3 decomposition reproduces f32 values exactly (verified vs interpreter).

MEASURED MOSAIC PITFALLS (v5e, 2026-08-16):
* a VMEM input with a constant ``index_map`` adds a FLAT ~600 us per call —
  tables travel in ``pl.ANY`` and are DMA'd once into VMEM scratch at grid
  step 0 (scratch persists across sequential grid steps),
* ``i1`` (bool) vectors cannot be ``scf.for`` loop carries — carry f32,
* big ``[B, ch]`` fori_loop carries are slower than per-chunk cross-lane
  reduces with ``[B, 1]`` carries,
* ``tpu.iota`` only exists for integers — iota f32 via int iota + astype.

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

# Per-table capacity. VMEM budget at 16K tris: W [8, 6*T'] = 3 MB + aux
# [T', 24] = 1.5 MB + the [B, 6*ch] matmul tile (3 MB) and [B, ch] working
# set — comfortably inside v5e's 16 MB scoped VMEM. (32K in ONE table was
# measured to overflow the scoped-vmem stack by ~150-360 KB even at
# B=128/unroll=1; bigger scenes instead SPLIT into chained <=16K sub-tables,
# see `pack_dense_pl_parts` — parts follow SAH order, so they are spatial
# clusters and block culling prunes whole parts.)
DENSE_PL_MAX_TRIS = 16384
# Split engine capacity: parts of <=16K tris chained with shrinking t
# windows. O(T) brute force degrades linearly, but stays ~4x the gather
# stack engine even at 128K (measured 81K: parts 0.12 vs stack 0.03 Mrays/s).
DENSE_PL_SPLIT_MAX_TRIS = 131072
BLOCK = 256  # rays per grid step (sublane axis)
UNROLL = 4  # chunk-loop unroll group (bounds Mosaic's stack frame)
_BIG = 1e30  # "no winner" sentinel for the final argmin (python float)
AUX_COLS = 24  # n0(3) d0 n1(3) d1 n2(3) d2 | na nb nc (9) | model | pad(2)
# Matmul precision for in-kernel dots. HIGHEST is REQUIRED for correctness,
# not an accuracy nicety (measured on v5e, 2026-08-17): the o-dependent dot
# families (td = d0 - o.n0, q1/q2) cancel catastrophically — terms are
# O(|o|*|n|) ~ 1e3-1e5 collapsing to O(plane distance) — and DEFAULT's
# truncated bf16 passes leave relative errors ~1e-4 on them. Against an f64
# oracle on an 81K-tri mesh, DEFAULT picked the WRONG winning triangle for
# 81% of camera rays (median t relerr 6e-4); renders leaked light through
# geometry (cornell_specular measured 14x too bright). HIGHEST (bf16x6)
# restores f32-faithful dots: 100% oracle winner agreement, t relerr ~6e-8,
# and the dense-engine image agrees with the independent stream/stack
# engines. (The earlier "DEFAULT is f32-faithful" note here generalized
# wrongly from the one-hot epilogue fetch, whose single-product sums are
# exact in ANY precision.)
_HI = jax.lax.Precision.HIGHEST
# Search-term evaluator: VPU componentwise (exact f32 FMA) vs HIGHEST MXU
# matmul (bf16x6, f32-faithful). Both pass the f64 oracle; pick by speed.
USE_VPU_TERMS = True


def _chunk_width(n_tris: int) -> int:
    """Lane width of one chunk step: small scenes use one narrow chunk."""
    for w in (128, 256):
        if n_tris <= w:
            return w
    return 512


def _padded(t: int) -> tuple[int, int]:
    ch = _chunk_width(t)
    return -(-t // ch) * ch, ch


def pack_dense_pl(tri: dict) -> np.ndarray:
    """Chunk-interleaved MXU weight table ``[8, chunks*6*ch]``.

    Chunk c, quantity q (det td q1 r1 q2 r2), triangle lane j:
    column ``c*6*ch + q*ch + j``. Weight rows pair with the kernel's ray
    vector (dx dy dz ox oy oz 1 tlim); row 7 is always 0 so the tlim slot
    never contributes. Pad triangles are all-zero -> det == 0 -> never hit.
    """
    n0 = np.asarray(tri["n0"], np.float32)
    n1 = np.asarray(tri["n1"], np.float32)
    n2 = np.asarray(tri["n2"], np.float32)
    d0 = np.asarray(tri["d0"], np.float32)
    d1 = np.asarray(tri["d1"], np.float32)
    d2 = np.asarray(tri["d2"], np.float32)
    t = n0.shape[0]
    tp, ch = _padded(t)
    chunks = tp // ch

    cols = np.zeros((8, 6, tp), np.float32)  # [row, quantity, tri]
    cols[0:3, 0, :t] = n0.T  # det = d . n0
    cols[3:6, 1, :t] = -n0.T  # td = d0 - o . n0
    cols[6, 1, :t] = d0
    cols[3:6, 2, :t] = n1.T  # q1 = o . n1 + d1
    cols[6, 2, :t] = d1
    cols[0:3, 3, :t] = n1.T  # r1 = d . n1
    cols[3:6, 4, :t] = n2.T  # q2 = o . n2 + d2
    cols[6, 4, :t] = d2
    cols[0:3, 5, :t] = n2.T  # r2 = d . n2
    # interleave at chunk granularity: [8, chunks, 6, ch]
    w = cols.reshape(8, 6, chunks, ch).transpose(0, 2, 1, 3).reshape(8, chunks * 6 * ch)
    return np.ascontiguousarray(w)


def pack_dense_pl_aux(tri: dict, normals_flat=None, model=None) -> np.ndarray:
    """Row-major ``[T', 24]`` epilogue table: plane data (12) + the three
    vertex shading normals (9) + model id (1, exact float value) + pad (2).

    ``normals_flat``: [T, 9]; ``model``: [T] ints. Either may be None (zeros)
    for geometry-only uses (tests, light tables).
    """
    n0 = np.asarray(tri["n0"], np.float32)
    t = n0.shape[0]
    tp, _ = _padded(t)
    aux = np.zeros((tp, AUX_COLS), np.float32)
    aux[:t, 0:3] = n0
    aux[:t, 3] = np.asarray(tri["d0"], np.float32)
    aux[:t, 4:7] = np.asarray(tri["n1"], np.float32)
    aux[:t, 7] = np.asarray(tri["d1"], np.float32)
    aux[:t, 8:11] = np.asarray(tri["n2"], np.float32)
    aux[:t, 11] = np.asarray(tri["d2"], np.float32)
    if normals_flat is not None:
        aux[:t, 12:21] = np.asarray(normals_flat, np.float32)
    if model is not None:
        aux[:t, 21] = np.asarray(model, np.float32)
    return aux


def pack_dense_pl_cab(positions: np.ndarray) -> np.ndarray:
    """Chunk AABBs ``[chunks, 6]`` (min xyz, max xyz) for block-level chunk
    culling. Triangles arrive in SAH-BVH DFS leaf order (scene.py applies the
    builder's permutation), so consecutive ``ch``-triangle chunks are spatial
    clusters and their boxes are tight. Empty pad chunks get an inverted box
    (min=+BIG, max=-BIG) that never passes the overlap test."""
    pos = np.asarray(positions, np.float32)  # [T, 3(vertex), 3(xyz)]
    t = pos.shape[0]
    tp, ch = _padded(t)
    chunks = tp // ch
    cab = np.empty((chunks, 6), np.float32)
    cab[:, 0:3] = _BIG
    cab[:, 3:6] = -_BIG
    # The visit test's f32 interval divisions round differently from the
    # kernel's matmul-derived t, so a hit EXACTLY on a chunk face can land
    # ~ulps outside the computed window. Pad boxes by a scene-relative slack
    # (>> accumulated rounding, << chunk size) so knife-edge hits never cull.
    pad = 1e-4 * float(np.abs(pos).max(initial=1.0)) + 1e-6
    for c in range(chunks):
        seg = pos[c * ch : min((c + 1) * ch, t)]
        if seg.size:
            cab[c, 0:3] = seg.min(axis=(0, 1)) - pad
            cab[c, 3:6] = seg.max(axis=(0, 1)) + pad
    return cab


def _block_intervals(rays: jnp.ndarray, cab: jnp.ndarray, block: int = BLOCK):
    """Conservative per-(block, chunk) entry window ``(t_lo [nb, C] f32,
    vis [nb, C] bool)`` over the chunk AABBs.

    Conservative interval slab test: for ray-block bounds (origins in
    [olo,ohi], directions in [dlo,dhi], t in [0, tmax]) and chunk box
    [blo,bhi], axis k admits t in the OUTER bound of
    {(b - o)/d : b in slab, o in o-interval, d in d-interval}; a chunk is
    visited iff the three axis windows and [0, tmax] all overlap. Any real
    hit's t lies inside every axis window, so culling never drops a hit.
    Direction intervals containing 0 make that axis unbounded (no cull from
    it) — this also neutralizes all-pad blocks (d = 0).

    Exactness caveat (measured): the padded boxes + tmax slack absorb normal
    f32 rounding, so culled and unculled renders are bit-identical — except
    ~1 in 10^4-10^5 pixels where the kernel's Newton-t/MXU rounding accepts a
    near-degenerate (tiny-det) intersection whose EXACT t lies outside the
    window; culling excludes it. The culled answer is the geometrically
    faithful one; the discrepancy is far below Monte-Carlo noise."""
    nb = rays.shape[0] // block
    blk = rays.reshape(nb, block, 8)
    d, o, tl = blk[:, :, 0:3], blk[:, :, 3:6], blk[:, :, 7]
    # Rays that cannot hit anything must not poison the block bounds: the
    # integrator's dead/regen lanes carry t_limit = 0 and occasionally NaN
    # origins/directions (NaN -> det comparisons all false in the kernel, so
    # they are harmless there, but one NaN here would collapse lo<=hi to
    # false and wrongly cull the whole block).
    valid = (
        (tl > 0.0)
        & jnp.isfinite(o).all(axis=-1)
        & jnp.isfinite(d).all(axis=-1)
    )[:, :, None]
    big = jnp.float32(_BIG)
    olo = jnp.where(valid, o, big).min(axis=1)  # [nb, 3]
    ohi = jnp.where(valid, o, -big).max(axis=1)
    dlo = jnp.where(valid, d, big).min(axis=1)
    dhi = jnp.where(valid, d, -big).max(axis=1)
    tmax = jnp.where(valid[:, :, 0], tl, 0.0).max(axis=1)  # [nb]

    blo, bhi = cab[:, 0:3], cab[:, 3:6]  # [chunks, 3]
    # numerator interval per (block, chunk, axis)
    nlo = blo[None, :, :] - ohi[:, None, :]
    nhi = bhi[None, :, :] - olo[:, None, :]
    dl = dlo[:, None, :]
    dh = dhi[:, None, :]
    crosses = (dl <= 0.0) & (dh >= 0.0)
    safe_l = jnp.where(dl == 0.0, 1.0, dl)
    safe_h = jnp.where(dh == 0.0, 1.0, dh)
    cands = jnp.stack(
        [nlo / safe_l, nlo / safe_h, nhi / safe_l, nhi / safe_h], axis=0
    )
    t_lo = jnp.where(crosses, -_BIG, jnp.min(cands, axis=0))
    t_hi = jnp.where(crosses, _BIG, jnp.max(cands, axis=0))
    lo = jnp.maximum(t_lo.max(axis=-1), 0.0)  # [nb, chunks]
    # kernel rounding (Newton t, matmul dots) can accept hits ~ulps beyond
    # the exact t window; slacken tmax to match the padded boxes
    hi = jnp.minimum(t_hi.min(axis=-1), tmax[:, None] * 1.00002 + 1e-5)
    vis = (lo <= hi) & valid.any(axis=1)  # all-dead blocks visit nothing
    return lo, vis


def _block_bounds(rays8):
    """In-kernel per-block ray interval bounds for the chunk-window culling.

    Returns 13 scalars: olo/ohi/dlo/dhi per axis + tmax. Invalid lanes
    (t_limit <= 0 dead/pad lanes, non-finite origins/directions) are masked
    out of every reduction — one NaN lane would otherwise collapse the
    interval test and cull live lanes' chunks (round-1 lesson,
    RESULTS_r1 platform finding 8)."""
    d, o, tl = rays8[:, 0:3], rays8[:, 3:6], rays8[:, 7:8]
    finite = jnp.isfinite(o).all(axis=1, keepdims=True) & jnp.isfinite(d).all(
        axis=1, keepdims=True
    )
    valid = (tl > 0.0) & finite
    # ONE cross-sublane reduce for all 13 bounds (cross-sublane reduces cost
    # ~1 us each on v5e; 13 separate ones were a measurable per-block floor):
    # max of [B, 13] columns (-o | o | -d | d | tl) gives
    # (-olo, ohi, -dlo, dhi, tmax); scalars come out as cheap lane extracts.
    stack = jnp.concatenate([-o, o, -d, d, tl], axis=1)  # [B, 13]
    m = jnp.max(jnp.where(valid, stack, -_BIG), axis=0)  # [13]
    olo = [-m[k] for k in range(3)]
    ohi = [m[3 + k] for k in range(3)]
    dlo = [-m[6 + k] for k in range(3)]
    dhi = [m[9 + k] for k in range(3)]
    tmax0 = jnp.maximum(m[12], 0.0)
    return olo, ohi, dlo, dhi, tmax0


def _chunk_gate(cab_ref, c, bb, tmax):
    """Scalar conservative entry test of chunk ``c`` against the block's ray
    interval bounds (the math of `_block_intervals`, per chunk, on SMEM
    scalars). Returns (visit: bool scalar, dead-cheap — ~30 scalar ops).

    ``tmax`` is the block's DYNAMIC t upper bound (max over lanes of
    min(best_t, t_limit)), so the shrinking closest-hit window turns into
    skipped chunks — the packet-tracing t-window cut. Round-1 culled against
    the static initial t_limit only, and burned 1.5-2.2 ms/call on an XLA
    prologue; per-chunk scalar gates inside the kernel cost ~nothing."""
    olo, ohi, dlo, dhi, _ = bb
    t_lo = jnp.float32(0.0)
    t_hi = tmax * 1.00002 + 1e-5  # kernel-rounding slack (see _block_intervals)
    for k in range(3):
        nlo = cab_ref[c, k] - ohi[k]
        nhi = cab_ref[c, 3 + k] - olo[k]
        dl, dh = dlo[k], dhi[k]
        crosses = (dl <= 0.0) & (dh >= 0.0)
        sl = jnp.where(dl == 0.0, 1.0, dl)
        sh = jnp.where(dh == 0.0, 1.0, dh)
        c0, c1, c2, c3 = nlo / sl, nlo / sh, nhi / sl, nhi / sh
        lo_k = jnp.minimum(jnp.minimum(c0, c1), jnp.minimum(c2, c3))
        hi_k = jnp.maximum(jnp.maximum(c0, c1), jnp.maximum(c2, c3))
        t_lo = jnp.maximum(t_lo, jnp.where(crosses, -_BIG, lo_k))
        t_hi = jnp.minimum(t_hi, jnp.where(crosses, _BIG, hi_k))
    return t_lo <= t_hi


def _same(a, b):
    return (a >= 0.0) == (b >= 0.0)


def _chunk_terms_vpu(w_vmem, rays8, c, ch):
    """Exact-f32 componentwise dot families on the VPU (FMA, no bf16
    decomposition) — an alternative to the HIGHEST matmul with identical
    precision class (true f32). Reads component rows out of the SAME W
    layout: n0 = det-family rows 0..2, d0 = td-family row 6, n1 = r1-family
    rows 0..2, d1 = q1-family row 6, n2/d2 likewise. ``c`` may be a traced
    chunk id (the ordered-visit walk) — slices stay lane-aligned because
    every offset is a multiple of ``ch`` >= 128."""
    c0 = c * (6 * ch)
    if not isinstance(c, int):
        c0 = pl.multiple_of(c0, 128)
    row = lambda r, q: w_vmem[r : r + 1, pl.ds(c0 + q * ch, ch)]  # [1, ch]
    dx, dy, dz = rays8[:, 0:1], rays8[:, 1:2], rays8[:, 2:3]
    ox, oy, oz = rays8[:, 3:4], rays8[:, 4:5], rays8[:, 5:6]
    n0x, n0y, n0z = row(0, 0), row(1, 0), row(2, 0)
    d0 = row(6, 1)
    det = dx * n0x + dy * n0y + dz * n0z
    td = d0 - (ox * n0x + oy * n0y + oz * n0z)
    n1x, n1y, n1z, d1 = row(0, 3), row(1, 3), row(2, 3), row(6, 2)
    ud = det * ((ox * n1x + oy * n1y + oz * n1z) + d1) + td * (dx * n1x + dy * n1y + dz * n1z)
    n2x, n2y, n2z, d2 = row(0, 5), row(1, 5), row(2, 5), row(6, 4)
    vd = det * ((ox * n2x + oy * n2y + oz * n2z) + d2) + td * (dx * n2x + dy * n2y + dz * n2z)
    return det, td, ud, vd


def _chunk_terms(w_vmem, rays8, c, ch):
    """All six per-pair dot families for chunk ``c`` in one MXU matmul,
    then two FMA families on the VPU. Returns (det, td, ud, vd) as [B, ch]."""
    c0 = c * (6 * ch)
    if not isinstance(c, int):
        c0 = pl.multiple_of(c0, 128)
    six = jax.lax.dot_general(
        rays8, w_vmem[:, pl.ds(c0, 6 * ch)],
        (((1,), (0,)), ((), ())),
        precision=_HI, preferred_element_type=jnp.float32,
    )  # [B, 6*ch]
    det = six[:, 0 * ch : 1 * ch]
    td = six[:, 1 * ch : 2 * ch]
    q1 = six[:, 2 * ch : 3 * ch]
    r1 = six[:, 3 * ch : 4 * ch]
    q2 = six[:, 4 * ch : 5 * ch]
    r2 = six[:, 5 * ch : 6 * ch]
    ud = det * q1 + td * r1
    vd = det * q2 + td * r2
    return det, td, ud, vd


def _load_once(pairs):
    """DMA (hbm_ref, vmem_ref, sem) triples once at grid step 0."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        for hbm, vmem, sem in pairs:
            dma = pltpu.make_async_copy(hbm, vmem, sem)
            dma.start()
            dma.wait()


def _chunk_sweep(chunks, step, carry, unroll=UNROLL):
    """Run ``step(c_index, carry)`` over all chunks: head unrolled, tail in a
    fori_loop over ``unroll``-groups (bounds the kernel's VMEM stack frame —
    big tables drop to unroll=1 or the scoped-vmem stack overflows). Used by
    the shading epilogue; the search loops are per-block ordered while loops
    (`_visit_plan`)."""
    head = chunks % unroll if chunks > unroll else chunks
    for c in range(head):
        carry = step(c, carry)
    ngroups = (chunks - head) // unroll
    if ngroups:

        def gbody(g, s):
            for k in range(unroll):
                s = step(head + g * unroll + k, s)
            return s

        carry = jax.lax.fori_loop(0, ngroups, gbody, carry)
    return carry


def _closest_kernel(rays_ref, cab_ref, w_hbm, a_hbm, out_ref, w_vmem, a_vmem,
                    sem, sem2, *, chunks, ch, cull, unroll=UNROLL):
    _load_once([(w_hbm, w_vmem, sem), (a_hbm, a_vmem, sem2)])
    rays8 = rays_ref[...]  # [B, 8] = dx dy dz ox oy oz 1 tlim
    tlim = rays_ref[:, 7:8]
    b = rays8.shape[0]
    eps = jnp.float32(EPSILON)

    # --- search: chunk sweep with per-chunk SCALAR gates (conservative entry
    # window vs the block's DYNAMIC t upper bound — max over lanes of
    # min(best_t, t_limit)). The shrinking closest-hit window turns into
    # skipped chunks via real control flow. Per-chunk cross-lane
    # (min t, argmin lane) reduces with small [B,1] carries (an elementwise
    # [B,ch] best-per-column carry was measured SLOWER on v5e).
    lane_f = jax.lax.broadcasted_iota(jnp.int32, (b, ch), 1).astype(jnp.float32)
    terms = _chunk_terms_vpu if USE_VPU_TERMS else _chunk_terms
    bb = _block_bounds(rays8) if cull else None

    def test(c, carry):
        best_t, best_gl, tmax = carry
        det, td, ud, vd = terms(w_vmem, rays8, c, ch)
        c2 = _same(ud, det - ud)
        c3 = _same(vd, det - ud - vd)
        safe = jnp.where(det == 0.0, 1.0, det)
        r_ = pl.reciprocal(safe, approx=True)
        r_ = r_ * (2.0 - safe * r_)  # one Newton step: ~1 ulp of f32
        t = td * r_
        ok = c2 & c3 & (det != 0.0) & (t > eps) & (t < tlim)
        tm = jnp.where(ok, t, _BIG)
        t_c = jnp.min(tm, axis=1, keepdims=True)  # [B, 1]
        l_c = jnp.min(jnp.where(tm == t_c, lane_f, _BIG), axis=1, keepdims=True)
        upd = t_c < best_t  # strict: earlier chunk wins ties (DFS order)
        cf = jnp.float32(c * ch) if isinstance(c, int) else (c * ch).astype(jnp.float32)
        best_gl = jnp.where(upd, l_c + cf, best_gl)
        best_t = jnp.where(upd, t_c, best_t)
        tmax = jnp.max(jnp.minimum(best_t, tlim))
        return best_t, best_gl, tmax

    def step(c, carry):
        if not cull:
            return test(c, carry)
        gate = _chunk_gate(cab_ref, c, bb, carry[2])
        return jax.lax.cond(gate, lambda cr: test(c, cr), lambda cr: cr, carry)

    carry0 = (
        jnp.full((b, 1), _BIG, jnp.float32),
        jnp.full((b, 1), -1.0, jnp.float32),
        bb[4] if cull else jnp.max(tlim),
    )
    best_t, gl_win, _ = _chunk_sweep(chunks, step, carry0, unroll)
    gl_win = jnp.where(best_t < _BIG, gl_win, -1.0)

    # --- epilogue: fetch the winner's aux row with chunked one-hot MXU dots
    # (VMEM-resident; nothing travels through HBM). Gated to the block's
    # winner index RANGE via two scalar reduces: winners cluster spatially,
    # so typically 1-3 chunks run instead of every visited chunk. ---
    win_min = jnp.min(jnp.where(gl_win >= 0.0, gl_win, jnp.float32(_BIG)))
    win_max = jnp.max(gl_win)  # -1 if the block has no winner at all

    def fetch(c, acc):
        c0 = c * ch
        lanes = jax.lax.broadcasted_iota(jnp.int32, (b, ch), 1).astype(jnp.float32) + jnp.float32(c0)
        oh = (lanes == gl_win).astype(jnp.float32)  # [B, ch]
        chunk = a_vmem[pl.ds(c0, ch), :]  # [ch, 24]
        # HIGHEST is required even here: despite each output summing exactly
        # one product, DEFAULT lowers to a single bf16 pass that truncates
        # the fetched table VALUES to ~8 mantissa bits (measured t relerr
        # 4e-4 vs 6e-8; the one-hot side is exact, the data side is not)
        return acc + jax.lax.dot_general(
            oh, chunk, (((1,), (0,)), ((), ())),
            precision=_HI, preferred_element_type=jnp.float32,
        )

    def gated_fetch(c, acc):
        c0f = jnp.float32(c * ch) if isinstance(c, int) else (c * ch).astype(jnp.float32)
        need = (win_max >= c0f) & (win_min < c0f + jnp.float32(ch))
        return jax.lax.cond(need, lambda a: fetch(c, a), lambda a: a, acc)

    row = _chunk_sweep(chunks, gated_fetch, jnp.zeros((b, AUX_COLS), jnp.float32), unroll=unroll)

    # Exact winner t/u/v — same expression order as traversal._tri_intersect.
    ox, oy, oz = rays_ref[:, 3:4], rays_ref[:, 4:5], rays_ref[:, 5:6]
    dx, dy, dz = rays_ref[:, 0:1], rays_ref[:, 1:2], rays_ref[:, 2:3]
    col = lambda k: row[:, k : k + 1]
    det = col(0) * dx + col(1) * dy + col(2) * dz
    td = col(3) - (col(0) * ox + col(1) * oy + col(2) * oz)
    px = det * ox + td * dx
    py = det * oy + td * dy
    pz = det * oz + td * dz
    ud = col(4) * px + col(5) * py + col(6) * pz + det * col(7)
    vd = col(8) * px + col(9) * py + col(10) * pz + det * col(11)
    inv = 1.0 / jnp.where(det == 0.0, 1.0, det)
    t = td * inv
    u = ud * inv
    v = vd * inv

    # Barycentric shading normal (unnormalized; primitive.rs:57-63)
    w = 1.0 - u - v
    nx = w * col(12) + u * col(15) + v * col(18)
    ny = w * col(13) + u * col(16) + v * col(19)
    nz = w * col(14) + u * col(17) + v * col(20)

    out_ref[:, 0:1] = t
    out_ref[:, 1:2] = gl_win
    out_ref[:, 2:3] = u
    out_ref[:, 3:4] = v
    out_ref[:, 4:5] = nx
    out_ref[:, 5:6] = ny
    out_ref[:, 6:7] = nz
    out_ref[:, 7:8] = col(21)  # model id


def _any_kernel(rays_ref, cab_ref, w_hbm, out_ref, w_vmem, sem, *, chunks, ch,
                cull, unroll=UNROLL):
    """Shadow test: division-free via the sign-consistent t-window check
    (sweep.py's c1 with t_est = 0): hit iff
    sign(td - det*eps) == sign(det*tlim - td).

    Chunk sweep with TWO per-chunk scalar gates: the conservative entry
    window, and an ALL-RESOLVED cut — once every live lane is occluded the
    remaining chunks are skipped outright (the reference's first-hit exit,
    blas.rs:257-294, at block granularity; the dynamic t bound also shrinks
    to the farthest still-unresolved lane)."""
    _load_once([(w_hbm, w_vmem, sem)])
    rays8 = rays_ref[...]
    tlim = rays_ref[:, 7:8]
    b = rays8.shape[0]
    eps = jnp.float32(EPSILON)
    terms = _chunk_terms_vpu if USE_VPU_TERMS else _chunk_terms
    bb = _block_bounds(rays8) if cull else None
    # lanes with no test to run (t_limit <= 0: dead/pad lanes) count as
    # resolved from the start
    invalid = (tlim <= 0.0).astype(jnp.float32)  # [B, 1]

    def test(c, found):
        det, td, ud, vd = terms(w_vmem, rays8, c, ch)
        c1 = _same(td - det * eps, det * tlim - td)
        c2 = _same(ud, det - ud)
        c3 = _same(vd, det - ud - vd)
        ok = c1 & c2 & c3 & (det != 0.0)
        # [B,1] f32 carry: Mosaic cannot legalize i1 vector loop carries,
        # and small carries beat elementwise [B,ch] ones (see closest).
        return jnp.maximum(found, jnp.max(ok.astype(jnp.float32), axis=1, keepdims=True))

    def step(c, found):
        resolved = jnp.maximum(found, invalid)
        live = jnp.min(resolved) < 0.5
        if not cull:
            return jax.lax.cond(live, lambda f: test(c, f), lambda f: f, found)
        tmax = jnp.max(jnp.where(resolved > 0.5, 0.0, tlim))
        gate = live & _chunk_gate(cab_ref, c, bb, tmax)
        return jax.lax.cond(gate, lambda f: test(c, f), lambda f: f, found)

    any_f = _chunk_sweep(chunks, step, jnp.zeros((b, 1), jnp.float32), unroll)
    out_ref[:, 0:1] = any_f
    out_ref[:, 1:8] = jnp.zeros((b, 7), jnp.float32)


def _pack_rays(origin, direction, t_limit, block):
    """[N,3]x2 + [N] -> [N', 8] ray rows (dx dy dz ox oy oz 1 tlim) padded to
    a BLOCK multiple. The constant-1 slot folds the d0/d1/d2 plane offsets
    into the chunk matmul. Pad rays have zero direction (det==0 everywhere ->
    no hits).

    tlim rides in the matmul operand against an all-zero weight row, so it
    MUST be finite: inf * 0 = NaN would poison every dot product (this
    silently blacked out whole renders — integrator dead/miss lanes carry
    t_limit = inf). Clamp to a huge finite value; comparisons are unchanged."""
    n = origin.shape[0]
    pad = (-n) % block
    rays = jnp.concatenate(
        [
            direction,
            origin,
            jnp.ones((n, 1), jnp.float32),
            jnp.minimum(t_limit, 3.0e38)[:, None],
        ],
        axis=1,
    )
    if pad:
        rays = jnp.concatenate([rays, jnp.zeros((pad, 8), jnp.float32)], axis=0)
    return rays, n


def _block_for(tp: int) -> int:
    """Rays per grid step, sized to the scoped-VMEM budget: the kernel's
    live set is the W+aux scratch plus ~6 [B, ch] f32 combine temps per
    chunk step. Small tables take BIG blocks (fewer grid steps -> the fixed
    per-block costs — bound reduce, DMA-once cond, epilogue — amortize);
    at 20K tris, B=256 already overflowed v5e's 16 MB scoped limit by
    ~360 KB, so big tables shrink to 128."""
    if tp > 16384:
        return 128
    if tp > 8192:
        return BLOCK
    return 512


def _unroll_for(tp: int) -> int:
    """Chunk-loop unroll: each unrolled step instance holds a live [B, 6*ch]
    tile in the scoped-VMEM stack, so big tables must not unroll."""
    return 1 if tp > 16384 else UNROLL


def _geom(tab_w):
    """(chunks, ch) from the packed W table. T' = cols/6; the pack-time chunk
    width is recoverable because T' is a multiple of it: 128/256 exactly for
    small scenes, else 512."""
    tp = tab_w.shape[1] // 6
    ch = tp if tp in (128, 256) else 512
    return tp // ch, ch


def _cab_smem(cab):
    """SMEM chunk-AABB input: the kernels read per-chunk scalars from it.
    ``None`` (no culling) passes a 1-row dummy the kernel never touches."""
    if cab is None:
        return jnp.zeros((1, 6), jnp.float32), False
    return cab, True


@functools.partial(jax.jit, static_argnames=("interpret",))
def _closest_call(w, aux, cab, origin, direction, t_limit, interpret: bool):
    chunks, ch = _geom(w)
    blk = _block_for(chunks * ch)
    rays, n = _pack_rays(origin, direction, t_limit, blk)
    np_total = rays.shape[0]
    cab_in, cull = _cab_smem(cab)

    out = pl.pallas_call(
        functools.partial(_closest_kernel, chunks=chunks, ch=ch, cull=cull,
                          unroll=_unroll_for(chunks * ch)),
        out_shape=jax.ShapeDtypeStruct((np_total, 8), jnp.float32),
        grid=(np_total // blk,),
        in_specs=[
            pl.BlockSpec((blk, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((blk, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(w.shape, jnp.float32),
            pltpu.VMEM(aux.shape, jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(rays, cab_in, w, aux)
    return out[:n]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _any_call(w, cab, origin, direction, t_limit, interpret: bool):
    chunks, ch = _geom(w)
    blk = _block_for(chunks * ch)
    rays, n = _pack_rays(origin, direction, t_limit, blk)
    np_total = rays.shape[0]
    cab_in, cull = _cab_smem(cab)

    out = pl.pallas_call(
        functools.partial(_any_kernel, chunks=chunks, ch=ch, cull=cull,
                          unroll=_unroll_for(chunks * ch)),
        out_shape=jax.ShapeDtypeStruct((np_total, 8), jnp.float32),
        grid=(np_total // blk,),
        in_specs=[
            pl.BlockSpec((blk, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((blk, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(w.shape, jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(rays, cab_in, w)
    return out[:n]


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def dense_pl_closest_hit_shade(dense_pl: dict, origin, direction, t_limit):
    """Closest hit + fused shading fetch. Returns
    ``(tri_idx, t, u, v, normal_raw [N,3], model_id [N] i32)`` — the normal is
    the unnormalized barycentric interpolation (callers normalize + flip)."""
    out = _closest_call(
        dense_pl["w"], dense_pl["aux"], dense_pl.get("cab"), origin, direction,
        t_limit, interpret=_interpret_default(),
    )
    best = out[:, 1].astype(jnp.int32)
    hit = best >= 0
    t = jnp.where(hit, out[:, 0], t_limit)
    u = jnp.where(hit, out[:, 2], 0.0)
    v = jnp.where(hit, out[:, 3], 0.0)
    normal = out[:, 4:7]
    model = out[:, 7].astype(jnp.int32)
    return best, t, u, v, normal, model


def dense_pl_closest_hit(dense_pl: dict, origin, direction, t_limit):
    """Same contract as `traversal.closest_hit`: (tri_idx, t, u, v)."""
    best, t, u, v, _, _ = dense_pl_closest_hit_shade(dense_pl, origin, direction, t_limit)
    return best, t, u, v


def dense_pl_any_hit(dense_pl: dict, origin, direction, t_limit):
    out = _any_call(
        dense_pl["w"], dense_pl.get("cab"), origin, direction, t_limit,
        interpret=_interpret_default(),
    )
    return out[:, 0] > 0.0


# --- split engine: scenes above DENSE_PL_MAX_TRIS as chained <=16K parts ---


def pack_dense_pl_parts(tri: dict, normals_flat, model, positions,
                        part_tris: int = DENSE_PL_MAX_TRIS) -> list[dict]:
    """Split a >16K-tri soup (in SAH order) into contiguous <=16K parts, each
    packed as a full single-table engine plus its global ``base`` offset.

    One 32K table was measured to overflow v5e's 16 MB scoped VMEM even at
    reduced block/unroll; K chained kernel launches reuse the proven 16K
    kernel unchanged. SAH order makes parts spatial clusters, so per-part
    chunk culling (and the shrinking t window passed part-to-part) prunes
    later parts cheaply."""
    t = np.asarray(tri["n0"]).shape[0]
    n_parts = -(-t // part_tris)
    per = -(-t // n_parts)
    parts = []
    for k in range(n_parts):
        lo, hi = k * per, min((k + 1) * per, t)
        sub = {key: np.asarray(tri[key])[lo:hi] for key in ("n0", "d0", "n1", "d1", "n2", "d2")}
        parts.append({
            "w": pack_dense_pl(sub),
            "aux": pack_dense_pl_aux(
                sub,
                None if normals_flat is None else np.asarray(normals_flat)[lo:hi],
                None if model is None else np.asarray(model)[lo:hi],
            ),
            "cab": pack_dense_pl_cab(np.asarray(positions)[lo:hi]),
            "base": lo,
        })
    return parts


def dense_pl_parts_closest_hit_shade(parts: list, origin, direction, t_limit):
    """Chained closest hit over sub-tables: each part searches inside the
    running t window (strict ``t < window``, so ties resolve to the earlier
    part = lower global index, matching the single-table rule)."""
    n = origin.shape[0]
    best = jnp.full(n, -1, jnp.int32)
    u = jnp.zeros(n, jnp.float32)
    v = jnp.zeros(n, jnp.float32)
    normal = jnp.zeros((n, 3), jnp.float32)
    model = jnp.zeros(n, jnp.int32)
    t_cur = t_limit
    for p in parts:
        b_, t_, u_, v_, n_, m_ = dense_pl_closest_hit_shade(p, origin, direction, t_cur)
        hit = b_ >= 0
        best = jnp.where(hit, b_ + p["base"], best)
        u = jnp.where(hit, u_, u)
        v = jnp.where(hit, v_, v)
        normal = jnp.where(hit[:, None], n_, normal)
        model = jnp.where(hit, m_, model)
        t_cur = t_  # = min(prev window, this part's best) by contract
    return best, t_cur, u, v, normal, model


def dense_pl_parts_closest_hit(parts: list, origin, direction, t_limit):
    best, t, u, v, _, _ = dense_pl_parts_closest_hit_shade(parts, origin, direction, t_limit)
    return best, t, u, v


def dense_pl_parts_any_hit(parts: list, origin, direction, t_limit):
    found = None
    for p in parts:
        f = dense_pl_any_hit(p, origin, direction, t_limit)
        found = f if found is None else (found | f)
    return found
