"""HBM-streamed dense intersection — the big-scene engine (16K - 2M tris).

The single-table Pallas engine (trace/dense_pallas.py) is capped at 16K
triangles by v5e's 16 MB scoped VMEM, and the chained-parts fallback pays a
full kernel launch (+ fixed per-call costs) per 16K sub-table — measured
0.38 Mrays/s at 82K tris. This engine runs the WHOLE table through ONE
kernel launch: rays and per-block best-hit state stay VMEM-resident for the
entire query while part-sized weight tables stream HBM -> VMEM through a
two-slot double buffer (DMA of part p+1 overlaps testing part p). Total HBM
traffic per query = one pass over the table (~192 B/tri), which at v5e's
~800 GB/s bandwidth makes even the reference's dragon-class scene
(main.rs:100-117, ~870K tris) a sub-millisecond streaming floor.

Same Havel-Herout math as dense_pallas (primitive.rs:117-144) via the shared
``_chunk_terms_vpu`` — exact-f32 VPU FMAs, the round-1 precision lesson.

LAYOUT: per-ray state in VMEM must be LANE-DENSE — a [N, 1] f32 buffer pads
to (8, 128) tiles and wastes 128x. Rays are stored transposed [8, N]
(fields x lanes, fully dense); per-block working layout [128, 8] (rays on
sublanes, as the chunk test needs) is produced by an identity-matrix
dot_general — a single 128-deep MXU op whose outputs each sum exactly one
product, hence EXACT in f32 under Precision.HIGHEST (DEFAULT would truncate
the VALUES to bf16 in its single pass — same pitfall as the dense engine's
one-hot fetch). Best-hit state is stored row-major [nblocks, 128] (dense)
and converted by the same trick.

CULLING: three levels, all against conservative per-block ray interval
bounds (precomputed in XLA, passed via SMEM):
  1. part gate  — one scalar slab test vs the part's AABB,
  2. chunk gate — scalar slab test vs the chunk AABB (SMEM table),
  3. dynamic t-window — per-block tmax (max over lanes of min(best_t,
     t_limit)) persists in SMEM across parts, so near hits found in part p
     cull far chunks of part q > p. Parts follow SAH order = spatial
     clusters, so the window shrinks fast.

SHADING: the kernel is search-only (best_t, global winner index). Winner
attributes (plane rows, vertex normals, model id) are fetched OUTSIDE by an
XLA gather from the row-major aux table — a flat ~600 us at 16K lanes
regardless of table height (platform finding 4) — and exact t/u/v are
recomputed componentwise in the same expression order as
``traversal._tri_intersect``.

Reference parity: behavior matches BLAS closest/any-hit semantics
(blas.rs:214-294) — strict ``t < best`` keeps the earliest (DFS-order)
triangle on ties; the any-hit variant early-exits whole blocks once every
live lane is occluded (blas.rs:257-294).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from path_tracer_tpu.core.constants import EPSILON
from path_tracer_tpu.trace.dense_pallas import (
    _BIG,
    _HI,
    AUX_COLS,
    _chunk_terms_vpu,
    _same,
)

# Triangles per streamed part: W slot [8, 6*PART_TRIS] f32 = 3 MB,
# double-buffered 6 MB; + rays [8, N] + state [nblocks, 128] x3 + out
# comfortably inside the 16 MB scoped-VMEM budget at N = 16K lanes.
PART_TRIS = 16384
CH = 512  # chunk lane width within a part (matches dense_pallas big tables)
SBLK = 128  # rays per block = identity-transpose granularity
# f32 holds integers exactly to 2^24; global winner indices ride in f32.
DENSE_STREAM_MAX_TRIS = 2_000_000


def _part_geometry(n_tris: int) -> tuple[int, int, int]:
    """(nparts, per, part_tp): FIXED-stride parts (``per == part_tp``
    always), padding only in the trailing part. The fixed stride makes the
    padded global winner index IDENTICAL to the original soup index and
    lets every static kernel size derive from ``w.shape`` alone — so the
    query path needs no Python-int metadata (which would turn into tracers
    when the scene pytree crosses the integrator's ``jax.jit``). Pad chunks
    carry inverted AABBs and all-zero weight columns (det == 0), so gates
    skip them and they can never win."""
    if n_tris <= PART_TRIS:
        part_tp = -(-n_tris // CH) * CH
        return 1, part_tp, part_tp
    return -(-n_tris // PART_TRIS), PART_TRIS, PART_TRIS


def pack_dense_stream(tri: dict, normals_flat, model, positions) -> dict:
    """Pack the streamed-engine tables.

    Returns (host numpy): ``w`` [nparts, 8, cpp*6*CH] per-part MXU/VPU weight
    tables; ``aux`` [nparts*part_tp, AUX_COLS] row-major shading table in
    PADDED global order; ``cab`` [nparts*cpp, 6] chunk AABBs; ``pab``
    [nparts, 6] part AABBs; ``meta`` dict of static ints.
    """
    n0 = np.asarray(tri["n0"], np.float32)
    t = n0.shape[0]
    nparts, per, part_tp = _part_geometry(t)
    cpp = part_tp // CH
    pos = np.asarray(positions, np.float32)

    def fld(name):
        return np.asarray(tri[name], np.float32)

    n1, n2 = fld("n1"), fld("n2")
    d0, d1, d2 = fld("d0"), fld("d1"), fld("d2")
    nf = None if normals_flat is None else np.asarray(normals_flat, np.float32)
    mdl = None if model is None else np.asarray(model)

    w = np.zeros((nparts, 8, cpp * 6 * CH), np.float32)
    aux = np.zeros((nparts * part_tp, AUX_COLS), np.float32)
    cab = np.empty((nparts * cpp, 6), np.float32)
    cab[:, 0:3] = _BIG
    cab[:, 3:6] = -_BIG
    pab = np.empty((nparts, 6), np.float32)
    pad = 1e-4 * float(np.abs(pos).max(initial=1.0)) + 1e-6

    for p in range(nparts):
        lo, hi = p * per, min((p + 1) * per, t)
        k = hi - lo
        cols = np.zeros((8, 6, part_tp), np.float32)
        cols[0:3, 0, :k] = n0[lo:hi].T
        cols[3:6, 1, :k] = -n0[lo:hi].T
        cols[6, 1, :k] = d0[lo:hi]
        cols[3:6, 2, :k] = n1[lo:hi].T
        cols[6, 2, :k] = d1[lo:hi]
        cols[0:3, 3, :k] = n1[lo:hi].T
        cols[3:6, 4, :k] = n2[lo:hi].T
        cols[6, 4, :k] = d2[lo:hi]
        cols[0:3, 5, :k] = n2[lo:hi].T
        w[p] = cols.reshape(8, 6, cpp, CH).transpose(0, 2, 1, 3).reshape(8, cpp * 6 * CH)

        a = aux[p * part_tp : p * part_tp + k]
        a[:, 0:3] = n0[lo:hi]
        a[:, 3] = d0[lo:hi]
        a[:, 4:7] = n1[lo:hi]
        a[:, 7] = d1[lo:hi]
        a[:, 8:11] = n2[lo:hi]
        a[:, 11] = d2[lo:hi]
        if nf is not None:
            a[:, 12:21] = nf[lo:hi]
        if mdl is not None:
            a[:, 21] = mdl[lo:hi]

        seg_p = pos[lo:hi]
        pab[p, 0:3] = seg_p.min(axis=(0, 1)) - pad
        pab[p, 3:6] = seg_p.max(axis=(0, 1)) + pad
        for c in range(cpp):
            s0 = lo + c * CH
            seg = pos[s0 : min(s0 + CH, hi)]
            if seg.size:
                cab[p * cpp + c, 0:3] = seg.min(axis=(0, 1)) - pad
                cab[p * cpp + c, 3:6] = seg.max(axis=(0, 1)) + pad

    return {
        "w": w,
        "aux": aux,
        "cab": cab,
        "pab": pab,
        "meta": {"nparts": nparts, "per": per, "part_tp": part_tp, "cpp": cpp,
                 "n_tris": t},
    }


def _identity(k: int):
    r = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return (r == c).astype(jnp.float32)


def _t_cols(ident, rows):
    """[k, SBLK] -> [SBLK, k] via identity contraction. Each output sums
    exactly ONE product, so it is EXACT in f32 — but only under HIGHEST
    (DEFAULT's single bf16 pass truncates the VALUES, the dense engine's
    one-hot-fetch lesson)."""
    return jax.lax.dot_general(
        ident, rows, (((1,), (1,)), ((), ())),
        precision=_HI, preferred_element_type=jnp.float32,
    )


def _t_rows(ident, cols):
    """[SBLK, k] -> [k, SBLK] via identity contraction (exact, see above)."""
    return jax.lax.dot_general(
        cols, ident, (((0,), (0,)), ((), ())),
        precision=_HI, preferred_element_type=jnp.float32,
    )


def _bounds_rows(origin, direction, t_limit):
    """XLA-side per-block conservative ray bounds ``[nblocks, 16]``:
    (olo3 | ohi3 | dlo3 | dhi3 | tmax | any_valid | pad2). Invalid lanes
    (dead/regen: t_limit <= 0, or non-finite o/d) are masked out — one NaN
    lane would otherwise cull a whole live block (platform finding 8)."""
    n = origin.shape[0]
    nb = n // SBLK
    o = origin.reshape(nb, SBLK, 3)
    d = direction.reshape(nb, SBLK, 3)
    tl = t_limit.reshape(nb, SBLK)
    valid = (
        (tl > 0.0)
        & jnp.isfinite(o).all(axis=-1)
        & jnp.isfinite(d).all(axis=-1)
    )[:, :, None]
    big = jnp.float32(_BIG)
    olo = jnp.where(valid, o, big).min(axis=1)
    ohi = jnp.where(valid, o, -big).max(axis=1)
    dlo = jnp.where(valid, d, big).min(axis=1)
    dhi = jnp.where(valid, d, -big).max(axis=1)
    tmax = jnp.where(valid[:, :, 0], tl, 0.0).max(axis=1)
    anyv = valid[:, :, 0].any(axis=1).astype(jnp.float32)
    return jnp.concatenate(
        [olo, ohi, dlo, dhi, tmax[:, None], anyv[:, None],
         jnp.zeros((nb, 2), jnp.float32)],
        axis=1,
    )


def _read_bounds(bounds_ref, i):
    olo = [bounds_ref[i, k] for k in range(3)]
    ohi = [bounds_ref[i, 3 + k] for k in range(3)]
    dlo = [bounds_ref[i, 6 + k] for k in range(3)]
    dhi = [bounds_ref[i, 9 + k] for k in range(3)]
    return olo, ohi, dlo, dhi


def _gate(box_ref, row, bb, tmax):
    """Scalar conservative slab test of box ``box_ref[row]`` (min3|max3)
    against block interval bounds ``bb`` with t window [0, tmax] (same math
    as dense_pallas._chunk_gate, shared slack policy)."""
    olo, ohi, dlo, dhi = bb
    t_lo = jnp.float32(0.0)
    t_hi = tmax * 1.00002 + 1e-5
    for k in range(3):
        nlo = box_ref[row, k] - ohi[k]
        nhi = box_ref[row, 3 + k] - olo[k]
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


def _chunk_t(wslot_ref, rays8, c, tlim, eps):
    """[SBLK, CH] candidate-t matrix for chunk ``c``: the Havel-Herout test
    with failures mapped to +BIG. Deterministic pure function of its inputs —
    the winner-id pass replays it bit-identically."""
    det, td, ud, vd = _chunk_terms_vpu(wslot_ref, rays8, c, CH)
    c2 = _same(ud, det - ud)
    c3 = _same(vd, det - ud - vd)
    safe = jnp.where(det == 0.0, 1.0, det)
    r_ = pl.reciprocal(safe, approx=True)
    r_ = r_ * (2.0 - safe * r_)  # one Newton step: ~1 ulp of f32
    tt = td * r_
    ok = c2 & c3 & (det != 0.0) & (tt > eps) & (tt < tlim)
    return jnp.where(ok, tt, _BIG)


def _stream_closest_kernel(
    bounds_ref, cab_ref, pab_ref, rays_hbm, w_hbm, out_ref,
    rays_vmem, wslot, bt_s, bg_s, m_ref, tmax_s, sem_r, sem_w,
    *, nparts, cpp, part_tp, nblocks,
):
    """Search-only streamed closest hit.

    Inputs: bounds [nblocks,16] SMEM; cab [nparts*cpp, 6] SMEM; pab
    [nparts, 6] SMEM; rays_hbm [8, N] ANY (dx dy dz ox oy oz 1 tlim,
    transposed); w_hbm [nparts, 8, cpp*6*CH] ANY. Output [2, N] VMEM:
    row 0 best_t (BIG if none), row 1 global PADDED winner index (-1 none).
    Scratch: rays_vmem [8, N]; wslot [2, 8, cpp*6*CH]; bt_s/bg_s
    [nblocks, SBLK] best-t / winner rows; m_ref [SBLK, CH] elementwise
    min-t accumulator; tmax_s [nblocks] SMEM dynamic window; DMA semaphores.

    LATENCY NOTE (the round-2 kernel lesson): per-chunk cross-lane reduces
    cost ~5-7 us of serial latency each — 6x the chunk's VPU math. The search
    therefore accumulates an ELEMENTWISE min-t matrix over the part's chunks
    (no reduces in the loop), takes ONE cross-lane min per (part, block), and
    replays the gated chunks once more to locate the winner by exact t
    equality (bit-identical replay; ~2x compute is far cheaper than the
    per-chunk serial chain). Ties resolve to the smallest global index =
    earliest DFS chunk, the single-table engine's rule."""
    copy_r = pltpu.make_async_copy(rays_hbm, rays_vmem, sem_r)
    copy_r.start()

    def wdma(slot, p):
        return pltpu.make_async_copy(w_hbm.at[p], wslot.at[slot], sem_w.at[slot])

    wdma(0, 0).start()
    copy_r.wait()

    ident = _identity(SBLK)
    eps = jnp.float32(EPSILON)
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (SBLK, CH), 1).astype(jnp.float32)

    # state init
    bt_s[...] = jnp.full((nblocks, SBLK), _BIG, jnp.float32)
    bg_s[...] = jnp.full((nblocks, SBLK), -1.0, jnp.float32)

    def init_tmax(i, _):
        tmax_s[i] = bounds_ref[i, 12]
        return 0

    jax.lax.fori_loop(0, nblocks, init_tmax, 0)

    def part_body(p, _):
        slot = jax.lax.rem(p, 2)

        @pl.when(p + 1 < nparts)
        def _():
            wdma(jax.lax.rem(p + 1, 2), p + 1).start()

        wdma(slot, p).wait()
        pbase = (p * part_tp).astype(jnp.float32)

        def block_body(i, _):
            bb = _read_bounds(bounds_ref, i)
            tmax0 = tmax_s[i]
            visit = (bounds_ref[i, 13] > 0.0) & _gate(pab_ref, p, bb, tmax0)

            @pl.when(visit)
            def _():
                c0 = pl.multiple_of(i * SBLK, SBLK)
                rays8 = _t_cols(ident, rays_vmem[:, pl.ds(c0, SBLK)])  # [SBLK, 8]
                tlim = rays8[:, 7:8]
                m_ref[...] = jnp.full((SBLK, CH), _BIG, jnp.float32)

                def sweep(c, _):
                    def test(_):
                        m_ref[...] = jnp.minimum(
                            m_ref[...], _chunk_t(wslot.at[slot], rays8, c, tlim, eps)
                        )
                        return 0

                    gate = _gate(cab_ref, p * cpp + c, bb, tmax0)
                    return jax.lax.cond(gate, test, lambda _: 0, 0)

                jax.lax.fori_loop(0, cpp, sweep, 0)

                bt = _t_cols(ident, bt_s[pl.ds(i, 1), :])  # [SBLK, 1]
                t_p = jnp.min(m_ref[...], axis=1, keepdims=True)
                upd = t_p < bt  # strict: earlier part wins ties

                # winner-id pass: replay gated chunks, elementwise-min the
                # global ids whose replayed t matches this part's min.
                def locate(c, gmin):
                    def test(gmin):
                        tm = _chunk_t(wslot.at[slot], rays8, c, tlim, eps)
                        cf = (c * CH).astype(jnp.float32)
                        cand = jnp.where(tm == t_p, lane_row + cf + pbase, _BIG)
                        return jnp.minimum(gmin, jnp.min(cand, axis=1, keepdims=True))

                    gate = _gate(cab_ref, p * cpp + c, bb, tmax0)
                    return jax.lax.cond(gate, test, lambda g: g, gmin)

                g_p = jax.lax.fori_loop(
                    0, cpp, locate, jnp.full((SBLK, 1), _BIG, jnp.float32)
                )
                bg = _t_cols(ident, bg_s[pl.ds(i, 1), :])
                bt2 = jnp.where(upd, t_p, bt)
                bg2 = jnp.where(upd, g_p, bg)
                bt_s[pl.ds(i, 1), :] = _t_rows(ident, bt2)
                bg_s[pl.ds(i, 1), :] = _t_rows(ident, bg2)
                tmax_s[i] = jnp.max(jnp.minimum(bt2, tlim))

            return 0

        jax.lax.fori_loop(0, nblocks, block_body, 0)
        return 0

    jax.lax.fori_loop(0, nparts, part_body, 0)

    def out_body(i, _):
        c0 = pl.multiple_of(i * SBLK, SBLK)
        out_ref[0:1, pl.ds(c0, SBLK)] = bt_s[pl.ds(i, 1), :]
        out_ref[1:2, pl.ds(c0, SBLK)] = bg_s[pl.ds(i, 1), :]
        return 0

    jax.lax.fori_loop(0, nblocks, out_body, 0)


def _stream_any_kernel(
    bounds_ref, cab_ref, pab_ref, rays_hbm, w_hbm, out_ref,
    rays_vmem, wslot, fd_s, m_ref, tmax_s, sem_r, sem_w,
    *, nparts, cpp, part_tp, nblocks,
):
    """Streamed any-hit (shadow) test: out [1, N] > 0 iff occluded.

    Early exit at block granularity: a block whose live lanes are all
    occluded skips every remaining part (the reference's first-hit exit,
    blas.rs:257-294). Division-free sign-window test (sweep.py's c1)."""
    copy_r = pltpu.make_async_copy(rays_hbm, rays_vmem, sem_r)
    copy_r.start()

    def wdma(slot, p):
        return pltpu.make_async_copy(w_hbm.at[p], wslot.at[slot], sem_w.at[slot])

    wdma(0, 0).start()
    copy_r.wait()

    ident = _identity(SBLK)
    eps = jnp.float32(EPSILON)
    fd_s[...] = jnp.zeros((nblocks, SBLK), jnp.float32)

    def init_tmax(i, _):
        tmax_s[i] = bounds_ref[i, 12]
        return 0

    jax.lax.fori_loop(0, nblocks, init_tmax, 0)

    def part_body(p, _):
        slot = jax.lax.rem(p, 2)

        @pl.when(p + 1 < nparts)
        def _():
            wdma(jax.lax.rem(p + 1, 2), p + 1).start()

        wdma(slot, p).wait()

        def block_body(i, _):
            bb = _read_bounds(bounds_ref, i)
            # block-level early exit: once every live lane is occluded the
            # remaining parts are skipped (the reference's first-hit exit,
            # blas.rs:257-294, at block granularity). tmax_s shrinks to the
            # farthest still-unoccluded lane's t_limit as lanes resolve.
            live = tmax_s[i] > 0.0
            visit = (
                live & (bounds_ref[i, 13] > 0.0)
                & _gate(pab_ref, p, bb, tmax_s[i])
            )

            @pl.when(visit)
            def _():
                c0 = pl.multiple_of(i * SBLK, SBLK)
                rays8 = _t_cols(ident, rays_vmem[:, pl.ds(c0, SBLK)])
                tlim = rays8[:, 7:8]
                fd = _t_cols(ident, fd_s[pl.ds(i, 1), :])  # [SBLK, 1]
                tmax0 = tmax_s[i]

                # elementwise hit accumulation over the part's chunks into
                # VMEM scratch (no per-chunk reduces and no big loop carries
                # — the serial-latency + register-pressure lessons), one
                # cross-lane max at part end.
                m_ref[...] = jnp.zeros((SBLK, CH), jnp.float32)

                def sweep(c, _):
                    def test(_):
                        det, td, ud, vd = _chunk_terms_vpu(
                            wslot.at[slot], rays8, c, CH
                        )
                        c1 = _same(td - det * eps, det * tlim - td)
                        c2 = _same(ud, det - ud)
                        c3 = _same(vd, det - ud - vd)
                        ok = c1 & c2 & c3 & (det != 0.0)
                        m_ref[...] = jnp.maximum(m_ref[...], ok.astype(jnp.float32))
                        return 0

                    gate = _gate(cab_ref, p * cpp + c, bb, tmax0)
                    return jax.lax.cond(gate, test, lambda _: 0, 0)

                jax.lax.fori_loop(0, cpp, sweep, 0)
                fd2 = jnp.maximum(fd, jnp.max(m_ref[...], axis=1, keepdims=True))
                fd_s[pl.ds(i, 1), :] = _t_rows(ident, fd2)
                # farthest unresolved lane bounds the next parts' window;
                # 0 once all live lanes are occluded (t_limit <= 0 lanes are
                # dead/pad lanes and never keep a block alive).
                tmax_s[i] = jnp.max(jnp.where(fd2 > 0.5, 0.0, tlim))

            return 0

        jax.lax.fori_loop(0, nblocks, block_body, 0)
        return 0

    jax.lax.fori_loop(0, nparts, part_body, 0)
    out_ref[...] = fd_s[...]


def _pack_rays_t(origin, direction, t_limit):
    """[N,3]x2 + [N] -> transposed [8, N'] ray table padded to SBLK multiple
    (pad lanes: zero direction, t_limit 0 -> invalid). t_limit is clamped
    finite (inf would NaN-poison interval math).

    NaN SANITATION IS MANDATORY HERE: the kernel's identity-matmul layout
    transposes multiply every lane by 0 or 1 — one NaN lane (integrator
    dead/regen rays) would turn into 0 * NaN = NaN across its whole block.
    Invalid lanes are zeroed and their t_limit forced to 0 (zero direction
    -> det == 0 -> no hits; t_limit 0 -> counted dead everywhere)."""
    n = origin.shape[0]
    valid = (
        (t_limit > 0.0)
        & jnp.isfinite(origin).all(axis=1)
        & jnp.isfinite(direction).all(axis=1)
    )
    o = jnp.where(valid[:, None], origin, 0.0)
    d = jnp.where(valid[:, None], direction, 0.0)
    tl = jnp.where(valid, jnp.minimum(t_limit, 3.0e38), 0.0)
    pad = (-n) % SBLK
    rows = jnp.concatenate(
        [
            d.T,
            o.T,
            jnp.ones((1, n), jnp.float32),
            tl[None, :],
        ],
        axis=0,
    )
    if pad:
        rows = jnp.concatenate([rows, jnp.zeros((8, pad), jnp.float32)], axis=1)
    return rows, n


@functools.partial(jax.jit, static_argnames=("interpret",))
def _stream_closest_call(w, cab, pab, origin, direction, t_limit, interpret):
    nparts, _, wcols = w.shape  # static under trace
    cpp = wcols // (6 * CH)
    part_tp = cpp * CH
    rays_t, n = _pack_rays_t(origin, direction, t_limit)
    npad = rays_t.shape[1]
    nblocks = npad // SBLK
    bounds = _bounds_rows(
        jnp.pad(origin, ((0, npad - n), (0, 0))),
        jnp.pad(direction, ((0, npad - n), (0, 0))),
        jnp.pad(jnp.minimum(t_limit, 3.0e38), (0, npad - n)),
    )
    out = pl.pallas_call(
        functools.partial(
            _stream_closest_kernel,
            nparts=nparts, cpp=cpp, part_tp=part_tp, nblocks=nblocks,
        ),
        out_shape=jax.ShapeDtypeStruct((2, npad), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((8, npad), jnp.float32),
            pltpu.VMEM((2, 8, cpp * 6 * CH), jnp.float32),
            pltpu.VMEM((nblocks, SBLK), jnp.float32),
            pltpu.VMEM((nblocks, SBLK), jnp.float32),
            pltpu.VMEM((SBLK, CH), jnp.float32),
            pltpu.SMEM((nblocks,), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(bounds, cab, pab, rays_t, w)
    return out[:, :n]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _stream_any_call(w, cab, pab, origin, direction, t_limit, interpret):
    nparts, _, wcols = w.shape  # static under trace
    cpp = wcols // (6 * CH)
    part_tp = cpp * CH
    rays_t, n = _pack_rays_t(origin, direction, t_limit)
    npad = rays_t.shape[1]
    nblocks = npad // SBLK
    bounds = _bounds_rows(
        jnp.pad(origin, ((0, npad - n), (0, 0))),
        jnp.pad(direction, ((0, npad - n), (0, 0))),
        jnp.pad(jnp.minimum(t_limit, 3.0e38), (0, npad - n)),
    )
    out = pl.pallas_call(
        functools.partial(
            _stream_any_kernel,
            nparts=nparts, cpp=cpp, part_tp=part_tp, nblocks=nblocks,
        ),
        out_shape=jax.ShapeDtypeStruct((nblocks, SBLK), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((8, npad), jnp.float32),
            pltpu.VMEM((2, 8, cpp * 6 * CH), jnp.float32),
            pltpu.VMEM((nblocks, SBLK), jnp.float32),
            pltpu.VMEM((SBLK, CH), jnp.float32),
            pltpu.SMEM((nblocks,), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(bounds, cab, pab, rays_t, w)
    return out.reshape(-1)[:n]


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def dense_stream_closest_hit_shade(eng: dict, origin, direction, t_limit):
    """Closest hit + shading attributes. Returns ``(tri_idx, t, u, v,
    normal_raw [N,3], model_id [N] i32)`` — tri_idx in ORIGINAL soup order
    (same contract as dense_pl_closest_hit_shade)."""
    out = _stream_closest_call(
        eng["w"], eng["cab"], eng["pab"], origin, direction, t_limit,
        _interpret_default(),
    )
    gl = out[1].astype(jnp.int32)  # padded global index
    hit = gl >= 0
    glc = jnp.maximum(gl, 0)
    row = jnp.take(eng["aux"], glc, axis=0)  # [N, AUX_COLS] XLA gather

    # exact t/u/v in traversal._tri_intersect expression order
    col = lambda k: row[:, k]
    dx, dy, dz = direction[:, 0], direction[:, 1], direction[:, 2]
    ox, oy, oz = origin[:, 0], origin[:, 1], origin[:, 2]
    det = col(0) * dx + col(1) * dy + col(2) * dz
    td = col(3) - (col(0) * ox + col(1) * oy + col(2) * oz)
    px = det * ox + td * dx
    py = det * oy + td * dy
    pz = det * oz + td * dz
    ud = col(4) * px + col(5) * py + col(6) * pz + det * col(7)
    vd = col(8) * px + col(9) * py + col(10) * pz + det * col(11)
    inv = 1.0 / jnp.where(det == 0.0, 1.0, det)
    t = jnp.where(hit, td * inv, t_limit)
    u = jnp.where(hit, ud * inv, 0.0)
    v = jnp.where(hit, vd * inv, 0.0)
    w_ = 1.0 - u - v
    normal = (
        w_[:, None] * row[:, 12:15]
        + u[:, None] * row[:, 15:18]
        + v[:, None] * row[:, 18:21]
    )
    model = jnp.where(hit, row[:, 21].astype(jnp.int32), 0)

    # fixed part stride (per == part_tp): padded global == soup index
    orig = jnp.where(hit, gl, -1)
    return orig, t, u, v, normal, model


def dense_stream_closest_hit(eng: dict, origin, direction, t_limit):
    """Same contract as `traversal.closest_hit`: (tri_idx, t, u, v)."""
    best, t, u, v, _, _ = dense_stream_closest_hit_shade(
        eng, origin, direction, t_limit
    )
    return best, t, u, v


def dense_stream_any_hit(eng: dict, origin, direction, t_limit):
    out = _stream_any_call(
        eng["w"], eng["cab"], eng["pab"], origin, direction, t_limit,
        _interpret_default(),
    )
    return out > 0.0
