"""Tests for OBJ I/O, triangle precompute, BVH/TLAS builders."""

import numpy as np
import pytest

from path_tracer_tpu.scene import bvh, objio, procedural, tlas, triangle


def test_obj_roundtrip(tmp_path):
    pos, nrm = procedural.icosphere(subdivisions=1)
    path = tmp_path / "sphere.obj"
    objio.save_obj(path, pos, nrm)
    pos2, nrm2 = objio.load_obj(path)
    np.testing.assert_allclose(pos2, pos, atol=1e-5)
    # loader normalizes vn records
    np.testing.assert_allclose(
        nrm2, nrm / np.linalg.norm(nrm, axis=-1, keepdims=True), atol=1e-5
    )


def test_obj_negative_indices_and_fan(tmp_path):
    # A quad via negative relative indices, no normals -> face-normal fallback
    obj = "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf -4 -3 -2 -1\n"
    p = tmp_path / "quad.obj"
    p.write_text(obj)
    pos, nrm = objio.load_obj(p)
    assert pos.shape == (2, 3, 3)  # fan triangulated
    # face normal (unnormalized cross product, +z for CCW in xy plane)
    assert (nrm[..., 2] > 0).all()


def test_triangle_precompute_area_and_planes():
    pos = np.array([[[0, 0, 0], [2, 0, 0], [0, 2, 0]]], np.float32)
    pre = triangle.precompute(pos)
    np.testing.assert_allclose(pre["area"], [2.0], atol=1e-6)
    np.testing.assert_allclose(pre["n0"][0], [0, 0, 4], atol=1e-6)  # ab x ac
    # Barycentric planes: n1 . p + d1 should be u at vertices (0 at A, 1 at B)
    for v, (eu, ev) in zip(pos[0], [(0, 0), (1, 0), (0, 1)]):
        u = pre["n1"][0] @ v + pre["d1"][0]
        w = pre["n2"][0] @ v + pre["d2"][0]
        np.testing.assert_allclose([u, w], [eu, ev], atol=1e-6)


def _check_flat_bvh_covers(flat, n_prims):
    """Every primitive appears exactly once across leaves."""
    seen = np.zeros(n_prims, np.int32)
    for c in ("c0", "c1"):
        for i in range(len(flat[f"{c}_idx"])):
            count = flat[f"{c}_count"][i]
            if count > 0:
                start = flat[f"{c}_idx"][i]
                seen[start : start + count] += 1
    assert (seen == 1).all()


def _check_flat_bvh_bounds(flat, bb_min, bb_max, perm):
    """Child AABBs must contain their primitives' AABBs."""
    for c in ("c0", "c1"):
        for i in range(len(flat[f"{c}_idx"])):
            count = flat[f"{c}_count"][i]
            if count > 0:
                start = flat[f"{c}_idx"][i]
                prim_ids = perm[start : start + count]
                assert (flat[f"{c}_min"][i] <= bb_min[prim_ids].min(0) + 1e-5).all()
                assert (flat[f"{c}_max"][i] >= bb_max[prim_ids].max(0) - 1e-5).all()


@pytest.mark.parametrize("n", [1, 2, 3, 7, 64, 257])
def test_bvh_build_valid(n):
    rs = np.random.default_rng(n)
    centers = rs.uniform(-10, 10, (n, 3)).astype(np.float32)
    half = rs.uniform(0.01, 0.5, (n, 3)).astype(np.float32)
    bb_min, bb_max = centers - half, centers + half
    flat, perm, depth = bvh.build_bvh(bb_min, bb_max)
    assert sorted(perm.tolist()) == list(range(n))
    _check_flat_bvh_covers(flat, n)
    _check_flat_bvh_bounds(flat, bb_min, bb_max, perm)
    assert all((flat[f"{c}_count"] <= 4).all() for c in ("c0", "c1"))
    assert depth <= 48


def test_tlas_build_valid():
    rs = np.random.default_rng(5)
    n = 33
    centers = rs.uniform(-100, 100, (n, 3)).astype(np.float32)
    half = rs.uniform(1, 5, (n, 3)).astype(np.float32)
    flat = tlas.build_tlas(centers - half, centers + half)
    # every instance appears once as a leaf
    seen = np.zeros(n, np.int32)
    for c in ("c0", "c1"):
        for i in range(len(flat[f"{c}_idx"])):
            if flat[f"{c}_count"][i] == 1:
                seen[flat[f"{c}_idx"][i]] += 1
    assert (seen == 1).all()


def test_icosphere_geometry():
    pos, nrm = procedural.icosphere(center=(1, 2, 3), radius=2.0, subdivisions=2)
    assert pos.shape[0] == 20 * 4**2
    r = np.linalg.norm(pos - np.array([1, 2, 3]), axis=-1)
    np.testing.assert_allclose(r, 2.0, atol=1e-4)
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=-1), 1.0, atol=1e-5)
