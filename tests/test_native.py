"""Native C++ host runtime vs NumPy reference implementations.

The C++ OBJ parser and SAH builder (native/pt_native.cpp) must reproduce the
Python implementations exactly — same triangle soup, same BVH topology and
permutation — so scenes built either way render identical images.
"""

import numpy as np
import pytest

from path_tracer_tpu import native
from path_tracer_tpu.scene import bvh, objio, procedural

pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")


def test_obj_parse_matches_python(tmp_path):
    pos, nrm = procedural.icosphere(subdivisions=2)
    p = tmp_path / "s.obj"
    objio.save_obj(p, pos, nrm)
    py_pos, py_nrm = objio.load_obj(p)
    nat_pos, nat_nrm = native.load_obj(p)
    np.testing.assert_array_equal(nat_pos, py_pos)
    np.testing.assert_allclose(nat_nrm, py_nrm, atol=1e-7)


def test_obj_negative_indices_and_quads(tmp_path):
    obj = "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf -4 -3 -2 -1\n"
    p = tmp_path / "quad.obj"
    p.write_text(obj)
    py = objio.load_obj(p)
    nat = native.load_obj(p)
    np.testing.assert_array_equal(nat[0], py[0])
    np.testing.assert_array_equal(nat[1], py[1])


@pytest.mark.parametrize("n", [1, 2, 5, 64, 500, 2000])
def test_bvh_build_matches_python(n):
    rs = np.random.default_rng(n)
    centers = rs.uniform(-50, 50, (n, 3)).astype(np.float32)
    half = rs.uniform(0.01, 2.0, (n, 3)).astype(np.float32)
    bb_min, bb_max = centers - half, centers + half

    py_flat, py_perm, py_depth = bvh.build_bvh(bb_min, bb_max)
    nat_flat, nat_perm, nat_depth = native.build_bvh(bb_min, bb_max)

    np.testing.assert_array_equal(nat_perm, py_perm)
    assert nat_depth == py_depth
    for key in py_flat:
        np.testing.assert_array_equal(nat_flat[key], py_flat[key], err_msg=key)


def test_bvh_large_mesh_and_speed():
    pos, _ = procedural.icosphere(subdivisions=5)  # 20480 tris
    from path_tracer_tpu.scene import triangle

    bb_min, bb_max = triangle.aabbs(pos)
    import time

    t0 = time.perf_counter()
    flat, perm, depth = native.build_bvh(bb_min, bb_max)
    dt = time.perf_counter() - t0
    assert dt < 2.0, f"native build too slow: {dt:.2f}s"
    assert sorted(perm.tolist()) == list(range(pos.shape[0]))
    assert depth <= 48


def test_native_chunk_partition_bit_identical():
    """The C++ chunk splitter must make the IDENTICAL split decisions as the
    NumPy one (same SAH promotion semantics, same stable sort, same DFS
    order) — walk-engine layouts depend only on this partition."""
    from path_tracer_tpu import native
    from path_tracer_tpu.scene import bvh, procedural, triangle

    if not native.available():
        import pytest

        pytest.skip("no native toolchain")
    pos, _ = procedural.bumpy_sphere(nu=96, nv=96)  # ~18K tris
    bmin, bmax = triangle.aabbs(pos)
    for cap in (128, 1024, 7):
        p_n, s_n, sp_n = native.chunk_partition(bmin, bmax, cap)
        p_p, s_p, sp_p = bvh.chunk_partition_py(bmin, bmax, cap)
        np.testing.assert_array_equal(p_n, p_p)
        np.testing.assert_array_equal(s_n, s_p)
        np.testing.assert_array_equal(sp_n, sp_p)
        assert (sp_n <= cap).all() and sp_n.sum() == pos.shape[0]


def test_parallel_build_bit_identical(monkeypatch):
    """The threaded builders (PT_NATIVE_THREADS>1) must produce EXACTLY the
    serial output: the parallel top-level makes the same split decisions
    (decide_split depends only on its own range) and the DFS flattener erases
    arena ordering. Forced small PT_NATIVE_PAR_MIN so the parallel path runs
    even at test scale."""
    from path_tracer_tpu import native
    from path_tracer_tpu.scene import triangle, procedural

    if not native.available():
        import pytest

        pytest.skip("no native toolchain")
    pos, _ = procedural.bumpy_sphere(nu=96, nv=96)  # ~18K tris
    bmin, bmax = triangle.aabbs(pos)

    monkeypatch.setenv("PT_NATIVE_THREADS", "1")
    f1, p1, d1 = native.build_bvh(bmin, bmax, max_leaf=4)
    c1 = native.chunk_partition(bmin, bmax, 2048)

    monkeypatch.setenv("PT_NATIVE_THREADS", "5")
    monkeypatch.setenv("PT_NATIVE_PAR_MIN", "512")
    f5, p5, d5 = native.build_bvh(bmin, bmax, max_leaf=4)
    c5 = native.chunk_partition(bmin, bmax, 2048)

    np.testing.assert_array_equal(p1, p5)
    assert d1 == d5
    for key in f1:
        np.testing.assert_array_equal(f1[key], f5[key], err_msg=key)
    for a, b in zip(c1, c5):
        np.testing.assert_array_equal(a, b)
