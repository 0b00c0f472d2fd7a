"""Two-level geometry assembly: shared BLASes + instance table + TLAS.

Host-side counterpart of `trace.twolevel`. Each model's BLAS is built once in
OBJECT space (the reference's ``BLAS::new``, blas.rs:174-201); instances are
(rotation, translation) rows; the TLAS clusters world-space instance AABBs
(``TLASNode::generate_tlas``, tlas_bvh.rs:85-138).

Divergence from the reference, on purpose: the reference transforms an AABB by
mapping only its min/max corners (``boundingbox.rs:51-57``), which is wrong
for rotations that aren't axis-aligned; here all 8 corners are mapped, giving
a conservative (correct) world box. Images can only improve.

The default rendering path remains the baked world BVH (`scene.Scene`); this
mode exists for massive-instancing memory scaling. It is fully wired into the
wavefront integrator (``integrator/wavefront.py`` shades two-level hits with
object->world normal transforms) and exercised by the traversal parity tests
and the many-instance benchmark config.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from path_tracer_tpu.scene import bvh as bvh_mod
from path_tracer_tpu.scene import tlas as tlas_mod
from path_tracer_tpu.scene import triangle as tri_mod
from path_tracer_tpu.scene.model import Model
from path_tracer_tpu.trace.traversal import pack_bvh, pack_tris
from path_tracer_tpu.trace.twolevel import pack_instances


def _transform_aabb_corners(bb_min, bb_max, matrix):
    rot, tr = matrix[:, :3], matrix[:, 3]
    xs = [bb_min[0], bb_max[0]]
    ys = [bb_min[1], bb_max[1]]
    zs = [bb_min[2], bb_max[2]]
    pts = np.array([[x, y, z] for x in xs for y in ys for z in zs], np.float32)
    world = pts @ rot.T + tr
    return world.min(axis=0), world.max(axis=0)


class TwoLevelGeometry:
    def __init__(self, models: list[Model]):
        blas_nodes = []
        tri_rows = []
        tri_normals = []
        inst_matrices = []
        inst_roots = []
        inst_models = []
        inst_bmin = []
        inst_bmax = []

        node_offset = 0
        tri_offset = 0
        for model_id, model in enumerate(models):
            pre = tri_mod.precompute(model.positions)
            bmin, bmax = tri_mod.aabbs(model.positions)
            flat, perm, _ = bvh_mod.build_bvh(bmin, bmax)
            pre = {k: v[perm] for k, v in pre.items()}
            tri_normals.append(model.normals[perm].reshape(-1, 9).astype(np.float32))

            # apply global offsets: internal child -> node index, leaf ->
            # first-primitive index
            flat = {k: np.array(v) for k, v in flat.items()}
            for c in ("c0", "c1"):
                internal = flat[f"{c}_count"] == 0
                leaf = flat[f"{c}_count"] > 0
                flat[f"{c}_idx"] = np.where(
                    internal, flat[f"{c}_idx"] + node_offset,
                    np.where(leaf, flat[f"{c}_idx"] + tri_offset, flat[f"{c}_idx"]),
                ).astype(np.int32)
            blas_nodes.append(pack_bvh(flat))
            tri_rows.append(pack_tris(pre))

            root_min = flat["root_min"]
            root_max = flat["root_max"]
            for matrix in model.matrices:
                m = np.asarray(matrix, np.float32)
                wmin, wmax = _transform_aabb_corners(root_min, root_max, m)
                inst_matrices.append(m)
                inst_roots.append(node_offset)
                inst_models.append(model_id)
                inst_bmin.append(wmin)
                inst_bmax.append(wmax)

            node_offset += flat["c0_idx"].shape[0]
            tri_offset += pre["d0"].shape[0]

        self.blas_packed = np.concatenate(blas_nodes)
        self.tri_packed = np.concatenate(tri_rows)
        self.normals_flat = np.concatenate(tri_normals)  # OBJECT-space [T, 9]
        self.inst_rows = pack_instances(
            np.stack(inst_matrices), np.asarray(inst_roots), np.asarray(inst_models)
        )
        tlas_flat = tlas_mod.build_tlas(np.stack(inst_bmin), np.stack(inst_bmax))
        self.tlas_packed = pack_bvh(tlas_flat)
        self.num_instances = len(inst_matrices)
        self.models = models
        self.num_object_tris = tri_offset

    def device(self) -> dict:
        import os

        import jax

        out = {
            "tlas_packed": jnp.asarray(self.tlas_packed),
            "blas_packed": jnp.asarray(self.blas_packed),
            "inst_rows": jnp.asarray(self.inst_rows),
            "tri_packed": jnp.asarray(self.tri_packed),
            "normals_flat": jnp.asarray(self.normals_flat),
        }
        # Fast two-level engines on TPU (trace/iwalk.py). Default: vwalk —
        # (instance, chunk)-granular gated walk with shared object-space
        # plane tables (walk-grade per-chunk culling + hierarchical window
        # skips). PT_VWALK=0 falls back to instance-granular iwalk;
        # PT_IWALK=0 disables both (gather-based TLAS/BLAS phase machine).
        from path_tracer_tpu.trace.iwalk import (
            IWALK_MAX_OBJECT_TRIS,
            pack_iwalk,
            pack_vwalk,
        )

        # PT_IWALK_FORCE=1 packs the fast engines off-TPU too (CPU
        # interpreter smoke of the exact hardware path; slow — tests only)
        if ((jax.default_backend() == "tpu"
             or os.environ.get("PT_IWALK_FORCE", "0") != "0")
                and os.environ.get("PT_IWALK", "1") != "0"
                and self.num_object_tris <= IWALK_MAX_OBJECT_TRIS):
            def up(x):
                if isinstance(x, dict):
                    return {k: up(v) for k, v in x.items()}
                if isinstance(x, tuple):
                    return tuple(up(v) for v in x)
                return jnp.asarray(x)

            packers = [pack_iwalk]
            if os.environ.get("PT_VWALK", "1") != "0":
                packers.insert(0, pack_vwalk)
            for packer in packers:
                try:
                    out["iwalk"] = up(packer(self.models))
                    break
                except ValueError:
                    continue  # over that engine's cap: try the next
        return out
