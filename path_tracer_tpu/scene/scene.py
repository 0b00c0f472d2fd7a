"""Scene assembly: models -> flattened device arrays (SceneData).

The reference builds a two-level structure at startup: per-model BLAS BVHs, a
TLAS over instances, an emissive-only clone for light sampling, and a
power-weighted light CDF (``src/scene.rs:21-35``, ``src/scene/light_sampler.rs``).

The TPU-first default here is **world-space flattening**: instances are baked
(rigid transform, ``model.rs:43`` guarantees no scale) into one world triangle
soup with a single SAH BVH. This removes the per-ray object-space transform
from the traversal inner loop — the right trade on a vector machine where
divergent matrix loads are expensive and HBM is plentiful. The two-level
TLAS/BLAS path (for massive instancing) is kept as a separate traversal mode
built from `path_tracer_tpu.scene.tlas`.

A ``Scene`` also always carries an environment image; "no env map" is a 1x1
constant-0.006 image, which makes the miss shader a single code path while
reproducing ``integrator.rs:256-266`` exactly (bilinear of a constant is the
constant).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from path_tracer_tpu.core.constants import DEFAULT_BACKGROUND
from path_tracer_tpu.scene import bvh as bvh_mod
from path_tracer_tpu.scene import triangle as tri_mod
from path_tracer_tpu.scene.materials import pack_materials
from path_tracer_tpu.scene.model import Model

SceneData = dict  # nested dict-of-jnp-arrays pytree handed to jitted kernels


def _build_bvh(bmin, bmax, max_leaf: int = 4):
    """Dispatch to the native C++ SAH builder when available (large meshes
    build orders of magnitude faster); both builders produce identical
    topology (cross-checked in tests/test_native.py)."""
    from path_tracer_tpu import native

    if native.available():
        return native.build_bvh(bmin, bmax, max_leaf)
    return bvh_mod.build_bvh(bmin, bmax, max_leaf)


def _pack_tris(positions: np.ndarray, normals: np.ndarray) -> dict[str, np.ndarray]:
    pre = tri_mod.precompute(positions)
    pre["normals"] = normals.astype(np.float32)
    pre["positions"] = positions.astype(np.float32)
    return pre


class Scene:
    """Host-side scene: build once, then ``.device()`` for the jitted renderer."""

    def __init__(self, models: list[Model], env: np.ndarray | None = None,
                 two_level: bool = False):
        """``two_level=True`` keeps each model's BLAS shared across instances
        and traverses TLAS->BLAS with per-instance ray transforms
        (trace/twolevel.py) instead of baking instances into one world BVH —
        the memory-scaling mode for massive instancing (the reference's only
        mode, tlas.rs:66-110). Light tables are always world-space."""
        self.models = models
        self.two_level = two_level

        world_pos, world_nrm, world_mat, world_model = [], [], [], []
        light_pos, light_nrm, light_mat, light_model = [], [], [], []

        materials = [m.material for m in models]
        mat_table = pack_materials(materials)

        for model_id, model in enumerate(models):
            emissive = bool(mat_table["is_emissive"][model_id])
            for matrix in model.matrices:
                p, n = tri_mod.transform(model.positions, model.normals, np.asarray(matrix, np.float32))
                world_pos.append(p)
                world_nrm.append(n)
                world_mat.append(np.full(p.shape[0], model_id, np.int32))
                world_model.append(np.full(p.shape[0], model_id, np.int32))
                if emissive:
                    light_pos.append(p)
                    light_nrm.append(n)
                    light_mat.append(np.full(p.shape[0], model_id, np.int32))

        world_pos = np.concatenate(world_pos)
        world_nrm = np.concatenate(world_nrm)
        world_mat = np.concatenate(world_mat)
        world_model = np.concatenate(world_model)

        # World BVH over baked triangles; reorder the soup by the builder's
        # permutation so leaves are contiguous primitive ranges.
        bmin, bmax = tri_mod.aabbs(world_pos)
        self.bvh, perm, self.bvh_depth = _build_bvh(bmin, bmax)
        from path_tracer_tpu.trace.traversal import STACK_DEPTH

        if self.bvh_depth > STACK_DEPTH:
            raise ValueError(f"BVH depth {self.bvh_depth} exceeds traversal STACK_DEPTH {STACK_DEPTH}")
        world_pos, world_nrm = world_pos[perm], world_nrm[perm]
        world_mat, world_model = world_mat[perm], world_model[perm]

        self.tri = _pack_tris(world_pos, world_nrm)
        self.tri["mat"] = world_mat
        self.tri["model"] = world_model

        # Lights: emissive triangles only (scene.rs:23-28), with their own BVH
        # for the bsdf-sampled direct-light pretest (integrator.rs:100) and a
        # power-weighted CDF (light weight = area * |emitted|, blas.rs:203-212).
        self.has_lights = len(light_pos) > 0
        if self.has_lights:
            lp = np.concatenate(light_pos)
            ln = np.concatenate(light_nrm)
            lm = np.concatenate(light_mat)
            lbmin, lbmax = tri_mod.aabbs(lp)
            self.lights_bvh, lperm, _ = _build_bvh(lbmin, lbmax)
            lp, ln, lm = lp[lperm], ln[lperm], lm[lperm]
            self.light = _pack_tris(lp, ln)
            self.light["mat"] = lm
            emitted = mat_table["emitted"][lm]
            weight = self.light["area"] * np.linalg.norm(emitted, axis=-1)
            total = weight.sum()
            pdf = (weight / total).astype(np.float32)
            self.light["emitted"] = emitted.astype(np.float32)
            self.light["pdf"] = pdf
            self.light["cdf"] = np.cumsum(pdf).astype(np.float32)
        else:
            self.lights_bvh, self.light = None, None

        self.mat = mat_table
        # Static specialization info for the integrator: which material
        # models exist and whether any medium is attached (compiled out
        # otherwise).
        self.active_mtypes = tuple(sorted(set(int(t) for t in mat_table["mtype"])))
        self.has_volumes = bool(mat_table["has_volume"].any())

        if env is None:
            env = np.full((1, 1, 3), DEFAULT_BACKGROUND, np.float32)
        self.env = np.asarray(env, np.float32)

        self.num_world_tris = world_pos.shape[0]

        if two_level:
            from path_tracer_tpu.scene.twolevel_scene import TwoLevelGeometry

            self.twolevel = TwoLevelGeometry(models)

    def device(self) -> SceneData:
        """Upload to device as a nested dict pytree of jnp arrays.

        Adds the packed row tables (`trace.traversal.pack_bvh`/`pack_tris`)
        that the traversal kernels gather from — one row fetch per step."""
        from path_tracer_tpu.scene.materials import pack_material_rows
        from path_tracer_tpu.trace.traversal import pack_bvh, pack_tris

        def up(d):
            return {k: jnp.asarray(v) for k, v in d.items()}

        data = {
            "bvh": up(self.bvh),
            "tri": up(self.tri),
            "mat": up(self.mat),
            "env": jnp.asarray(self.env),
        }
        # Large equirects fetch their bilinear footprint as ONE 12-wide row
        # gather instead of four 3-wide ones (bit-identical result, 4x HBM
        # footprint — see envmap.build_quad_table). PT_ENV_QUAD=0 reverts;
        # small envs keep the plain path (gathers there are already cheap
        # and the threshold keeps tests/tiny scenes lean).
        import os as _os

        h_env, w_env = self.env.shape[0], self.env.shape[1]
        if h_env * w_env >= 65536 and _os.environ.get("PT_ENV_QUAD", "1") != "0":
            from path_tracer_tpu.scene.envmap import build_quad_table

            data["env_quad"] = jnp.asarray(build_quad_table(self.env))
        data["bvh"]["packed"] = jnp.asarray(pack_bvh(self.bvh))
        data["tri"]["packed"] = jnp.asarray(pack_tris(self.tri))
        # Single-gather auxiliary tables for the shading stage
        data["mat"]["rows"] = jnp.asarray(pack_material_rows(self.mat))
        t = self.num_world_tris
        data["tri"]["normals_flat"] = jnp.asarray(self.tri["normals"].reshape(t, 9))
        data["tri"]["model_rows"] = jnp.asarray(
            self.tri["model"].astype(np.float32).reshape(t, 1)
        )
        if self.has_lights:
            data["lights_bvh"] = up(self.lights_bvh)
            data["light"] = up(self.light)
            data["lights_bvh"]["packed"] = jnp.asarray(pack_bvh(self.lights_bvh))
            data["light"]["packed"] = jnp.asarray(pack_tris(self.light))
            lt = self.light["d0"].shape[0]
            data["light"]["normals_flat"] = jnp.asarray(self.light["normals"].reshape(lt, 9))
            data["light"]["positions_flat"] = jnp.asarray(self.light["positions"].reshape(lt, 9))
            # NEE row table: pdf, area, emitted rgb, pad to 8
            lrows = np.zeros((lt, 8), np.float32)
            lrows[:, 0] = self.light["pdf"]
            lrows[:, 1] = self.light["area"]
            lrows[:, 2:5] = self.light["emitted"]
            data["light"]["rows"] = jnp.asarray(lrows)

        # Small scenes additionally get the gather-free DFS sweep stream —
        # the fast path on TPU (see trace/sweep.py). Large scenes stay on the
        # stack+gather traversal.
        from path_tracer_tpu.trace.sweep import (
            FLAT_STREAM_MAX_TRIS,
            UNROLL_MAX_ROWS,
            StaticStream,
            build_flat_stream,
            build_stream,
        )

        import jax

        # The fully-unrolled traversal compiles fast on the TPU toolchain but
        # pathologically slowly in CPU XLA; CPU (tests) uses the loop sweep.
        unroll_ok = jax.default_backend() != "cpu"

        def attach_stream(target, flat, tri_rows, n_tris):
            # Streams only pay off while small: measured on v5e, a ~5K-row
            # loop sweep is slower than stack+gather traversal. Beyond the
            # unrollable size, stay on the stack engine. Tiny scenes use the
            # triangle-only flat stream (no node rows — SIMD masking makes
            # BVH rows pure overhead; 113 -> 180 Mrays/s on the headline).
            if n_tris <= FLAT_STREAM_MAX_TRIS:
                rows = build_flat_stream(tri_rows)
            else:
                est_rows = 2 * flat["c0_idx"].shape[0] + n_tris
                if est_rows > 2 * UNROLL_MAX_ROWS:
                    return
                rows = build_stream(flat, tri_rows)
            if rows.shape[0] > UNROLL_MAX_ROWS:
                return
            if unroll_ok:
                # fully unrolled compile-time traversal (fastest)
                target["stream_static"] = StaticStream(rows)
            else:
                target["stream"] = jnp.asarray(rows)

        attach_stream(data["bvh"], self.bvh, np.asarray(data["tri"]["packed"]), self.num_world_tris)
        if self.has_lights:
            attach_stream(
                data["lights_bvh"], self.lights_bvh,
                np.asarray(data["light"]["packed"]), self.light["d0"].shape[0],
            )

        # Mid-size scenes without a stream use a dense engine instead of
        # gather-based stack traversal: the fused Pallas kernel
        # (trace/dense_pallas.py) on real TPUs, the XLA chunked-MXU engine
        # (trace/dense.py) elsewhere (tests/CPU).
        from path_tracer_tpu.trace.dense import DENSE_MAX_TRIS, pack_dense
        from path_tracer_tpu.trace.dense_pallas import (
            DENSE_PL_MAX_TRIS,
            pack_dense_pl,
            pack_dense_pl_aux,
            pack_dense_pl_cab,
        )
        from path_tracer_tpu.trace.dense_stream import (
            DENSE_STREAM_MAX_TRIS,
            pack_dense_stream,
        )

        import os

        from path_tracer_tpu.trace.walk import (
            WALK_MAX_TRIS,
            WALK_PARTS_MAX_TRIS,
            pack_walk,
            pack_walk_parts,
        )

        # Engine preference for BVH-scale scenes on TPU: the walk engine
        # (chunk-gated ordered traversal, trace/walk.py) replaces the O(T)
        # dense engines above the fused-kernel size; dragon-class soups
        # beyond the single-part VMEM cap stream through the multi-part
        # variant. PT_WALK=0 forces the dense engines (measurement/fallback).
        # PT_WALK_MIN overrides the lower bound (A/B: walk vs dense on
        # mid-size scenes — set 0 to force walk everywhere above the
        # compile-time streams).
        walk_min = int(os.environ.get("PT_WALK_MIN", str(DENSE_PL_MAX_TRIS)))
        # PT_WALK_FORCE=1 packs the walk engine off-TPU too (CPU interpreter
        # smoke of the exact hardware path; slow — tests/smokes only)
        want_walk = (
            (jax.default_backend() == "tpu"
             or os.environ.get("PT_WALK_FORCE", "0") != "0")
            and os.environ.get("PT_WALK", "1") != "0"
            and walk_min < self.num_world_tris <= WALK_PARTS_MAX_TRIS
        )

        def _up_tree(x):
            if isinstance(x, dict):
                return {k: _up_tree(v) for k, v in x.items()}
            if isinstance(x, tuple):
                return tuple(_up_tree(v) for v in x)
            return jnp.asarray(x)

        if "stream_static" not in data["bvh"] and "stream" not in data["bvh"]:
            if want_walk:
                packer = (pack_walk if self.num_world_tris <= WALK_MAX_TRIS
                          else pack_walk_parts)
                data["tri"]["walk"] = _up_tree(packer(
                    self.tri, self.tri["normals"].reshape(t, 9),
                    self.tri["model"], self.tri["positions"],
                ))
            elif (jax.default_backend() == "tpu"
                    and self.num_world_tris <= DENSE_PL_MAX_TRIS):
                data["tri"]["dense_pl"] = {
                    "w": jnp.asarray(pack_dense_pl(self.tri)),
                    "aux": jnp.asarray(pack_dense_pl_aux(
                        self.tri,
                        self.tri["normals"].reshape(t, 9),
                        self.tri["model"],
                    )),
                    # chunk AABBs for block-level chunk culling (tris are in
                    # SAH leaf order, so chunks are spatial clusters)
                    "cab": jnp.asarray(pack_dense_pl_cab(self.tri["positions"])),
                }
            elif (jax.default_backend() == "tpu"
                    and self.num_world_tris <= DENSE_STREAM_MAX_TRIS):
                # >16K tris: the HBM-streamed engine — ONE kernel launch
                # whose part tables double-buffer through VMEM
                # (trace/dense_stream.py); replaces the chained-parts
                # engine's per-part launch costs.
                packed_stream = pack_dense_stream(
                    self.tri, self.tri["normals"].reshape(t, 9),
                    self.tri["model"], self.tri["positions"],
                )
                # meta stays host-side: the engine derives every static size
                # from w.shape (Python ints in the pytree would become
                # tracers under the integrator's jit)
                data["tri"]["dense_stream"] = {
                    k: jnp.asarray(v)
                    for k, v in packed_stream.items() if k != "meta"
                }
            elif self.num_world_tris <= DENSE_MAX_TRIS:
                data["tri"]["dense"] = {
                    k: jnp.asarray(v) for k, v in pack_dense(self.tri).items()
                }

        if self.two_level:
            # World traversal + shading switch to the shared-BLAS tables; the
            # baked world device arrays are dropped entirely (that is the
            # memory saving), keeping only the light tables (small).
            data["twolevel"] = self.twolevel.device()
            data["bvh"] = {}
            data["tri"] = {}
        return data
