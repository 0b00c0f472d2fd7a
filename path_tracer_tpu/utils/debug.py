"""Debug-mode validation: the framework's analog of the reference's
``debug_assert!`` layer (SURVEY.md §4/§5).

The reference sprinkles debug-build invariants through the hot path (ray
normalization ``ray.rs:12``, AABB ordering ``boundingbox.rs:42``, ONB
orthonormality ``onb.rs:3``, Sobol range ``sampling.rs:110``, tonemap
parameter ranges ``tonemapping.rs:70-73``). In a pure-functional JAX renderer
there is no shared mutable state to race on; what remains worth checking is
data validity, so debug mode validates (a) the scene at build time, and
(b) renderer outputs after a wave. All checks are host-side and zero-cost
when not invoked.
"""

from __future__ import annotations

import numpy as np


class SceneValidationError(AssertionError):
    pass


def _check(cond: bool, msg: str):
    if not cond:
        raise SceneValidationError(msg)


def validate_scene(scene_host) -> None:
    """Structural invariants of a built `scene.Scene`."""
    bvh = scene_host.bvh
    t = scene_host.num_world_tris

    # AABB ordering (boundingbox.rs:42) for every real child
    for c in ("c0", "c1"):
        valid = bvh[f"{c}_count"] != -1
        _check(
            bool((bvh[f"{c}_min"][valid] <= bvh[f"{c}_max"][valid] + 1e-6).all()),
            f"{c} AABB min > max",
        )

    # Leaves cover each primitive exactly once
    seen = np.zeros(t, np.int64)
    for c in ("c0", "c1"):
        for i in range(bvh[f"{c}_idx"].shape[0]):
            count = int(bvh[f"{c}_count"][i])
            if count > 0:
                seen[int(bvh[f"{c}_idx"][i]) : int(bvh[f"{c}_idx"][i]) + count] += 1
    _check(bool((seen == 1).all()), "BVH leaves do not partition primitives")

    # Triangle data finite; shading normals non-degenerate
    for key in ("n0", "n1", "n2", "d0", "d1", "d2"):
        _check(bool(np.isfinite(scene_host.tri[key]).all()), f"non-finite tri field {key}")
    nrm = scene_host.tri["normals"].reshape(-1, 3)
    _check(bool((np.linalg.norm(nrm, axis=-1) > 0).all()), "zero-length shading normal")

    # Light CDF monotone, ends at ~1 (light_sampler.rs:41-61)
    if scene_host.has_lights:
        cdf = scene_host.light["cdf"]
        _check(bool((np.diff(cdf) >= -1e-7).all()), "light CDF not monotone")
        _check(abs(float(cdf[-1]) - 1.0) < 1e-4, "light CDF does not end at 1")
        _check(bool((scene_host.light["pdf"] >= 0).all()), "negative light pdf")

    # Material parameter ranges (material.rs:294: a in [1e-4, 0.9999])
    mat = scene_host.mat
    ggx = (mat["mtype"] == 3) | (mat["mtype"] == 4)
    if ggx.any():
        a = mat["ggx_a"][ggx]
        _check(bool(((a >= 1e-4) & (a <= 0.9999)).all()), "GGX alpha out of range")
    _check(bool((mat["ior"] > 0).all()), "non-positive IOR")

    # Environment image positive-size, finite
    _check(np.isfinite(scene_host.env).all(), "non-finite environment texels")


def validate_render_outputs(radiance, position, first_id, rays) -> None:
    """Post-wave output invariants (integrator.rs:272-280 guarantees)."""
    rad = np.asarray(radiance)
    _check(bool(np.isfinite(rad).all()), "non-finite radiance escaped the sample guard")
    _check(bool((rad >= 0).all()), "negative radiance")
    _check(bool(np.isfinite(np.asarray(position)).all()), "non-finite position buffer")
    _check(bool((np.asarray(rays) >= 0).all()), "negative ray count")


def debug_render(scene_host, camera, width, height, spp=1, **kw):
    """Render with scene + output validation; returns the film like
    `integrator.render`."""
    import jax.numpy as jnp

    from path_tracer_tpu.integrator.wavefront import render_sample

    validate_scene(scene_host)
    scene = scene_host.device()
    rad, pos, fid, rays = render_sample(
        scene,
        jnp.asarray(camera.view_proj_inverse()),
        jnp.asarray(camera.origin),
        0,
        width,
        height,
        spp=spp,
        mtypes=scene_host.active_mtypes,
        any_volumes=scene_host.has_volumes,
        has_lights=scene_host.has_lights,
        **kw,
    )
    validate_render_outputs(rad, pos, fid, rays)
    film = jnp.concatenate(
        [rad, jnp.full((rad.shape[0], 1), spp, jnp.float32)], axis=1
    ).reshape(height, width, 4)
    return film


def validate_walk_engine(eng, num_tris: int) -> None:
    """Structural invariants of a packed walk/iwalk engine (host numpy or
    device dict; multi-part engines validate every part). Debug-assert
    analog for the chunk-table engines (trace/walk.py, trace/iwalk.py)."""
    import numpy as np

    def a(x):
        return np.asarray(x)

    parts = eng.get("parts") or (eng,)
    for pi, part in enumerate(parts):
        w = a(part["w"])
        _check(bool(np.isfinite(w).all()), f"part {pi}: non-finite plane table")
        k = w.shape[1] // 256
        cb = a(part["cb_oct"])
        ords = a(part["ord_oct"])
        for o in range(8):
            lo, hi = cb[o, 0:3], cb[o, 3:6]
            real = (lo < 1.0e30).all(axis=0)
            _check(bool((lo[:, real] <= hi[:, real] + 1e-5).all()),
                   f"part {pi} octant {o}: gate box min > max")
            ent = ords[o][: int(real.sum())]
            _check(len(np.unique(ent)) == len(ent),
                   f"part {pi} octant {o}: duplicate visit entries")
            _check(bool((ords[o] >= 0).all()) and bool((ords[o] < max(k, ords[o].max() + 1)).all()),
                   f"part {pi} octant {o}: visit index out of range")
        if "inst_c" in part:
            ic = a(part["inst_c"])
            _check(bool((ic[:, 0] <= ic[:, 1]).all()) and bool((ic >= 0).all())
                   and bool((ic[:, 1] <= k).all()),
                   f"part {pi}: instance chunk ranges out of bounds")
        if "cb_lay" in part:
            # the layout table must be the un-permutation of every octant's
            # permuted table (the two mask-build paths gate the same boxes)
            cl = a(part["cb_lay"])
            pv = a(part["pos_valid"])
            kr = int(pv.sum())
            _check(bool(pv[:kr].all()) and not bool(pv[kr:].any()),
                   f"part {pi}: pos_valid is not a prefix")
            for o in range(8):
                _check(bool((cb[o][:, :kr] == cl[:, ords[o][:kr]]).all()),
                       f"part {pi} octant {o}: cb_lay/cb_oct mismatch")
        if "vinst" in part:
            ni = a(part["inst_f"]).shape[0]
            pv = a(part["pos_valid"])
            kr = int(pv.sum())
            vi, vc, vg = a(part["vinst"]), a(part["vchunk"]), a(part["vglob"])
            lay = np.zeros(kr, np.int64)
            lay[:] = -1
            # every real octant-order rank points at a distinct layout slot
            slots = np.sort(ords[0][:kr])
            _check(bool((slots == np.arange(kr)).all()),
                   f"part {pi}: vwalk order is not a permutation of slots")
            _check(bool((vi[:kr] >= 0).all()) and bool((vi[:kr] < ni).all()),
                   f"part {pi}: vinst out of range")
            _check(bool((vc[:kr] >= 0).all()) and bool((vc[:kr] < k).all()),
                   f"part {pi}: vchunk out of local w range")
            nglob = a(eng["aux"]).shape[0] // 128
            _check(bool((vg[:kr] >= 0).all()) and bool((vg[:kr] < nglob).all()),
                   f"part {pi}: vglob out of the aux table")
    om = a(eng["origmap"])
    _check(bool((om >= 0).all()) and bool((om < num_tris).all()),
           "origmap outside the triangle soup")
    _check(bool(np.isfinite(a(eng["aux"])).all()), "non-finite aux rows")
