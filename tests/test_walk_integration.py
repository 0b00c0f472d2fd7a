"""Walk engine through the FULL wavefront integrator (CPU interpreter).

scene.device() only selects the walk engine on real TPUs; here we force the
packed walk tables into a device scene and render a small film, checking it
against the default CPU engine for the same scene/seeds. The traversal
engine is an implementation detail — radiance must agree to Monte-Carlo
noise (identical seeds, same estimator, only knife-edge FMA rounding may
flip a handful of paths).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from path_tracer_tpu import scenes
from path_tracer_tpu.integrator.wavefront import render_film
from path_tracer_tpu.trace import walk


def _render(scene, scene_host, cam, w, h, spp):
    ndc = jnp.asarray(cam.view_proj_inverse())
    org = jnp.asarray(cam.origin)
    rad, rays = render_film(
        scene, ndc, org, 0, w, h, spp,
        max_bounces=16, enable_nee=True, has_lights=True,
        mtypes=scene_host.active_mtypes,
        any_volumes=scene_host.has_volumes,
    )
    return np.asarray(rad) / spp


def test_walk_engine_through_integrator():
    scene_host, cam = scenes.mesh_scene(subdivisions=4)
    scene_ref = scene_host.device()
    assert "walk" not in scene_ref["tri"]  # CPU backend default
    img_ref = _render(scene_ref, scene_host, cam, 64, 64, 4)

    t = scene_host.num_world_tris
    scene_walk = scene_host.device()
    scene_walk["tri"]["walk"] = {
        k: jnp.asarray(v)
        for k, v in walk.pack_walk(
            scene_host.tri, scene_host.tri["normals"].reshape(t, 9),
            scene_host.tri["model"], scene_host.tri["positions"],
        ).items()
    }
    img_walk = _render(scene_walk, scene_host, cam, 64, 64, 4)

    # identical seeds + same estimator: images agree except for knife-edge
    # FMA-rounding path flips (a handful of pixels at most)
    diff = np.abs(img_walk - img_ref).max(axis=-1)
    frac_same = float((diff < 1e-5).mean())
    assert frac_same > 0.98, frac_same
    assert abs(img_walk.mean() - img_ref.mean()) < 0.01 * max(img_ref.mean(), 1e-6)


def test_iwalk_engine_through_integrator():
    """Two-level mode: the instanced-walk engine vs the gather-based
    TLAS/BLAS phase machine on the many-instance scene. Different traversal
    implementations of the same geometry — same seeds, same estimator;
    only FMA-rounding path flips may differ."""
    from path_tracer_tpu.scene.scene import Scene
    from path_tracer_tpu.trace import iwalk

    scene_host, cam = scenes.many_instance_scene(grid=3, subdivisions=1)
    two = Scene(scene_host.models, two_level=True)
    scene_ref = two.device()
    assert "iwalk" not in scene_ref["twolevel"]  # CPU backend default
    img_ref = _render(scene_ref, two, cam, 48, 48, 4)

    scene_fast = two.device()
    scene_fast["twolevel"]["iwalk"] = {
        k: jnp.asarray(v) for k, v in iwalk.pack_iwalk(two.models).items()
    }
    img_fast = _render(scene_fast, two, cam, 48, 48, 4)

    diff = np.abs(img_fast - img_ref).max(axis=-1)
    frac_same = float((diff < 1e-4).mean())
    assert frac_same > 0.97, frac_same
    assert abs(img_fast.mean() - img_ref.mean()) < 0.01 * max(img_ref.mean(), 1e-6)


def test_walk_parts_engine_through_integrator():
    """Multi-part walk (dragon-scale path) through the FULL integrator on a
    toy dragon: NEE shadow any-hit, volumes, env misses — all through the
    part loop with carried t-windows."""
    scene_host, cam = scenes.dragon_scene(nu=48, nv=24, env_h=32)
    scene_ref = scene_host.device()
    img_ref = _render(scene_ref, scene_host, cam, 48, 48, 2)

    t = scene_host.num_world_tris
    eng_np = walk.pack_walk_parts(
        scene_host.tri, scene_host.tri["normals"].reshape(t, 9),
        scene_host.tri["model"], scene_host.tri["positions"],
        part_cap=1024,
    )
    assert len(eng_np["parts"]) >= 3

    def up(x):
        if isinstance(x, dict):
            return {k: up(v) for k, v in x.items()}
        if isinstance(x, tuple):
            return tuple(up(v) for v in x)
        return jnp.asarray(x)

    scene_walk = scene_host.device()
    scene_walk["tri"]["walk"] = up(eng_np)
    img_walk = _render(scene_walk, scene_host, cam, 48, 48, 2)

    diff = np.abs(img_walk - img_ref).max(axis=-1)
    frac_same = float((diff < 1e-4).mean())
    assert frac_same > 0.97, frac_same
    assert abs(img_walk.mean() - img_ref.mean()) < 0.01 * max(img_ref.mean(), 1e-6)
