"""Throughput across all BASELINE configs. One JSON line per config.

Usage: ``python benches/bench_all.py [--size 512] [--spp 16]``
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--max-bounces", type=int, default=64)
    ap.add_argument("--extended", action="store_true",
                    help="also bench dragon_scene (885K tris, multi-part "
                         "walk) and env_sphere_scene at a 4K-class env map")
    ap.add_argument("--only", default=None,
                    help="bench a single config by name (cheap knob A/Bs); "
                         "implies --extended availability for dragon_scene/"
                         "env_sphere_4k")
    args = ap.parse_args()

    names = [
        "cornell_diffuse", "cornell_specular", "cornell_volume",
        "mesh_scene", "many_instance_scene",
    ]
    if args.extended:
        # the reference's showcase scale (main.rs:100-117) + its 4K env
        # (main.rs:75): dragon-class soup through the multi-part walk
        # engine and the equirect miss shader at full table size
        names += ["dragon_scene", "env_sphere_4k"]
    if args.only:
        allowed = names + ["dragon_scene", "env_sphere_4k"]
        if args.only not in allowed:
            # validated BEFORE the jax/package imports: importing the
            # package initializes the backend, which needs a live tunnel
            raise SystemExit(f"unknown config {args.only!r}; choose from {allowed}")
        names = [args.only]

    import numpy as np
    import jax
    import jax.numpy as jnp

    from path_tracer_tpu import scenes
    from path_tracer_tpu.integrator.wavefront import render_film

    def env_sphere_4k(aspect=1.0):
        return scenes.env_sphere_scene(env_size=2048, aspect=aspect)

    for name in names:
        builder = env_sphere_4k if name == "env_sphere_4k" else getattr(scenes, name)
        scene_host, cam = builder()
        scene = scene_host.device()
        ndc = jnp.asarray(cam.view_proj_inverse())
        org = jnp.asarray(cam.origin)
        kw = dict(
            max_bounces=args.max_bounces, mtypes=scene_host.active_mtypes,
            any_volumes=scene_host.has_volumes,
            has_lights=scene_host.has_lights,
            enable_nee=scene_host.has_lights,
        )

        # the TPU tunnel faults transiently; retry each config independently
        def attempt():
            # HONESTY NOTE: on this tunneled TPU platform block_until_ready
            # returns before execution finishes (measured 2026-08-17); only a
            # host transfer (np.asarray) truly synchronizes. Sync on the tiny
            # rays counter INSIDE the timed region, exactly like bench.py.
            rad, rays = render_film(scene, ndc, org, 0, args.size, args.size, args.spp, **kw)
            np.asarray(rays)
            t0 = time.perf_counter()
            rad, rays = render_film(scene, ndc, org, args.spp, args.size, args.size, args.spp, **kw)
            rays = np.asarray(rays)
            return rad, rays, time.perf_counter() - t0

        rad = None
        for retry in range(4):
            try:
                rad, rays, dt = attempt()
                break
            except Exception as e:
                print(f"# {name}: device error {type(e).__name__}, retry {retry + 1}/4",
                      flush=True)
                time.sleep(150)
        if rad is None:
            print(json.dumps({"config": name, "error": "device unavailable"}), flush=True)
            continue
        if "stream_static" in scene["bvh"]:
            engine = "sweep-static"
        elif "stream" in scene["bvh"]:
            engine = "sweep-loop"
        elif "walk" in scene["tri"]:
            engine = ("walk-parts" if "parts" in scene["tri"]["walk"]
                      else "walk")
        elif "dense_stream" in scene["tri"]:
            engine = "dense-stream"
        elif "dense_pl" in scene["tri"]:
            engine = "dense-pallas"
        elif "dense" in scene["tri"]:
            engine = "dense-mxu"
        else:
            engine = "stack-gather"
        rays = np.asarray(rays)
        print(json.dumps({
            "config": name,
            "tris": scene_host.num_world_tris,
            "engine": engine,
            "mrays_per_s": round(float(rays[0]) / dt / 1e6, 2),
            "mrays_per_s_strict": round(float(rays[1]) / dt / 1e6, 2),
            "spp_per_s": round(args.spp / dt, 3),
            "mean_radiance": round(float(np.asarray(rad).mean()) / args.spp, 5),
        }), flush=True)


if __name__ == "__main__":
    main()
