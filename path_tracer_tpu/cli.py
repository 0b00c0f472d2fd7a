"""Command-line renderer: ``python -m path_tracer_tpu.cli [...]``.

Replaces the reference's recompile-to-configure workflow (SURVEY.md §1: "no
CLI, no config files — the API is editing constants in main.rs"). Supports
the built-in procedural scenes or a JSON scene file, progressive rendering
with periodic checkpoints, and resumable renders.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native path tracer")
    p.add_argument("--scene", default="cornell_diffuse",
                   help="named scene (cornell_diffuse, cornell_specular, cornell_volume, "
                        "mesh_scene, many_instance_scene, env_sphere_scene) or a .json scene file")
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--height", type=int, default=576)
    p.add_argument("--spp", type=int, default=64)
    p.add_argument("--max-bounces", type=int, default=64)
    p.add_argument("--no-nee", action="store_true", help="disable next-event estimation")
    p.add_argument("--fov", type=float, default=40.0)
    p.add_argument("--aperture", type=float, default=0.0,
                   help="thin-lens diameter in world units (0 = pinhole)")
    p.add_argument("--focus", type=float, default=0.0,
                   help="focus distance (0 = the scene's look-at distance)")
    p.add_argument("--out", default="render.png")
    p.add_argument("--checkpoint", default=None, help="checkpoint .npz path (resume if exists)")
    p.add_argument("--checkpoint-every", type=int, default=0)
    p.add_argument("--multichip", action="store_true", help="tile film across all devices")
    p.add_argument("--two-level", action="store_true",
                   help="keep shared BLASes + instance transforms (TLAS/BLAS "
                        "traversal) instead of baking instances to world")
    p.add_argument("--profile-dir", default=None, help="jax.profiler trace output dir")
    p.add_argument("--retries", type=int, default=2,
                   help="device-error retries per batch (checkpoint + backoff); "
                        "TPU tunnels can fault transiently")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp

    from path_tracer_tpu import scenes
    from path_tracer_tpu.camera import Camera
    from path_tracer_tpu.film import load_checkpoint, resolve, save_checkpoint, save_png
    from path_tracer_tpu.integrator.wavefront import render_sample
    from path_tracer_tpu.utils.config import load_scene_json
    from path_tracer_tpu.utils.profiling import PhaseTimer, RayRateMeter, device_trace

    timers = PhaseTimer()
    aspect = args.width / args.height
    with timers.phase("scene build"):
        if args.scene.endswith(".json"):
            from path_tracer_tpu.utils.config import load_camera_json

            scene_host = load_scene_json(args.scene)
            cam = load_camera_json(args.scene, aspect) or Camera(
                (0.0, 277.5, 1300.0), (0.0, 277.5, 0.0), fov=args.fov,
                aspect_ratio=aspect)
        else:
            scene_host, cam = getattr(scenes, args.scene)(aspect=aspect)
        if args.two_level and not scene_host.two_level:
            from path_tracer_tpu.scene.scene import Scene

            scene_host = Scene(scene_host.models, env=scene_host.env,
                               two_level=True)

    with timers.phase("upload"):
        scene = scene_host.device()
    has_lights = "light" in scene
    ndc = jnp.asarray(cam.view_proj_inverse())
    org = jnp.asarray(cam.origin)

    start = 0
    film = jnp.zeros((args.height, args.width, 4), jnp.float32)
    if args.checkpoint and os.path.exists(args.checkpoint):
        film, start = load_checkpoint(args.checkpoint)
        print(f"resumed at sample {start}")

    meter = RayRateMeter()
    mesh = None
    if args.multichip:
        from path_tracer_tpu.parallel.mesh import make_mesh, render_sample_sharded

        mesh = make_mesh()

    mtypes = scene_host.active_mtypes
    any_volumes = scene_host.has_volumes
    aperture = args.aperture if args.aperture > 0 else getattr(cam, "aperture", 0.0)
    focus = args.focus or getattr(cam, "focus_distance", 0.0)
    lens = dict(aperture=aperture, focus=focus,
                cam_basis=jnp.asarray(cam.matrix[:, :3])) if aperture > 0 else {}
    batch = max(1, min(32, args.checkpoint_every or 32))

    def trace_batch(s, cur):
        if mesh is not None:
            rad, rays = render_sample_sharded(
                scene, ndc, org, s, args.width, args.height, mesh,
                max_bounces=args.max_bounces, enable_nee=not args.no_nee,
                has_lights=has_lights, spp=cur, mtypes=mtypes,
                any_volumes=any_volumes,
            )
        else:
            rad, _, _, rays = render_sample(
                scene, ndc, org, s, args.width, args.height,
                max_bounces=args.max_bounces, enable_nee=not args.no_nee,
                has_lights=has_lights, spp=cur, mtypes=mtypes,
                any_volumes=any_volumes, **lens,
            )
        rad.block_until_ready()
        return rad, rays

    with device_trace(args.profile_dir):
        s = start
        while s < args.spp:
            cur = min(batch, args.spp - s)
            # Failure resilience: TPU device errors are transient (tunnel
            # resets, preemptions); checkpoint, back off, and retry the batch.
            # Samples are pure functions of (lane, sample id), so a retried
            # batch reproduces exactly what the lost one would have added.
            attempt = 0
            while True:
                try:
                    with meter.measure(0.0):
                        rad, rays = trace_batch(s, cur)
                    break
                except Exception as e:  # jax.errors.JaxRuntimeError and kin
                    attempt += 1
                    if attempt > args.retries:
                        if args.checkpoint:
                            save_checkpoint(args.checkpoint, film, s)
                            print(f"device error after {attempt} attempts; "
                                  f"progress saved at sample {s}")
                        raise
                    if args.checkpoint:
                        save_checkpoint(args.checkpoint, film, s)
                    print(f"device error ({type(e).__name__}), retry {attempt}/{args.retries}...")
                    time.sleep(30.0 * attempt)
            meter.rays += float(rays[..., 0].sum())  # col 0 = all-queries count
            meter.samples += cur
            frame = jnp.concatenate([rad, jnp.full((rad.shape[0], 1), cur, jnp.float32)], axis=1)
            film = film + frame.reshape(args.height, args.width, 4)
            s += cur
            if args.checkpoint and args.checkpoint_every:
                save_checkpoint(args.checkpoint, film, s)

    if args.checkpoint:
        save_checkpoint(args.checkpoint, film, args.spp)
    save_png(args.out, film)
    print(json.dumps({
        "out": args.out, "spp": args.spp,
        "mrays_per_s": round(meter.mrays_per_s, 2),
        "spp_per_s": round(meter.spp_per_s, 3),
    }))
    print(timers.report())


if __name__ == "__main__":
    main()
