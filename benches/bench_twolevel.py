"""BASELINE config 5 AS SPECIFIED: many-instance TLAS stress scene,
1920x1080 @ 1024 spp, framebuffer-tiled, TWO-LEVEL geometry (shared BLAS +
instance transforms — no world baking), fast instanced-walk engine.

Prints one JSON line per run. Full spec is ~8.5 G camera samples — use
``--spp`` to run a shorter calibrated slice (throughput is spp-invariant
past a few waves; the full-spec run is the honesty check).

Usage: python benches/bench_twolevel.py [--width 1920 --height 1080]
       [--spp 1024] [--grid 6] [--subdiv 2]
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
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--grid", type=int, default=6)
    ap.add_argument("--subdiv", type=int, default=2)
    ap.add_argument("--max-bounces", type=int, default=64)
    ap.add_argument("--scene", default="many_instance",
                    choices=["many_instance", "dragon"],
                    help="dragon = the showcase scene in TRUE two-level "
                         "form (shared ~442K-tri BLAS, multi-part iwalk)")
    args = ap.parse_args()

    import numpy as np
    import jax.numpy as jnp

    from path_tracer_tpu import scenes
    from path_tracer_tpu.integrator.wavefront import render_film
    from path_tracer_tpu.scene.scene import Scene

    if args.scene == "dragon":
        baked, cam = scenes.dragon_scene(aspect=args.width / args.height)
    else:
        baked, cam = scenes.many_instance_scene(
            grid=args.grid, subdivisions=args.subdiv,
            aspect=args.width / args.height,
        )
    scene_host = Scene(baked.models, env=baked.env, two_level=True)
    scene = scene_host.device()
    engine = "iwalk" if "iwalk" in scene.get("twolevel", {}) else "gather"
    ndc = jnp.asarray(cam.view_proj_inverse())
    org = jnp.asarray(cam.origin)
    kw = dict(max_bounces=args.max_bounces, mtypes=scene_host.active_mtypes,
              any_volumes=scene_host.has_volumes)

    # warmup/compile (1 spp), then the timed run; sync INSIDE the timed
    # region via host transfer of the rays counter (block_until_ready lies
    # on this tunneled platform — see bench.py)
    _, rays = render_film(scene, ndc, org, 0, args.width, args.height, 1, **kw)
    np.asarray(rays)
    t0 = time.perf_counter()
    rad, rays = render_film(
        scene, ndc, org, 1, args.width, args.height, args.spp, **kw
    )
    rays = np.asarray(rays)
    dt = time.perf_counter() - t0
    rad = np.asarray(rad)
    assert np.isfinite(rad).all()
    total, strict = float(rays[0]), float(rays[1])
    iw = scene.get("twolevel", {}).get("iwalk", {})
    if engine == "iwalk":
        first = (iw.get("parts") or (iw,))[0]
        engine = "vwalk" if "vinst" in first else "iwalk"
        if "parts" in iw:
            engine += "-parts"
    print(json.dumps({
        "config": f"{args.scene}_twolevel",
        "engine": engine,
        "size": f"{args.width}x{args.height}",
        "spp": args.spp,
        "instances": scene_host.twolevel.num_instances,
        "mrays_per_s": round(total / dt / 1e6, 2),
        "mrays_per_s_strict": round(strict / dt / 1e6, 2),
        "spp_per_s": round(args.spp / dt, 3),
        "seconds": round(dt, 2),
        "mean": float(rad.mean() / args.spp),
    }), flush=True)


if __name__ == "__main__":
    main()
