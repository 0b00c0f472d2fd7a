"""Time one wavefront bounce-iteration's pieces on TPU (mesh_scene).

Compares render_film throughput with NEE on/off and measures the while-body
cost per iteration to locate XLA-side overheads vs kernel calls.

Usage: python benches/profile_iter.py [--config mesh_scene] [--spp 8]
"""

from __future__ import annotations

import argparse, sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="mesh_scene")
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()

    from path_tracer_tpu import scenes
    from path_tracer_tpu.integrator.wavefront import render_film

    host, cam = getattr(scenes, args.config)()
    scene = host.device()
    ndc = jnp.asarray(cam.view_proj_inverse())
    org = jnp.asarray(cam.origin)
    kw = dict(max_bounces=64, mtypes=host.active_mtypes,
              any_volumes=host.has_volumes)

    for tag, extra in (
        ("full          ", {}),
        ("full spi=8    ", {"steps_per_iter": 8}),
        ("full 64K tiles", {"tile_lanes": 65536}),
        ("full spi8+64K ", {"steps_per_iter": 8, "tile_lanes": 65536}),
        ("nee-off       ", {"enable_nee": False}),
        ("bounce0+nee-  ", {"max_bounces": 0, "enable_nee": False}),
    ):
        k = dict(kw)
        k.update(extra)
        rad, rays = render_film(scene, ndc, org, 0, args.size, args.size,
                                args.spp, **k)
        rad.block_until_ready()
        t0 = time.perf_counter()
        rad, rays = render_film(scene, ndc, org, args.spp, args.size,
                                args.size, args.spp, **k)
        rad.block_until_ready()
        dt = time.perf_counter() - t0
        r = np.asarray(rays)
        print(f"{tag}: {dt*1e3:8.1f} ms  rays={r[0]/1e6:7.2f}M "
              f"-> {r[0]/dt/1e6:7.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
