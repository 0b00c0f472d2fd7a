"""Materialize real on-disk assets and a JSON scene that uses them.

The reference's showcase loads its geometry and environment from real files
— ``dragon.obj`` via the OBJ parser (``src/main.rs:100-117``,
``src/tlas/tlas_bvh/blas.rs:44-131``) and a PNG env map via the image loader
(``src/main.rs:75``, ``src/image_helper.rs:25-33``). This script writes the
equivalent assets to ``assets/``:

* ``assets/knot.obj``       — a dragon-class procedural mesh as a REAL
                              Wavefront OBJ (v/vn/f records),
* ``assets/sky.png``        — the synthetic 4K-class sky as a REAL PNG
                              (8-bit; the loader linearizes with gamma 2.2),
* ``assets/asset_scene.json`` — a scene description referencing both by
                              path, plus a camera block.

Render it end-to-end through the file loaders with::

    python benches/make_assets.py            # write the assets
    python -m path_tracer_tpu.cli --scene assets/asset_scene.json \
        --width 512 --height 288 --spp 32 --out renders/asset_scene.png

``--nu/--nv`` control mesh density (default 96x36 = 6,912 tris keeps the
checked-in OBJ small; pass 768x288 for the full 442K-tri dragon class).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nu", type=int, default=96)
    ap.add_argument("--nv", type=int, default=36)
    ap.add_argument("--env-h", type=int, default=256)
    ap.add_argument("--outdir", default="assets")
    args = ap.parse_args()

    from path_tracer_tpu.scene import objio, procedural
    from path_tracer_tpu.scene.envmap import save_image
    from path_tracer_tpu.scenes import procedural_sky

    os.makedirs(args.outdir, exist_ok=True)

    pos, nrm = procedural.knot(scale=42.0, nu=args.nu, nv=args.nv)
    obj_path = os.path.join(args.outdir, "knot.obj")
    objio.save_obj(obj_path, pos, nrm)
    print(f"wrote {obj_path}: {pos.shape[0]} tris")

    # procedural_sky returns gamma-encoded values sized for the 2.2 loader
    # round-trip; clip to the 8-bit PNG range (the sun disk saturates, as it
    # would in any 8-bit source image)
    sky = np.clip(procedural_sky(args.env_h), 0.0, 1.0)
    png_path = os.path.join(args.outdir, "sky.png")
    save_image(png_path, sky)
    print(f"wrote {png_path}: {sky.shape[1]}x{sky.shape[0]}")

    scene = {
        "env": f"{args.outdir}/sky.png",
        "camera": {
            "origin": [0.0, 277.5, 1300.0],
            "look_at": [0.0, 277.5, 0.0],
            "fov": 60.0,
        },
        "models": [
            {
                "primitive": {"type": "cornell_walls"},
                "material": {"type": "lambertian", "albedo": [0.73, 0.73, 0.73]},
            },
            {
                "primitive": {"type": "cornell_light"},
                "material": {"type": "emissive", "emitted": [15.0, 15.0, 15.0]},
            },
            {
                "obj": f"{args.outdir}/knot.obj",
                "material": {"type": "ggx_metal", "colour": [0.9, 0.6, 0.3],
                             "roughness": 0.25},
                "instances": [
                    {"rotation_y": 0.7, "translation": [-120.0, 160.0, -20.0]},
                    {"rotation_y": 2.3, "translation": [130.0, 390.0, 40.0]},
                ],
            },
        ],
    }
    json_path = os.path.join(args.outdir, "asset_scene.json")
    with open(json_path, "w") as f:
        json.dump(scene, f, indent=2)
    print(f"wrote {json_path}")


if __name__ == "__main__":
    main()
