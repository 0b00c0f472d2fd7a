"""Interactive progressive-rendering session: the reference's frame loop.

Headless equivalent of ``State``/``run()`` (``src/state.rs:505-586``,
``src/main.rs:141-224``): each ``frame()`` traces 1 sample/pixel, then either

* camera static  -> progressive accumulation (``accumulate.wgsl`` path), or
* camera moved   -> velocity + temporal reprojection (``velocity.wgsl`` +
  ``compute.wgsl`` path), restarting accumulation from the reprojected
  history,

and ``display()`` returns the tonemapped frame (``shader.wgsl``). WASD/mouse
input maps to ``Camera.update_origin`` / ``update_rotation``
(``camera.rs:33-92``). There is no OS window in this framework build; callers
get frames as arrays (save them, stream them, or wire them to any UI).
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax.numpy as jnp

from path_tracer_tpu.camera import Camera
from path_tracer_tpu.integrator.wavefront import (
    SegmentPredictor,
    render_sample,
    render_sample_segmented,
)
from path_tracer_tpu.interactive import taa

# Dead-lane segmented compaction (r4): at 1 spp/frame pinned, a terminated
# lane otherwise rides the full-film bounce loop to the all-dead exit —
# measured 15.3 s/frame at 1024x576 on cornell_specular (RESULTS_r4.md).
# Bit-identical output (tests/test_interactive.py); knob for A/B only.
_SEGMENTED = os.environ.get("PT_INTERACTIVE_SEG", "1") != "0"


class InteractiveRenderer:
    def __init__(
        self,
        scene_host,
        camera: Camera,
        width: int,
        height: int,
        max_bounces: int = 64,
        enable_nee: bool = True,
        mesh=None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` — frames trace
        tile-sharded across its devices (``parallel.mesh.
        frame_segmented_sharded``), the multi-chip interactive mode. The
        TAA/display stages run on the gathered film (one ~film-sized
        all-gather per frame over ICI)."""
        self.scene = scene_host.device() if hasattr(scene_host, "device") else scene_host
        self.has_lights = "light" in self.scene
        # static scene specialization (compile only the materials present)
        from path_tracer_tpu.integrator import bsdf as _bsdf

        self.mtypes = getattr(scene_host, "active_mtypes", _bsdf.ALL_MTYPES)
        self.any_volumes = getattr(scene_host, "has_volumes", True)
        self.camera = camera
        self.width = width
        self.height = height
        self.max_bounces = max_bounces
        self.enable_nee = enable_nee
        self.mesh = mesh

        self.accumulation = jnp.zeros((height, width, 4), jnp.float32)
        self.ids = jnp.zeros((height, width), jnp.uint32)
        self.sample = 0
        self.last_world_to_clip = np.asarray(camera.world_to_clip())
        self._camera_moved = False
        # temporal segment-schedule prediction (PT_SEG_PREDICT): steady-state
        # frames run the whole segment chain from last frame's observed
        # alive counts with one end-of-frame validity read instead of one
        # count-read per segment (each a ~24 ms tunnel roundtrip)
        self._predictor = SegmentPredictor()

    # -- input events (main.rs:147, camera.rs:55-92) --

    def key(self, key: str, dt: float) -> None:
        moves = {"w": (0.0, 1.0), "s": (0.0, -1.0), "a": (-1.0, 0.0), "d": (1.0, 0.0)}
        if key.lower() in moves:
            dx, dz = moves[key.lower()]
            self.camera.update_origin(dx, dz, dt)
            self._camera_moved = True

    def mouse(self, dx: float, dy: float, dt: float) -> None:
        self.camera.update_rotation(dx, dy, dt)
        self._camera_moved = True

    # -- frame loop (main.rs:179-218, state.rs:557-586) --

    def frame(self) -> None:
        h, w = self.height, self.width
        if self.mesh is not None:
            from path_tracer_tpu.parallel.mesh import frame_segmented_sharded

            entry = partial(frame_segmented_sharded, mesh=self.mesh,
                            predictor=self._predictor)
        elif _SEGMENTED:
            entry = partial(render_sample_segmented,
                            predictor=self._predictor)
        else:
            entry = render_sample
        rad, pos, fid, _ = entry(
            self.scene,
            jnp.asarray(self.camera.view_proj_inverse()),
            jnp.asarray(self.camera.origin),
            self.sample,
            w,
            h,
            max_bounces=self.max_bounces,
            enable_nee=self.enable_nee,
            has_lights=self.has_lights,
            mtypes=self.mtypes,
            any_volumes=self.any_volumes,
        )
        colour = jnp.concatenate([rad, jnp.ones((rad.shape[0], 1), jnp.float32)], axis=1)
        colour = colour.reshape(h, w, 4)
        position = pos.reshape(h, w, 4)

        # one fused program per mode (taa.frame_update_*): id packing,
        # velocity, and reprojection/accumulation compile together, so the
        # intermediates never round-trip HBM between dispatches
        if self._camera_moved:
            self.ids, self.accumulation = taa.frame_update_moving(
                self.ids, self.accumulation, colour, fid.reshape(h, w),
                position, jnp.asarray(self.last_world_to_clip))
            self._camera_moved = False
        else:
            self.ids, self.accumulation = taa.frame_update_static(
                self.ids, self.accumulation, colour, fid.reshape(h, w))

        self.last_world_to_clip = np.asarray(self.camera.world_to_clip())
        self.sample += 1

    def resize(self, width: int, height: int) -> None:
        """Surface resize (state.rs:74-118 reconfigure): rebuild the
        projection for the new aspect, drop the accumulation/id history
        (stale reprojection sources), restart progressive sampling."""
        if width == self.width and height == self.height:
            return
        self.width, self.height = width, height
        self.camera.set_aspect(width / height)
        self.accumulation = jnp.zeros((height, width, 4), jnp.float32)
        self.ids = jnp.zeros((height, width), jnp.uint32)
        self.sample = 0
        self.last_world_to_clip = np.asarray(self.camera.world_to_clip())
        self._camera_moved = False

    def display(self, as_uint8: bool = False) -> np.ndarray:
        """Tonemapped [H,W,3] frame, image-row order (top first).

        ``as_uint8``: quantize to uint8 ON DEVICE before the host readback —
        the handoff a real swapchain takes, and 4× less device→host traffic
        (a measured slice of the frame budget on the tunneled platform).
        Default returns float32 in [0,1]."""
        if as_uint8:
            return np.asarray(taa.display_frame_u8(self.accumulation))[::-1]
        return np.asarray(taa.display_frame(self.accumulation))[::-1]

    def display_device(self, as_uint8: bool = False):
        """Tonemapped frame as a DEVICE array (bottom-row-first layout; flip
        with ``[::-1]`` after fetching). The double-buffered present path: a
        swapchain-style loop dispatches this, starts the host copy with
        ``.copy_to_host_async()``, and overlaps the d2h with the NEXT
        frame's trace — the reference's ``present()`` likewise never blocks
        the next frame's encoding (state.rs:505-586)."""
        fn = taa.display_frame_u8 if as_uint8 else taa.display_frame
        return fn(self.accumulation)
