"""Progressive accumulation + TAA-style temporal reprojection, as jitted ops.

Port of the reference's four WGSL pipelines (``src/shaders/``) into jnp image
ops on ``[H, W, C]`` device arrays — on TPU these fuse into the same XLA
program as the integrator instead of being separate GPU dispatches
(SURVEY.md §2 "CPU->GPU pipeline parallelism" row).

* `accumulate` — ``accumulate.wgsl``: output = accumulation + (rgb, 1); the
  sample count lives in alpha.
* `compute_velocity` — ``velocity.wgsl``: screen-space motion vectors from
  the position buffer reprojected through the previous frame's world->clip.
* `temporal_reproject` — ``compute.wgsl``: 3x3 YCoCg neighborhood statistics,
  velocity dilation, Catmull-Rom history fetch, variance clipping
  (mu ± gamma*sigma), 0.15 blend, and 16-bit-model-id disocclusion fallback
  to a 2x2 box filter.
* `display_frame` — ``shader.wgsl``: rgb/alpha + Gran Turismo tonemap.

Reference quirks preserved: the closest-depth velocity dilation reads depth
from the *colour* texture's alpha, which the integrator always writes as 1.0
(``integrator.rs:274``), so the dilation degenerates to picking the top-left
valid neighbor — reproduced by iterating in the same order with strict
less-than.
"""

from __future__ import annotations

import jax
import jax as _jax
import jax.numpy as jnp

from path_tracer_tpu.core.tonemap import gt_tonemap


@_jax.jit
def accumulate(accumulation: jnp.ndarray, colour: jnp.ndarray) -> jnp.ndarray:
    """``accumulate.wgsl``: add (rgb, 1) to the running accumulation [H,W,4]."""
    rgb = colour[..., :3]
    ones = jnp.ones_like(rgb[..., :1])
    return accumulation + jnp.concatenate([rgb, ones], axis=-1)


def w_divide(v: jnp.ndarray) -> jnp.ndarray:
    """``v.xyz / max(v.w, 1.0)`` (velocity.wgsl / compute.wgsl helper)."""
    return v[..., :3] / jnp.maximum(v[..., 3:4], 1.0)


@_jax.jit
def compute_velocity(position: jnp.ndarray, last_world_to_clip: jnp.ndarray) -> jnp.ndarray:
    """``velocity.wgsl``: uv-space motion = current_uv - previous_uv.

    ``position``: [H,W,4] world positions (w = depth); ``last_world_to_clip``
    is the previous frame's ``(camera * inv_projection)^-1`` push constant
    (state.rs:318-325, main.rs:213-216). Returns [H,W,2].
    """
    h, w = position.shape[:2]
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    current_uv = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # [H,W,2] (u,v)

    p = jnp.concatenate([position[..., :3], jnp.ones_like(position[..., :1])], axis=-1)
    clip = jnp.einsum("ij,hwj->hwi", last_world_to_clip, p)
    prev_uv = w_divide(clip)[..., :2] * 0.5 + 0.5
    return current_uv - prev_uv


def _rgb_to_ycocg(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    return jnp.stack(
        [0.25 * r + 0.5 * g + 0.25 * b, 0.5 * r - 0.5 * b, -0.25 * r + 0.5 * g - 0.25 * b],
        axis=-1,
    )


def _ycocg_to_rgb(c):
    y, co, cg = c[..., 0], c[..., 1], c[..., 2]
    return jnp.stack([y + co - cg, y + cg, y - co - cg], axis=-1)


def _clip_aabb(aabb_min, aabb_max, q):
    """Clip towards the box center (compute.wgsl:82-101)."""
    p_clip = 0.5 * (aabb_max + aabb_min)
    e_clip = 0.5 * (aabb_max - aabb_min)
    v_clip = q - p_clip
    v_unit = v_clip / jnp.where(e_clip == 0.0, 1e-20, e_clip)
    ma_unit = jnp.max(jnp.abs(v_unit), axis=-1, keepdims=True)
    clipped = p_clip + v_clip / ma_unit
    return jnp.where(ma_unit > 1.0, clipped, q)


def _bilinear(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Clamp-to-edge bilinear sample of ``img [H,W,C]`` at uv in [0,1]
    (half-texel centers, GPU sampler convention)."""
    h, w = img.shape[:2]
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    xf = (x - x0)[..., None]
    yf = (y - y0)[..., None]

    def at(xi, yi):
        xi = jnp.clip(xi.astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(yi.astype(jnp.int32), 0, h - 1)
        flat = img.reshape(-1, img.shape[-1])
        return jnp.take(flat, yi * w + xi, axis=0)

    c00 = at(x0, y0)
    c10 = at(x0 + 1, y0)
    c01 = at(x0, y0 + 1)
    c11 = at(x0 + 1, y0 + 1)
    return (c00 * (1 - xf) + c10 * xf) * (1 - yf) + (c01 * (1 - xf) + c11 * xf) * yf


def _sample_catmull_rom(tex: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """9-tap Catmull-Rom resample of the w-divided accumulation texture
    (compute.wgsl:16-62)."""
    h, w = tex.shape[:2]
    tex_size = jnp.asarray([w, h], jnp.float32)
    sample_pos = uv * tex_size + 0.5
    tex_pos1 = jnp.floor(sample_pos - 0.5) + 0.5
    f = sample_pos - tex_pos1

    w0 = f * (-0.5 + f * (1.0 - 0.5 * f))
    w1 = 1.0 + f * f * (-2.5 + 1.5 * f)
    w2 = f * (0.5 + f * (2.0 - 1.5 * f))
    w3 = f * f * (-0.5 + 0.5 * f)
    w12 = w1 + w2
    offset12 = w2 / jnp.where(w12 == 0.0, 1e-20, w12)

    tex_pos0 = (tex_pos1 - 1.0) / tex_size
    tex_pos3 = (tex_pos1 + 2.0) / tex_size
    tex_pos12 = (tex_pos1 + offset12) / tex_size

    def tap(px, py, wx, wy):
        s = _bilinear(tex, jnp.stack([px, py], axis=-1))
        return w_divide(s) * (wx * wy)[..., None]

    x0, x12, x3 = tex_pos0[..., 0], tex_pos12[..., 0], tex_pos3[..., 0]
    y0, y12, y3 = tex_pos0[..., 1], tex_pos12[..., 1], tex_pos3[..., 1]
    wx0, wx12, wx3 = w0[..., 0], w12[..., 0], w3[..., 0]
    wy0, wy12, wy3 = w0[..., 1], w12[..., 1], w3[..., 1]

    c = tap(x0, y0, wx0, wy0) + tap(x12, y0, wx12, wy0) + tap(x3, y0, wx3, wy0)
    c += tap(x0, y12, wx0, wy12) + tap(x12, y12, wx12, wy12) + tap(x3, y12, wx3, wy12)
    c += tap(x0, y3, wx0, wy3) + tap(x12, y3, wx12, wy3) + tap(x3, y3, wx3, wy3)
    return c


@_jax.jit
def temporal_reproject(
    colour: jnp.ndarray,  # [H,W,4] current frame (rgb, depth-in-alpha quirk: 1.0)
    accumulation: jnp.ndarray,  # [H,W,4] history (rgb sum, count)
    velocity: jnp.ndarray,  # [H,W,2]
    ids: jnp.ndarray,  # [H,W] uint32 packed (prev << 16 | current)
    blend: float = 0.15,
    gamma: float = 1.0,
) -> jnp.ndarray:
    """``compute.wgsl:103-213``. Returns the new output [H,W,4] (alpha=1)."""
    h, w = colour.shape[:2]

    # 3x3 neighborhood stats in YCoCg + top-left-biased velocity dilation.
    ycc = _rgb_to_ycocg(colour[..., :3])
    depth = colour[..., 3]

    pad_ycc = jnp.pad(ycc, ((1, 1), (1, 1), (0, 0)), mode="edge")
    pad_depth = jnp.pad(depth, ((1, 1), (1, 1)), mode="constant", constant_values=jnp.inf)
    pad_vel = jnp.pad(velocity, ((1, 1), (1, 1), (0, 0)), mode="edge")

    m1 = jnp.zeros_like(ycc)
    m2 = jnp.zeros_like(ycc)
    count = jnp.zeros((h, w, 1), jnp.float32)
    best_depth = jnp.full((h, w), jnp.inf, jnp.float32)
    best_vel = jnp.zeros((h, w, 2), jnp.float32)
    # WGSL iterates x (outer), y (inner) with strict <; with the all-equal
    # depth quirk the first in-bounds neighbor wins.
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            n_ycc = pad_ycc[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
            n_depth = pad_depth[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
            n_vel = pad_vel[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
            in_bounds = jnp.isfinite(n_depth)
            m1 = m1 + jnp.where(in_bounds[..., None], n_ycc, 0.0)
            m2 = m2 + jnp.where(in_bounds[..., None], n_ycc * n_ycc, 0.0)
            count = count + in_bounds[..., None]
            better = n_depth < best_depth
            best_depth = jnp.where(better, n_depth, best_depth)
            best_vel = jnp.where(better[..., None], n_vel, best_vel)

    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    current_uv = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
    prev_uv = current_uv - best_vel
    prev_coords = jnp.floor(prev_uv * jnp.asarray([w, h], jnp.float32)).astype(jnp.int32)

    px = jnp.clip(prev_coords[..., 0], 0, w - 1)
    py = jnp.clip(prev_coords[..., 1], 0, h - 1)
    ids_flat = ids.reshape(-1)
    prev_ids = jnp.take(ids_flat, py * w + px)
    current_id = ids & jnp.uint32(0xFFFF)
    old_id = (prev_ids >> jnp.uint32(16)) & jnp.uint32(0xFFFF)
    out_of_bounds = (
        (prev_coords[..., 0] < 0)
        | (prev_coords[..., 1] < 0)
        | (prev_coords[..., 0] >= w)
        | (prev_coords[..., 1] >= h)
    )
    disoccluded = (current_id != old_id) | out_of_bounds

    # Disocclusion fallback: 2x2 box of the input (compute.wgsl:170-181)
    c0 = jnp.stack(jnp.meshgrid(jnp.arange(w, dtype=jnp.float32) / w, jnp.arange(h, dtype=jnp.float32) / h, indexing="xy"), axis=-1)
    c1 = c0 + 1.0 / jnp.asarray([w, h], jnp.float32)
    box = (
        _bilinear(colour, c0)
        + _bilinear(colour, jnp.stack([c0[..., 0], c1[..., 1]], -1))
        + _bilinear(colour, jnp.stack([c1[..., 0], c0[..., 1]], -1))
        + _bilinear(colour, c1)
    ) / 4.0

    # History path: variance clip in YCoCg + Catmull-Rom fetch
    mu = m1 / count
    sigma = jnp.sqrt(jnp.maximum(m2 / count - mu * mu, 0.0))
    mn = mu - gamma * sigma
    mx = mu + gamma * sigma
    history = _sample_catmull_rom(accumulation, prev_uv)
    clamped = _ycocg_to_rgb(_clip_aabb(mn, mx, _rgb_to_ycocg(history)))
    blended = clamped * (1.0 - blend) + colour[..., :3] * blend
    blended4 = jnp.concatenate([blended, jnp.ones((h, w, 1), jnp.float32)], axis=-1)

    return jnp.where(disoccluded[..., None], box, blended4)


@_jax.jit
def display_frame(accumulation: jnp.ndarray) -> jnp.ndarray:
    """``shader.wgsl`` fragment: rgb/alpha then GT tonemap. Returns [H,W,3]
    in [0,1] (pre-gamma, like the reference's sRGB surface handoff)."""
    resolved = accumulation[..., :3] / jnp.maximum(accumulation[..., 3:4], 1e-20)
    return jnp.clip(gt_tonemap(resolved), 0.0, 1.0)


@_jax.jit
def pack_ids(prev_packed: jnp.ndarray, new_id: jnp.ndarray) -> jnp.ndarray:
    """Per-frame id packing ``(*id << 16) | new`` (main.rs:206)."""
    return (prev_packed << jnp.uint32(16)) | (new_id & jnp.uint32(0xFFFF))


def display_letterboxed(frame: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Fit a [H,W,3] frame into an (out_h, out_w) canvas preserving aspect,
    with black bars — the reference's viewport letterboxing on window resize
    (state.rs:486-503). Nearest-neighbour scale (display-only path)."""
    h, w = frame.shape[:2]
    scale = min(out_w / w, out_h / h)
    new_w = max(1, int(w * scale))
    new_h = max(1, int(h * scale))
    ys = jnp.clip((jnp.arange(new_h) / scale).astype(jnp.int32), 0, h - 1)
    xs = jnp.clip((jnp.arange(new_w) / scale).astype(jnp.int32), 0, w - 1)
    scaled = frame[ys][:, xs]
    top = (out_h - new_h) // 2
    left = (out_w - new_w) // 2
    canvas = jnp.zeros((out_h, out_w, 3), frame.dtype)
    return jax.lax.dynamic_update_slice(canvas, scaled, (top, left, 0))


# --- fused per-frame update programs (r5) -----------------------------------
#
# The session originally dispatched pack_ids / accumulate (static) or
# pack_ids / compute_velocity / temporal_reproject (moving) as separate
# programs, materializing the intermediates ([H,W,2] velocity, packed ids)
# in HBM between them. One fused program per mode removes the extra
# dispatches and lets XLA fuse the velocity math straight into the
# reprojection's consumers. Outputs may differ from the unfused sequence at
# the last ulp (fusion changes FMA formation), which is inside the TAA
# pipeline's own tolerance (blend=0.15 history filter).


@_jax.jit
def frame_update_static(prev_ids, accumulation, colour, new_id):
    """pack_ids + accumulate in one program. Returns (ids, accumulation)."""
    ids = (prev_ids << jnp.uint32(16)) | (new_id & jnp.uint32(0xFFFF))
    rgb = colour[..., :3]
    ones = jnp.ones_like(rgb[..., :1])
    return ids, accumulation + jnp.concatenate([rgb, ones], axis=-1)


@_jax.jit
def frame_update_moving(prev_ids, accumulation, colour, new_id, position,
                        last_world_to_clip):
    """pack_ids + compute_velocity + temporal_reproject in one program.
    Returns (ids, new accumulation)."""
    ids = (prev_ids << jnp.uint32(16)) | (new_id & jnp.uint32(0xFFFF))
    velocity = compute_velocity(position, last_world_to_clip)
    return ids, temporal_reproject(colour, accumulation, velocity, ids)


@_jax.jit
def display_frame_u8(accumulation: jnp.ndarray) -> jnp.ndarray:
    """``display_frame`` quantized to uint8 ON DEVICE — the presentation
    handoff a real swapchain takes, and 4x less device->host traffic than
    the f32 image (the readback is a measured slice of the frame budget on
    the tunneled platform)."""
    f = display_frame(accumulation)
    return jnp.round(f * 255.0).astype(jnp.uint8)
