"""Equirectangular environment maps: host loading + device lookup.

Reference: ``src/image_helper.rs``. Images load as gamma-2.2 and are linearized
with ``pow(2.2)`` (``image_helper.rs:25-33``); misses shade via an
equirectangular lookup with wrap-around bilinear filtering
(``image_helper.rs:61-88``, direction->uv at ``integrator.rs:258-259``).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from path_tracer_tpu.core import vecmath


def load_image(path) -> np.ndarray:
    """Load a PNG/JPEG into linear-RGB float32 ``[H, W, 3]`` (gamma 2.2 -> linear)."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    data = np.asarray(img, np.float32) / 255.0
    return np.power(data, 2.2).astype(np.float32)


def save_image(path, rgb01: np.ndarray) -> None:
    """Save a [0,1] float image as 8-bit PNG."""
    from PIL import Image

    data = np.clip(np.asarray(rgb01) * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(data, "RGB").save(path)


def get_pixel_bilinear(image: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Batched wrap-around bilinear sample of ``image [H,W,3]`` at uv in [0,1].

    Matches ``ImageHelper::get_pixel_bilinear`` (image_helper.rs:71-88): texel
    coordinates are ``u*W, v*H`` truncated (no half-texel offset), and BOTH
    axes wrap modulo the image size (image_helper.rs:61-68).
    """
    h, w = image.shape[0], image.shape[1]
    x = u * w
    y = v * h
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    xf = x - jnp.floor(x)
    yf = y - jnp.floor(y)

    def pix(xi, yi):
        xi = jnp.mod(xi, w)
        yi = jnp.mod(yi, h)
        flat = image.reshape(-1, 3)
        return jnp.take(flat, yi * w + xi, axis=0)

    c00 = pix(x0, y0)
    c01 = pix(x0, y0 + 1)
    c10 = pix(x0 + 1, y0)
    c11 = pix(x0 + 1, y0 + 1)
    wx = xf[..., None]
    wy = yf[..., None]
    return (1 - wx) * (1 - wy) * c00 + (1 - wx) * wy * c01 + wx * (1 - wy) * c10 + wx * wy * c11


def sample_environment(image: jnp.ndarray, direction: jnp.ndarray) -> jnp.ndarray:
    """Radiance for miss rays: direction [..., 3] -> linear RGB.

    uv mapping from ``integrator.rs:258-259``:
    ``u = atan2(x, z) / (2*pi) + 0.5``, ``v = -asin(y) / pi + 0.5``.
    """
    if image.shape[0] == 1 and image.shape[1] == 1:
        # "no env map" constant background: bilinear of a constant is the
        # constant — skip the per-lane gathers entirely.
        return jnp.broadcast_to(image[0, 0], direction.shape[:-1] + (3,))
    d = direction
    u = jnp.arctan2(d[..., 0], d[..., 2]) * (0.5 / jnp.pi) + 0.5
    v = jnp.arcsin(jnp.clip(d[..., 1], -1.0, 1.0)) * (-1.0 / jnp.pi) + 0.5
    return get_pixel_bilinear(image, u, v)
