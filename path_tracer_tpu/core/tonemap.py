"""Uchimura "Gran Turismo" filmic tonemap, batched.

Port of the reference curve (``src/image_helper/tonemapping.rs:2-113`` and its
WGSL twin ``src/shaders/shader.wgsl:1-33``) as branchless jnp ops. Default
parameters (p=1, a=1, m=0.22, l=0.4, c=1.33, b=0) are the ones baked into both
reference save/display paths (``src/image_helper.rs:44``, ``shader.wgsl:63``).
"""

from __future__ import annotations

import jax.numpy as jnp


def _smoothstep01(x, e0, e1):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def gt_tonemap(
    x: jnp.ndarray,
    p: float = 1.0,
    a: float = 1.0,
    m: float = 0.22,
    l: float = 0.4,  # noqa: E741 — parameter name from the original paper
    c: float = 1.33,
    b: float = 0.0,
) -> jnp.ndarray:
    """Per-channel Gran Turismo curve.

    * ``p`` maximum brightness, ``a`` contrast, ``m`` start of linear section,
      ``l`` length of linear section, ``c`` black tightness, ``b`` minimum
      brightness (``tonemapping.rs:57-96``).
    Negative inputs map to ``b`` (the reference's ``x < 0`` branch).
    """
    l0 = (p - m) * l / a

    w0 = 1.0 - _smoothstep01(x, 0.0, m)  # toe weight
    w2 = jnp.where(x > m + l0, 1.0, 0.0)  # shoulder weight (step)
    w1 = 1.0 - w0 - w2  # linear weight

    # Toe: m * (x/m)^c + b. Clamp base to avoid pow(0-, c) NaNs on dead lanes.
    toe = m * jnp.power(jnp.maximum(x, 0.0) / m, c) + b
    linear = m + a * (x - m)
    s1 = m + a * l0
    c2 = a * p / (p - s1)
    shoulder = p - (p - s1) * jnp.exp(-c2 * (x - (m + l0)) / p)

    out = toe * w0 + linear * w1 + shoulder * w2
    return jnp.where(x < 0.0, jnp.asarray(b, x.dtype), out)


def tonemap_to_srgb(rgb_linear: jnp.ndarray, gamma: float = 2.2) -> jnp.ndarray:
    """Linear HDR RGB -> tonemapped gamma-encoded [0,1] (reference save path,
    ``src/image_helper.rs:44``)."""
    tm = gt_tonemap(rgb_linear)
    return jnp.power(jnp.clip(tm, 0.0, None), 1.0 / gamma)
