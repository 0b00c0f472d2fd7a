"""Batched 3-vector math on ``[..., 3]`` jnp arrays.

TPU-native counterpart of the reference's glam/SIMD scalar helpers
(``src/utility.rs:7-36``, ``src/ray.rs``). Every function is shape-polymorphic
over leading batch dimensions so the wavefront integrator can apply them to the
whole ray batch at once.
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product; returns shape ``a.shape[:-1]``.

    Unrolled over components rather than ``jnp.sum(a*b, -1)``: on TPU a
    reduce over a 3-wide minor axis runs as a cross-lane reduction of a
    128-lane-padded tile (measured 4.2 us per op at 16K lanes — it was 66%
    of the whole integrator's device time); the unrolled form fuses into
    neighboring elementwise work at full lane density."""
    k = a.shape[-1]
    if isinstance(k, int) and k <= 4 and a.shape[-1] == b.shape[-1]:
        out = a[..., 0] * b[..., 0]
        for i in range(1, k):
            out = out + a[..., i] * b[..., i]
        return out
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def length_sq(a: jnp.ndarray) -> jnp.ndarray:
    return dot(a, a)


def length(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(length_sq(a))


def normalize(a: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Normalize along the last axis. With ``eps=0`` a zero vector yields NaN,
    matching glam's ``normalize`` debug behavior."""
    n = length(a)[..., None]
    if eps:
        n = jnp.maximum(n, eps)
    return a / n


def reflect(i: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror reflection of incoming direction ``i`` about normal ``n``
    (reference: ``src/utility.rs:21``)."""
    return i - 2.0 * dot(n, i)[..., None] * n


def refract(i: jnp.ndarray, n: jnp.ndarray, eta: jnp.ndarray):
    """Snell refraction of ``i`` through a surface with normal ``n``.

    Returns ``(refracted, tir)``. The reference signals total internal
    reflection by returning NaN (``src/utility.rs:23-36``); here we return an
    explicit boolean mask (shape ``i.shape[:-1]``) which is branchless-friendly.
    The returned direction for TIR lanes is garbage and must be masked off.
    """
    eta = jnp.asarray(eta)
    if eta.ndim == i.ndim - 1:
        eta_e = eta[..., None]
    else:
        eta_e = eta
    n_dot_i = dot(n, i)
    k = 1.0 - eta_e[..., 0] ** 2 * (1.0 - n_dot_i * n_dot_i)
    tir = k <= 0.0
    k_safe = jnp.maximum(k, 0.0)
    refracted = eta_e * i - (eta_e[..., 0] * n_dot_i + jnp.sqrt(k_safe))[..., None] * n
    return refracted, tir


def random_cosine_vector(u0: jnp.ndarray, u1: jnp.ndarray) -> jnp.ndarray:
    """Cosine-weighted hemisphere sample in tangent space (z-up) from two
    uniforms (reference: ``src/utility.rs:7-19``, consuming RNG in the same
    (radius, phi) order)."""
    r = jnp.sqrt(u0)
    z = jnp.sqrt(jnp.maximum(1.0 - r * r, 0.0))
    phi = (2.0 * jnp.pi) * u1
    return jnp.stack([jnp.cos(phi) * r, jnp.sin(phi) * r, z], axis=-1)


def ray_at(origin: jnp.ndarray, direction: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Point along a ray (reference: ``src/ray.rs:20``)."""
    return origin + direction * t[..., None]


def transform_point(mat: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply a ``[3, 4]`` affine matrix (rotation|translation) to points
    (reference: ``Affine3A::transform_point3a``)."""
    return p @ mat[:, :3].T + mat[:, 3]


def transform_vector(mat: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Apply only the linear part of a ``[3, 4]`` affine matrix to vectors
    (reference: ``Affine3A::transform_vector3a``)."""
    return v @ mat[:, :3].T
