"""Orthonormal bases from normals, batched.

Reference: ``src/tlas/tlas_bvh/blas/primitive/material/onb.rs``. ``generate_onb``
must match glam's ``Vec3A::any_orthonormal_pair`` bit-for-bit (Duff et al. 2017,
"Building an Orthonormal Basis, Revisited") because BSDF sampling happens in
this frame; a different (valid) basis would still integrate to the same image
but would break golden-sample tests against the oracle.
"""

from __future__ import annotations

import jax.numpy as jnp


def generate_onb(normal: jnp.ndarray) -> jnp.ndarray:
    """Batched Duff et al. orthonormal basis. ``normal``: ``[..., 3]`` unit.

    Returns ``[..., 3, 3]`` matrices whose COLUMNS are (t0, t1, normal),
    matching ``glam::Mat3A::from_cols(c0, c1, normal)`` at ``onb.rs:1-7``.
    Multiplying ``onb @ v_tangent`` maps tangent space -> world.
    """
    x, y, z = normal[..., 0], normal[..., 1], normal[..., 2]
    # glam any_orthonormal_pair (Duff et al.): sign = copysign(1, z)
    sign = jnp.where(z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + z)
    b = x * y * a
    c0 = jnp.stack([1.0 + sign * x * x * a, sign * b, -sign * x], axis=-1)
    c1 = jnp.stack([b, sign + y * y * a, -y], axis=-1)
    return jnp.stack([c0, c1, normal], axis=-1)  # columns


def generate_onb_ggx(v: jnp.ndarray) -> jnp.ndarray:
    """Basis used by the GGX VNDF sampling routine (``onb.rs:9-27``), with the
    z-up singularity guard at ``v.z > 0.99999``. Columns are (t1, t2, v).

    The crosses with the fixed z axis are expanded analytically:
    ``v x z = (vy, -vx, 0)`` — no generic jnp.cross, no axis reductions."""
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    t1_len = jnp.sqrt(vx * vx + vy * vy)
    inv = 1.0 / jnp.maximum(t1_len, 1e-20)
    singular = vz > 0.99999
    t1x = jnp.where(singular, 1.0, vy * inv)
    t1y = jnp.where(singular, 0.0, -vx * inv)
    # t2 = t1 x v with t1z == 0
    t2x = jnp.where(singular, 0.0, t1y * vz)
    t2y = jnp.where(singular, -1.0, -t1x * vz)
    t2z = jnp.where(singular, 0.0, t1x * vy - t1y * vx)
    t1 = jnp.stack([t1x, t1y, jnp.zeros_like(t1x)], axis=-1)
    t2 = jnp.stack([t2x, t2y, t2z], axis=-1)
    return jnp.stack([t1, t2, v], axis=-1)


def onb_apply(onb: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """``onb @ v``: tangent -> world. ``onb``: ``[..., 3, 3]``, ``v``: ``[..., 3]``.

    Expanded as a sum of scaled columns rather than an einsum: a per-lane
    3x3 contraction compiles to padded cross-lane reduces on TPU (see
    vecmath.dot)."""
    return (
        onb[..., :, 0] * v[..., 0:1]
        + onb[..., :, 1] * v[..., 1:2]
        + onb[..., :, 2] * v[..., 2:3]
    )


def onb_apply_transpose(onb: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """``onb^T @ v``: world -> tangent (rows dotted with v, expanded)."""
    return (
        onb[..., 0, :] * v[..., 0:1]
        + onb[..., 1, :] * v[..., 1:2]
        + onb[..., 2, :] * v[..., 2:3]
    )
