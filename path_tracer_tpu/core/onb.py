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
    z-up singularity guard at ``v.z > 0.99999``. Columns are (t1, t2, v)."""
    z_axis = jnp.zeros_like(v).at[..., 2].set(1.0)
    t1 = jnp.cross(v, z_axis)
    t1_len = jnp.sqrt(jnp.sum(t1 * t1, axis=-1, keepdims=True))
    singular = v[..., 2:3] > 0.99999
    t1 = jnp.where(singular, jnp.zeros_like(v).at[..., 0].set(1.0), t1 / jnp.maximum(t1_len, 1e-20))
    t2 = jnp.cross(t1, v)
    t2 = jnp.where(singular, jnp.zeros_like(v).at[..., 1].set(-1.0), t2)
    return jnp.stack([t1, t2, v], axis=-1)


def onb_apply(onb: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """``onb @ v``: tangent -> world. ``onb``: ``[..., 3, 3]``, ``v``: ``[..., 3]``."""
    return jnp.einsum("...ij,...j->...i", onb, v)


def onb_apply_transpose(onb: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """``onb^T @ v``: world -> tangent."""
    return jnp.einsum("...ji,...j->...i", onb, v)
