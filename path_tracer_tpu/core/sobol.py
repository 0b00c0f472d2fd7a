"""Owen-scrambled, shuffled 2-D Sobol sampling for sub-pixel jitter.

Direct TPU port of the reference sampler (``src/sampling.rs``): the same
direction numbers, the same improved Laine-Karras hash
(psychopath.io/post/2021_01_30_building_a_better_lk_hash), the same
low-bias seed hash (github.com/skeeto/hash-prospector), all as vectorized
uint32 bit math which XLA maps straight onto the VPU.

The precomputed table of ``src/sampling.rs:33-48`` is unnecessary here: the
x component is ``reverse_bits(index)`` and the y component is an XOR-fold of
32 direction numbers — both computed on the fly for the whole lane batch.
"""

from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32

# Direction numbers for the second Sobol dimension (src/sampling.rs:4-8).
DIRECTIONS = (
    0x80000000, 0xC0000000, 0xA0000000, 0xF0000000, 0x88000000, 0xCC000000,
    0xAA000000, 0xFF000000, 0x80800000, 0xC0C00000, 0xA0A00000, 0xF0F00000,
    0x88880000, 0xCCCC0000, 0xAAAA0000, 0xFFFF0000, 0x80008000, 0xC000C000,
    0xA000A000, 0xF000F000, 0x88008800, 0xCC00CC00, 0xAA00AA00, 0xFF00FF00,
    0x80808080, 0xC0C0C0C0, 0xA0A0A0A0, 0xF0F0F0F0, 0x88888888, 0xCCCCCCCC,
    0xAAAAAAAA, 0xFFFFFFFF,
)


def reverse_bits(x: jnp.ndarray) -> jnp.ndarray:
    """Bit-reverse each uint32 (Rust ``u32::reverse_bits``)."""
    x = x.astype(_U32)
    x = ((x >> 1) & _U32(0x55555555)) | ((x & _U32(0x55555555)) << 1)
    x = ((x >> 2) & _U32(0x33333333)) | ((x & _U32(0x33333333)) << 2)
    x = ((x >> 4) & _U32(0x0F0F0F0F)) | ((x & _U32(0x0F0F0F0F)) << 4)
    x = ((x >> 8) & _U32(0x00FF00FF)) | ((x & _U32(0x00FF00FF)) << 8)
    return (x >> 16) | (x << 16)


def sobol_y(index: jnp.ndarray) -> jnp.ndarray:
    """Second-dimension Sobol point via direction-number XOR fold
    (src/sampling.rs:24-30)."""
    index = index.astype(_U32)
    out = jnp.zeros_like(index)
    for bit, direction in enumerate(DIRECTIONS):
        mask = (index >> _U32(bit)) & _U32(1)
        out = out ^ (mask * _U32(direction))
    return out


def lk_hash(x: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """Improved Laine-Karras permutation hash (src/sampling.rs:53-68)."""
    x = x.astype(_U32)
    seed = seed.astype(_U32)
    x = x ^ (x * _U32(0x3D20ADEA))
    x = x + seed
    x = x * ((seed >> 16) | _U32(1))
    x = x ^ (x * _U32(0x05526C56))
    x = x ^ (x * _U32(0x53A22864))
    return x


def scramble_base2(x: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """Owen-style base-2 scramble: reverse, LK-hash, reverse
    (src/sampling.rs:71)."""
    return reverse_bits(lk_hash(reverse_bits(x), seed))


def low_bias_hash(x: jnp.ndarray) -> jnp.ndarray:
    """2-round low-bias integer hash used to derive seeds
    (src/sampling.rs:76-91)."""
    x = x.astype(_U32)
    x = x ^ (x >> 16)
    x = x * _U32(0x21F0AAAD)
    x = x ^ (x >> 15)
    x = x * _U32(0xD35A2D97)
    x = x ^ (x >> 15)
    return x


def get_ss_sobol(index: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """Shuffled, Owen-scrambled 2-D Sobol point in the unit square.

    Port of ``SobolSampler::get_ss_sobol`` (src/sampling.rs:97-114), minus the
    table: points are computed directly. ``index``/``seed`` broadcast to the
    lane batch; returns shape ``broadcast + (2,)`` float32.

    Note the reference's renderer effectively calls this with ``index==1`` and
    a fresh random seed every frame (the sample index is read from a colour
    alpha channel that is always 1.0 — SURVEY.md §3.3 quirk). We instead pass
    the true sample index with a per-pixel seed, which is strictly better
    stratification from the same machinery.
    """
    index = jnp.asarray(index, _U32)
    seed = jnp.asarray(seed, _U32)
    index, seed = jnp.broadcast_arrays(index, seed)

    x_seed = low_bias_hash(seed)
    y_seed = low_bias_hash(seed + _U32(1))
    shuffle_seed = low_bias_hash(seed + _U32(2))

    shuffled_index = scramble_base2(index, shuffle_seed)

    sx = reverse_bits(shuffled_index)
    sy = sobol_y(shuffled_index)

    x = scramble_base2(sx, x_seed)
    y = scramble_base2(sy, y_seed)

    inv = jnp.float32(1.0 / 4294967295.0)  # 1 / u32::MAX, matching sampling.rs:109
    return jnp.stack([x.astype(jnp.float32) * inv, y.astype(jnp.float32) * inv], axis=-1)
