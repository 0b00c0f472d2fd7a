"""Film: progressive accumulation, resolve, tonemapped PNG, checkpoint/resume.

The reference keeps its accumulator on the GPU as an rgba32float texture whose
alpha carries the sample count (``accumulate.wgsl:23``); display divides rgb by
alpha and applies the Gran Turismo tonemap (``shader.wgsl:63``). Here the film
is a ``[H, W, 4]`` device array with the same layout. The snapshot path the
reference left dead (``State::save`` commented out, ``state.rs:588-626``) is
live here, as is checkpoint/resume of a long render — accumulator + sample
count round-trip through an ``.npz`` (SURVEY.md §5 checkpoint gap).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from path_tracer_tpu.core.tonemap import tonemap_to_srgb


def resolve(film: jnp.ndarray) -> jnp.ndarray:
    """Mean radiance: rgb sum / sample count (shader.wgsl fs_main)."""
    return film[..., :3] / jnp.maximum(film[..., 3:4], 1.0)


def film_to_srgb(film: jnp.ndarray) -> jnp.ndarray:
    """Resolve + GT tonemap + gamma 2.2 encode -> [0,1] rgb."""
    return tonemap_to_srgb(resolve(film))


def save_png(path, film) -> None:
    """Write the tonemapped film as PNG. Film rows run bottom-up (NDC
    convention, see camera module), so flip for image order."""
    from PIL import Image

    srgb = np.asarray(film_to_srgb(film))
    data = np.clip(srgb * 255.0, 0, 255).astype(np.uint8)[::-1]
    Image.fromarray(data, "RGB").save(path)


def save_checkpoint(path, film, next_sample: int, meta: dict | None = None) -> None:
    """Persist accumulator + progress so a long render can resume."""
    np.savez_compressed(
        path,
        film=np.asarray(film),
        next_sample=np.int64(next_sample),
        **({f"meta_{k}": v for k, v in (meta or {}).items()}),
    )


def load_checkpoint(path):
    """Returns ``(film jnp[H,W,4], next_sample int)``."""
    z = np.load(path)
    return jnp.asarray(z["film"]), int(z["next_sample"])
