"""Seeded noise-channel synthesis (the reference's ``add_two_noise_channels``).

Reference semantics (ipynb:148-156): channel 1 is the grayscale image; each
extra channel is ``random_noise(image*0.0)`` — gaussian noise, mean 0,
variance 0.01, clipped to [0, 1] — and the stack is scaled by 255 and cast to
uint8 (truncation). The reference is *unseeded* (numpy global RNG); this
version takes an explicit ``jax.random`` key, fixing the nondeterminism
(SURVEY.md §7 "determinism").

Channel 1 is copied through untouched: the reference's /255-then-*255 float64
round-trip is exact for every uint8 value (pinned by a test), so the identity
copy is bit-identical and avoids float32 truncation hazards on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("num_noise", "var"))
def add_noise_channels(
    images: jax.Array,
    key: jax.Array,
    *,
    num_noise: int = 2,
    var: float = 0.01,
) -> jax.Array:
    """(B, H, W) uint8 -> (B, H, W, 1 + num_noise) uint8.

    Noise channels are ``clip(N(0, sqrt(var)), 0, 1) * 255`` truncated to
    uint8, matching the reference's skimage ``random_noise`` on a zero image.
    """
    images = jnp.asarray(images)
    if images.ndim != 3:
        raise ValueError(f"expected (B, H, W) grayscale batch, got {images.shape}")
    B, H, W = images.shape
    noise = jax.random.normal(key, (B, H, W, num_noise), jnp.float32) * jnp.sqrt(
        jnp.float32(var)
    )
    noise_u8 = (jnp.clip(noise, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    return jnp.concatenate([images[..., None].astype(jnp.uint8), noise_u8], axis=-1)
