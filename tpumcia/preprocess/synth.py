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


def noise_channels_chw(
    images: jax.Array,
    key: jax.Array,
    *,
    num_noise: int = 2,
    var: float = 0.01,
) -> jax.Array:
    """(B, H, W) uint8 -> (B, 1 + num_noise, H, W) int32, bit-identical to
    ``transpose(add_noise_channels(...), (0, 3, 1, 2)).astype(int32)``.

    Same (B, H, W, num_noise) PRNG draw as :func:`add_noise_channels`
    (stream compatibility with the classic path is pinned by tests), but
    the channels-last -> channels-first relayout touches only the generated
    noise — where XLA fuses it into the generator epilogue — while the
    grayscale plane is a contiguous reshape. The fused extraction dispatch
    consumes channel-major int32, so this skips the interleaved->planar
    gather over the whole stacked batch (the measured prologue cost on the
    fast path). The f32 -> int32 cast truncates toward zero exactly like
    the reference's uint8 cast (values are clipped to [0, 255] first).
    """
    images = jnp.asarray(images)
    if images.ndim != 3:
        raise ValueError(f"expected (B, H, W) grayscale batch, got {images.shape}")
    B, H, W = images.shape
    noise = jax.random.normal(key, (B, H, W, num_noise), jnp.float32) * jnp.sqrt(
        jnp.float32(var)
    )
    noise_chw = jnp.transpose(
        (jnp.clip(noise, 0.0, 1.0) * 255.0).astype(jnp.int32), (0, 3, 1, 2)
    )
    return jnp.concatenate(
        [images[:, None, :, :].astype(jnp.int32), noise_chw], axis=1
    )


def synth_batch_keys(seed: int, num_batches: int) -> jax.Array:
    """The canonical per-batch PRNG stream for batched noise synthesis:
    batch i of a run draws with ``split(key(seed), num_batches)[i]``. Both
    the fused fast path and the classic pipeline use THIS stream, so the
    synthesized dataset is identical regardless of which path runs (pinned
    by tests/test_fast_pipeline.py)."""
    return jax.random.split(jax.random.key(seed), num_batches)


def add_noise_channels_batched(
    images: jax.Array,
    *,
    seed: int,
    batch_size: int,
    num_noise: int = 2,
    var: float = 0.01,
) -> jax.Array:
    """Batched-key noise synthesis on device: (N, H, W) -> (N, H, W, 1+n).

    Draws per fixed-size batch with :func:`synth_batch_keys` — batch i's
    rows get the first ``len(batch)`` rows of a ``(batch_size, ...)`` draw,
    matching the fused fast path's per-dispatch synthesis exactly (the fast
    path pads partial batches; the pad rows consume the same draw tail).
    """
    import math

    images = jnp.asarray(images)
    n = images.shape[0]
    batch_size = min(batch_size, n)
    num_batches = math.ceil(n / batch_size)
    keys = synth_batch_keys(seed, num_batches)
    parts = []
    for i in range(num_batches):
        lo, hi = i * batch_size, min((i + 1) * batch_size, n)
        b = images[lo:hi]
        short = batch_size - (hi - lo)
        if short:  # same padded draw shape as the fast path's wrap pad
            b = jnp.concatenate([b, images[:short]])
        parts.append(
            add_noise_channels(b, keys[i], num_noise=num_noise, var=var)[
                : hi - lo
            ]
        )
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts)
