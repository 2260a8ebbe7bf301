"""Fused preprocessing ops: bit-depth normalisation, masking, crop/pad.

The reference only ever divides a uint8 image by 255 (ipynb:328, 360); the h5
contract (README.md:8) specifies 16-bit images, for which no reference code
exists. The semantics here are the framework's own, documented contract:

* ``normalize_uint16`` — v / 65535 -> float32 in [0, 1]
* ``quantize_to_levels`` — map any integer/float image to L discrete levels
  (floor quantisation), feeding the exact histogram-based feature path
* ``percentile_normalize`` — per-channel robust rescale (clip to percentile
  window, then [0, 1]) — standard for imaging-flow-cytometry stacks
* ``apply_mask`` / ``center_crop_or_pad`` — mask application and shape
  standardisation for variable-size cell objects

All functions are jit-compatible and operate on (B, H, W, C) batches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.jit
def normalize_uint16(images: jax.Array) -> jax.Array:
    """(B, H, W, C) uint16 -> float32 in [0, 1]."""
    return jnp.asarray(images).astype(jnp.float32) / 65535.0


@functools.partial(jax.jit, static_argnames=("levels", "src_levels"))
def quantize_to_levels(
    images: jax.Array, *, levels: int = 256, src_levels: int | None = None
) -> jax.Array:
    """Map an image to integer levels in [0, levels) by floor quantisation.

    * integer input with ``src_levels`` (e.g. 65536 for uint16): level =
      ``v * levels // src_levels`` (for uint16 -> 256 this is ``v >> 8``).
    * float input in [0, 1]: level = ``floor(v * (levels - 1) + 0.5)``
      (round-to-nearest of the scaled value).
    """
    if levels < 1:
        raise ValueError(f"levels must be >= 1; got {levels}")
    images = jnp.asarray(images)
    if jnp.issubdtype(images.dtype, jnp.floating):
        lev = jnp.floor(images * (levels - 1) + 0.5)
        return jnp.clip(lev, 0, levels - 1).astype(jnp.int32)
    if src_levels is None:
        raise ValueError("src_levels is required for integer inputs")
    v = images.astype(jnp.int32)
    return jnp.clip(v * levels // src_levels, 0, levels - 1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("low", "high", "per_image"))
def percentile_normalize(
    images: jax.Array,
    *,
    low: float = 1.0,
    high: float = 99.0,
    per_image: bool = True,
) -> jax.Array:
    """Per-channel robust normalisation: clip to the [low, high] percentile
    window and rescale to [0, 1]. ``per_image=False`` uses batch-global
    percentiles per channel."""
    x = jnp.asarray(images).astype(jnp.float32)
    axes = (1, 2) if per_image else (0, 1, 2)
    lo = jnp.percentile(x, low, axis=axes, keepdims=True)
    hi = jnp.percentile(x, high, axis=axes, keepdims=True)
    scale = jnp.where(hi > lo, hi - lo, 1.0)
    return jnp.clip((x - lo) / scale, 0.0, 1.0)


@jax.jit
def apply_mask(images: jax.Array, mask: jax.Array, fill=0) -> jax.Array:
    """Zero (or ``fill``) everything outside the mask. Mask is (B, H, W, C)
    or (B, H, W) (broadcast across channels), nonzero selects pixels."""
    mask = jnp.asarray(mask)
    if mask.ndim == images.ndim - 1:
        mask = mask[..., None]
    return jnp.where(mask > 0, images, jnp.asarray(fill, images.dtype))


def center_crop_or_pad(images, target_hw: tuple[int, int], fill=0):
    """(B, H, W, C) -> (B, th, tw, C) by symmetric crop and/or zero-pad.

    Standardises variable-size cell crops into a fixed batch shape (the h5
    contract stores per-object crops of varying size)."""
    images = jnp.asarray(images)
    B, H, W, C = images.shape
    th, tw = target_hw

    # crop
    if H > th:
        top = (H - th) // 2
        images = images[:, top : top + th]
    if W > tw:
        left = (W - tw) // 2
        images = images[:, :, left : left + tw]
    # pad
    H2, W2 = images.shape[1], images.shape[2]
    if H2 < th or W2 < tw:
        pt = (th - H2) // 2
        pb = th - H2 - pt
        plft = (tw - W2) // 2
        prgt = tw - W2 - plft
        images = jnp.pad(
            images,
            ((0, 0), (max(pt, 0), max(pb, 0)), (max(plft, 0), max(prgt, 0)), (0, 0)),
            constant_values=fill,
        )
    return images
