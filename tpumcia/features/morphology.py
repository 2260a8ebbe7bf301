"""Per-channel morphology statistics from object masks.

BASELINE.json's north star lists "per-channel intensity, texture, and
morphology statistics"; the reference notebook computes no morphology (its
h5 contract merely carries masks, README.md:9), so these semantics are
framework-defined: the standard image-moment shape descriptors
(skimage.measure.regionprops conventions) of each channel's mask region,
computed on device as weighted reductions — no per-object Python.

Features (suffix ``_Ch{i}`` like the rest of the registry):
  area            — pixel count of the mask
  centroid_row/col— center of mass (pixels)
  major_axis      — ellipse-equivalent major axis length
  minor_axis      — minor axis length
  eccentricity    — sqrt(1 - (minor/major)^2)
  orientation     — ellipse orientation, radians in (-pi/2, pi/2]
  extent          — area / bounding-box area

Empty masks yield zeros (callers can consult the degenerate flags).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MORPHOLOGY_FEATURES: tuple[str, ...] = (
    "area",
    "centroid_row",
    "centroid_col",
    "major_axis",
    "minor_axis",
    "eccentricity",
    "orientation",
    "extent",
)


@jax.jit
def morphology_features(mask) -> jax.Array:
    """(B, H, W, C) or (B, H, W) mask -> (B, C, 8) float32 shape features."""
    m = jnp.asarray(mask)
    if m.ndim == 3:
        m = m[..., None]
    w = jnp.transpose(m > 0, (0, 3, 1, 2)).astype(jnp.float32)  # (B, C, H, W)
    B, C, H, W = w.shape
    rows = jnp.arange(H, dtype=jnp.float32)[None, None, :, None]
    cols = jnp.arange(W, dtype=jnp.float32)[None, None, None, :]

    area = jnp.sum(w, axis=(2, 3))
    safe = jnp.maximum(area, 1.0)
    empty = area == 0

    cr = jnp.sum(w * rows, axis=(2, 3)) / safe
    cc = jnp.sum(w * cols, axis=(2, 3)) / safe

    dr = rows - cr[..., None, None]
    dc = cols - cc[..., None, None]
    # central second moments (regionprops adds 1/12 per-pixel variance;
    # we use the raw discrete moments — documented divergence)
    mu20 = jnp.sum(w * dr * dr, axis=(2, 3)) / safe
    mu02 = jnp.sum(w * dc * dc, axis=(2, 3)) / safe
    mu11 = jnp.sum(w * dr * dc, axis=(2, 3)) / safe

    # ellipse-equivalent axes from the covariance eigenvalues
    common = jnp.sqrt(jnp.maximum((mu20 - mu02) ** 2 + 4 * mu11**2, 0.0))
    l1 = (mu20 + mu02 + common) / 2.0
    l2 = (mu20 + mu02 - common) / 2.0
    l2 = jnp.clip(l2, 0.0, None)
    major = 4.0 * jnp.sqrt(jnp.maximum(l1, 0.0))
    minor = 4.0 * jnp.sqrt(l2)
    # regionprops convention: a single-pixel region (l1 == 0) is
    # maximally round -> eccentricity 0, not the 1 the raw formula's
    # epsilon floor would produce
    ecc = jnp.where(
        l1 <= 0.0,
        0.0,
        jnp.sqrt(jnp.clip(1.0 - l2 / jnp.maximum(l1, 1e-12), 0.0, 1.0)),
    )
    orientation = 0.5 * jnp.arctan2(2.0 * mu11, mu20 - mu02)

    # bounding-box extent
    row_any = jnp.any(w > 0, axis=3)  # (B, C, H)
    col_any = jnp.any(w > 0, axis=2)  # (B, C, W)
    r_idx = jnp.arange(H)
    c_idx = jnp.arange(W)
    r_min = jnp.min(jnp.where(row_any, r_idx, H), axis=-1)
    r_max = jnp.max(jnp.where(row_any, r_idx, -1), axis=-1)
    c_min = jnp.min(jnp.where(col_any, c_idx, W), axis=-1)
    c_max = jnp.max(jnp.where(col_any, c_idx, -1), axis=-1)
    bbox = jnp.maximum((r_max - r_min + 1) * (c_max - c_min + 1), 1).astype(
        jnp.float32
    )
    extent = area / bbox

    feats = jnp.stack(
        [area, cr, cc, major, minor, ecc, orientation, extent], axis=-1
    )
    return jnp.where(empty[..., None], 0.0, feats)


def morphology_feature_names(
    num_channels: int, channel_names: list[str] | None = None
) -> list[str]:
    def suffix(c):
        return f"_{channel_names[c]}" if channel_names else f"_Ch{c + 1}"

    return [
        f + suffix(c) for c in range(num_channels) for f in MORPHOLOGY_FEATURES
    ]
