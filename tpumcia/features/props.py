"""GLCM texture properties from explicit co-occurrence matrices.

Public API parity with ``skimage.feature.graycoprops`` (reference call sites
ipynb:301-306) for users who work with the matrices from
:func:`tpumcia.features.stats.glcm_matrix` directly. The feature pipeline
itself never materialises the matrices — it uses histogram sufficient
statistics (``finalize.py``/``hybrid.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpumcia.features.registry import GLCM_FEATURES


@jax.jit
def glcm_properties(glcm: jax.Array) -> dict[str, jax.Array]:
    """(..., L, L) co-occurrence counts -> dict of the 6 properties, each
    shaped like the leading dims. skimage semantics: normalise per matrix;
    correlation is 1 where a marginal std vanishes."""
    g = jnp.asarray(glcm, jnp.float32)
    L = g.shape[-1]
    total = jnp.sum(g, axis=(-2, -1), keepdims=True)
    p = g / jnp.where(total == 0, 1.0, total)

    i = jnp.arange(L, dtype=jnp.float32)
    di = i[:, None] - i[None, :]  # (L, L)
    contrast = jnp.sum(p * di**2, axis=(-2, -1))
    dissimilarity = jnp.sum(p * jnp.abs(di), axis=(-2, -1))
    homogeneity = jnp.sum(p / (1.0 + di**2), axis=(-2, -1))
    asm = jnp.sum(p * p, axis=(-2, -1))
    energy = jnp.sqrt(asm)

    pi = jnp.sum(p, axis=-1)  # (..., L) row marginal
    pj = jnp.sum(p, axis=-2)
    mu_i = jnp.sum(pi * i, axis=-1)
    mu_j = jnp.sum(pj * i, axis=-1)
    d_i = i - mu_i[..., None]
    d_j = i - mu_j[..., None]
    var_i = jnp.sum(pi * d_i**2, axis=-1)
    var_j = jnp.sum(pj * d_j**2, axis=-1)
    cov = jnp.sum(p * (d_i[..., :, None] * d_j[..., None, :]), axis=(-2, -1))
    denom = jnp.sqrt(var_i * var_j)
    ok = (var_i > 0) & (var_j > 0)
    correlation = jnp.where(ok, cov / jnp.where(ok, denom, 1.0), 1.0)

    values = (contrast, dissimilarity, homogeneity, asm, energy, correlation)
    return dict(zip(GLCM_FEATURES, values))


def graycoprops(glcm: jax.Array, prop: str = "contrast") -> jax.Array:
    """Exact ``skimage.feature.graycoprops`` call shape (the reference's,
    ipynb:301-306): ``(..., L, L, D, A)`` matrices (e.g. from
    ``glcm_matrix(distances=[..], angles=[..])``) -> ``(..., D, A)`` values
    for one property name ('contrast', 'dissimilarity', 'homogeneity',
    'ASM', 'energy', 'correlation')."""
    key = prop.lower()
    names = {n.lower(): n for n in GLCM_FEATURES}
    if key not in names:
        raise ValueError(
            f"unknown property {prop!r}; one of {list(GLCM_FEATURES)}"
        )
    g = jnp.asarray(glcm)
    g = jnp.moveaxis(jnp.moveaxis(g, -1, 0), -1, 0)  # (D, A, ..., L, L)
    vals = glcm_properties(g)[names[key]]  # (D, A, ...)
    return jnp.moveaxis(jnp.moveaxis(vals, 0, -1), 0, -1)  # (..., D, A)
