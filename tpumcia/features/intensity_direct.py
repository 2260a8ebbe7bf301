"""Direct (non-histogram) intensity features for float / high-bit-depth data.

The exact histogram path assumes level-quantised pixels (uint8: 256 levels —
the reference's regime). For float images or 16-bit data analysed *without*
quantisation, this module computes the same 17 features directly on device:
order statistics via a vmapped sort (numpy-linear-interpolated percentiles,
masked pixels sorted to +inf), moments via mean-centred float32 sums.
Accuracy ~1e-6 relative (float32), vs the histogram path's ~1e-9 exactness.

Feature order matches ``registry.INTENSITY_FEATURES``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_QS = np.array([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9], np.float32)


@functools.partial(jax.jit, static_argnames=())
def intensity_features_direct(images, mask=None):
    """(B, H, W, C) float images (+ optional mask) -> (B, C, 17) float32.

    Masked-out pixels are excluded from every statistic; an empty mask yields
    zeros for that channel (degenerate flag is the caller's concern).
    """
    x = jnp.asarray(images, jnp.float32)
    B, H, W, C = x.shape
    n_pix = H * W
    xt = jnp.transpose(x, (0, 3, 1, 2)).reshape(B, C, n_pix)
    if mask is None:
        w = jnp.ones_like(xt, dtype=bool)
    else:
        m = jnp.asarray(mask)
        if m.ndim == 3:
            m = m[..., None]
        w = jnp.transpose(m > 0, (0, 3, 1, 2)).reshape(B, C, n_pix)

    n = jnp.sum(w, axis=-1).astype(jnp.float32)  # (B, C)
    safe_n = jnp.maximum(n, 1)
    empty = n == 0

    big = jnp.float32(jnp.inf)
    masked_vals = jnp.where(w, xt, big)
    s = jnp.sort(masked_vals, axis=-1)  # valid values first, inf tail

    min_v = jnp.where(empty, 0.0, s[..., 0])
    max_idx = jnp.clip(n - 1, 0, n_pix - 1).astype(jnp.int32)
    max_v = jnp.where(
        empty, 0.0, jnp.take_along_axis(s, max_idx[..., None], axis=-1)[..., 0]
    )

    # numpy-linear percentiles at q = 0.1 .. 0.9 (reference quirk preserved)
    pos = _QS[None, None, :] / 100.0 * (safe_n[..., None] - 1)  # (B, C, 9)
    k_lo = jnp.floor(pos).astype(jnp.int32)
    k_hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - k_lo
    v_lo = jnp.take_along_axis(s, jnp.clip(k_lo, 0, n_pix - 1), axis=-1)
    v_hi = jnp.take_along_axis(s, jnp.clip(k_hi, 0, n_pix - 1), axis=-1)
    pct = jnp.where(empty[..., None], 0.0, v_lo + frac * (v_hi - v_lo))

    wv = jnp.where(w, xt, 0.0)
    total = jnp.sum(wv, axis=-1)
    mean = total / safe_n
    dev = jnp.where(w, xt - mean[..., None], 0.0)
    m2 = jnp.sum(dev**2, axis=-1) / safe_n
    m3 = jnp.sum(dev**3, axis=-1) / safe_n
    m4 = jnp.sum(dev**4, axis=-1) / safe_n
    std = jnp.sqrt(m2)
    zero_var = m2 == 0
    safe_m2 = jnp.where(zero_var, 1.0, m2)
    nan = jnp.full_like(m2, jnp.nan)
    kurt = jnp.where(zero_var, nan, m4 / safe_m2**2 - 3.0)
    skew = jnp.where(zero_var, nan, m3 / safe_m2**1.5)

    # entropy over unique values: run-length on the sorted array
    is_valid = jnp.isfinite(s)
    newgrp = jnp.concatenate(
        [is_valid[..., :1],
         (s[..., 1:] != s[..., :-1]) & is_valid[..., 1:]],
        axis=-1,
    )
    # run lengths via run-start positions (no per-run segment ids needed)
    idx = jnp.arange(n_pix)[None, None, :]
    start_pos = jnp.where(newgrp, idx, n_pix)  # (B, C, P)
    starts_sorted = jnp.sort(start_pos, axis=-1)
    num_runs = jnp.sum(newgrp, axis=-1)  # (B, C)
    next_start = jnp.concatenate(
        [starts_sorted[..., 1:], jnp.full_like(starts_sorted[..., :1], n_pix)],
        axis=-1,
    )
    run_len = (jnp.minimum(next_start, n[..., None]) - starts_sorted).astype(
        jnp.float32
    )
    run_valid = starts_sorted < n[..., None]
    p = jnp.where(run_valid, run_len / safe_n[..., None], 1.0)
    entropy = -jnp.sum(
        jnp.where(run_valid & (p > 0), p * jnp.log2(jnp.where(p > 0, p, 1.0)), 0.0),
        axis=-1,
    )

    z = lambda a: jnp.where(empty, 0.0, a)
    feats = jnp.stack(
        [min_v]
        + [pct[..., i] for i in range(9)]
        + [max_v, z(total), z(mean), z(std),
           jnp.where(empty, 0.0, kurt), jnp.where(empty, 0.0, skew), z(entropy)],
        axis=-1,
    )
    return feats  # (B, C, 17)
