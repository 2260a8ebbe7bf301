"""Hybrid exact finalisation: device scalar-reduction + host f64 assembly.

Motivation: the 'host' backend fetches the full histograms (~7.7 KB/image)
and does O(B*C*L) float64 numpy — both of which are expensive when the host
is a single slow core behind a low-bandwidth device link. This backend moves
the O(L) work onto the device while *keeping exactness* for every feature
whose magnitude makes float32 insufficient:

* exact integers, representable in f32/i32 (< 2^24): pixel/pair counts,
  min/max levels, the level-weighted sum ``T = sum(hist*k)``, percentile
  *indices* (from integer CDF comparisons with integer positions
  ``q*10*(n-1)``), dissimilarity numerator, the marginal first moments
  ``S_i/S_j``, and base-256 limb pairs of the quadratic sums
  ``sum(marg*i^2)`` / ``sum(diff_hist*d^2)`` (reassembled in f64 on host —
  this is what makes contrast and the correlation covariance *exact* despite
  their ~1e8 magnitudes).
* f32-summed small-magnitude quantities (~1e-7 relative): central moments
  m2..m4 (computed from the exact integer deviation numerators
  ``e = n*k - T``, so there is no catastrophic cancellation), entropy,
  homogeneity, ASM sum-of-squares.

The host then assembles features with scalar f64 math on (B, C)-shaped
arrays only. Valid for per-channel pixel counts < 2^16 (u16-histogram
regime); ``extract_features`` falls back to the 'host' backend otherwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpumcia.features.finalize import FinalizedFeatures
from tpumcia.features.stats import SuffStats

_Q10 = np.arange(1, 10, dtype=np.int32)  # q*10 for q = 0.1 .. 0.9


@jax.jit
def _device_reduce(stats: SuffStats):
    f32 = jnp.float32
    i32 = jnp.int32
    hist = stats.hist.astype(i32)  # (B, C, L) exact counts
    B, C, L = hist.shape
    k = jnp.arange(L, dtype=i32)
    n = stats.count.astype(i32)  # (B, C)
    safe_n = jnp.maximum(n, 1)

    # --- intensity: exact integer pieces ---------------------------------
    nz = hist > 0
    min_lev = jnp.argmax(nz, axis=-1).astype(i32)
    max_lev = (L - 1) - jnp.argmax(nz[..., ::-1], axis=-1).astype(i32)
    total_raw = jnp.sum(hist * k, axis=-1)  # <= 255*65535 < 2^24, exact

    cdf = jnp.cumsum(hist, axis=-1)  # (B, C, L) i32
    num = _Q10[None, None, :] * (safe_n[..., None] - 1)  # exact i32
    k_lo = num // 1000
    rem = num - k_lo * 1000
    k_hi = k_lo + (rem > 0).astype(i32)

    def value_at(kq):  # (B, C, 9) -> level index of sorted order-statistic
        return jnp.sum(
            (cdf[:, :, None, :] <= kq[..., None]).astype(i32), axis=-1
        )

    idx_lo = value_at(k_lo)
    idx_hi = value_at(k_hi)

    # central moments: deviations from the *exact* mean numerator
    # e = n*k - T  (exact i32, |e| <= 255*65535); dev = e / (255*n)
    e = safe_n[..., None] * k[None, None, :] - total_raw[..., None]
    dev = e.astype(f32) / (255.0 * safe_n[..., None].astype(f32))
    hist_f = hist.astype(f32)
    dev2 = dev * dev
    hd2 = hist_f * dev2
    nf = safe_n.astype(f32)
    m2 = jnp.sum(hd2, axis=-1) / nf
    m3 = jnp.sum(hd2 * dev, axis=-1) / nf
    m4 = jnp.sum(hd2 * dev2, axis=-1) / nf

    p = hist_f / nf[..., None]
    entropy = -jnp.sum(
        jnp.where(p > 0, p * jnp.log2(jnp.where(p > 0, p, 1.0)), 0.0), axis=-1
    )

    # --- GLCM: exact integer pieces + f32 small sums ---------------------
    ml = stats.marg_l.astype(i32)
    mr = stats.marg_r.astype(i32)
    dh = stats.diff_hist.astype(i32)
    D = dh.shape[-1]
    d = jnp.arange(D, dtype=i32) - (L - 1)
    d2 = d * d
    i2 = k * k
    # base-256 limbs of the squares keep every partial sum < 2^24
    s_i2_hi = jnp.sum(ml * (i2 >> 8), axis=-1)
    s_i2_lo = jnp.sum(ml * (i2 & 255), axis=-1)
    s_j2_hi = jnp.sum(mr * (i2 >> 8), axis=-1)
    s_j2_lo = jnp.sum(mr * (i2 & 255), axis=-1)
    s_d2_hi = jnp.sum(dh * (d2 >> 8), axis=-1)
    s_d2_lo = jnp.sum(dh * (d2 & 255), axis=-1)
    s_i = jnp.sum(ml * k, axis=-1)  # exact first moments
    s_j = jnp.sum(mr * k, axis=-1)
    dissim_raw = jnp.sum(dh * jnp.abs(d), axis=-1)  # <= 255*65535, exact
    homog_sum = jnp.sum(
        dh.astype(f32) / (1.0 + d2.astype(f32)), axis=-1
    )

    return dict(
        n=n,
        vmax=stats.vmax,
        min_lev=min_lev,
        max_lev=max_lev,
        total_raw=total_raw,
        idx_lo=idx_lo,
        idx_hi=idx_hi,
        rem=rem,
        m2=m2,
        m3=m3,
        m4=m4,
        entropy=entropy,
        s_i2_hi=s_i2_hi,
        s_i2_lo=s_i2_lo,
        s_j2_hi=s_j2_hi,
        s_j2_lo=s_j2_lo,
        s_d2_hi=s_d2_hi,
        s_d2_lo=s_d2_lo,
        s_i=s_i,
        s_j=s_j,
        dissim_raw=dissim_raw,
        homog_sum=homog_sum,
        sumsq=stats.glcm_sumsq,
        npairs=stats.pair_count.astype(i32),
    )


# packing layout: 20 (B, C) scalars, then (B, C, k) vectors (percentile
# triples of 9 + the 4 sumsq limbs). Every value is exactly representable in
# f32 in the hybrid regime (integers < 2^24 or already f32).
_SCALAR_FIELDS = (
    "n", "vmax", "min_lev", "max_lev", "total_raw", "m2", "m3", "m4",
    "entropy", "s_i2_hi", "s_i2_lo", "s_j2_hi", "s_j2_lo", "s_d2_hi",
    "s_d2_lo", "s_i", "s_j", "dissim_raw", "homog_sum", "npairs",
)
_VEC_FIELDS = (("idx_lo", 9), ("idx_hi", 9), ("rem", 9), ("sumsq", 4))


@jax.jit
def _device_reduce_packed(stats: SuffStats) -> jax.Array:
    """Single (B, C, 51) f32 array — one D2H fetch instead of 25 (each fetch
    pays full round-trip latency on a remote device link)."""
    r = _device_reduce(stats)
    parts = [r[f].astype(jnp.float32)[..., None] for f in _SCALAR_FIELDS]
    parts += [r[f].astype(jnp.float32) for f, _ in _VEC_FIELDS]
    return jnp.concatenate(parts, axis=-1)


def unpack_reduced(packed: np.ndarray) -> dict:
    packed = np.asarray(packed)
    out = {}
    for i, f in enumerate(_SCALAR_FIELDS):
        out[f] = packed[..., i]
    base = len(_SCALAR_FIELDS)
    for f, width in _VEC_FIELDS:
        out[f] = packed[..., base : base + width]
        base += width
    return out


def finalize_hybrid(
    stats: SuffStats, *, include_intensity: bool = True, include_glcm: bool = True
) -> FinalizedFeatures:
    reduced = _device_reduce_packed(stats)
    return assemble_reduced(
        unpack_reduced(reduced),
        levels=stats.hist.shape[-1],
        include_intensity=include_intensity,
        include_glcm=include_glcm,
    )


def assemble_reduced(
    reduced: dict,
    *,
    levels: int = 256,
    include_intensity: bool = True,
    include_glcm: bool = True,
) -> FinalizedFeatures:
    """Host f64 assembly of a (possibly pre-dispatched) device reduction."""
    r = {kk: np.asarray(v) for kk, v in reduced.items()}  # one small D2H fetch
    f64 = np.float64
    top = float(levels - 1)  # level value divisor

    n = r["n"].astype(f64)
    safe_n = np.maximum(n, 1)
    empty = n == 0
    z = lambda a: np.where(empty, 0.0, a)

    blocks = []
    B, C = r["n"].shape
    if include_intensity:
        min_v = z(r["min_lev"].astype(f64) / top)
        max_v = z(r["max_lev"].astype(f64) / top)
        frac = r["rem"].astype(f64) / 1000.0
        pct = (r["idx_lo"] + frac * (r["idx_hi"] - r["idx_lo"])) / top
        pct = np.where(empty[..., None], 0.0, pct)
        total = r["total_raw"].astype(f64) / top
        mean = total / safe_n
        m2 = r["m2"].astype(f64)
        std = np.sqrt(m2)
        zero_var = m2 == 0
        safe_m2 = np.where(zero_var, 1.0, m2)
        nanv = np.full_like(m2, np.nan)
        kurt = np.where(zero_var, nanv, r["m4"] / (safe_m2 * safe_m2) - 3.0)
        skew = np.where(zero_var, nanv, r["m3"] / safe_m2**1.5)
        feats = np.stack(
            [min_v]
            + [pct[..., i] for i in range(9)]
            + [max_v, z(total), z(mean), z(std),
               np.where(empty, 0.0, kurt), np.where(empty, 0.0, skew),
               z(r["entropy"].astype(f64))],
            axis=-1,
        )
        blocks.append(feats.reshape(B, -1))

    if include_glcm:
        N = r["npairs"].astype(f64)
        safe_N = np.maximum(N, 1.0)
        # limbs must be widened *before* reassembly: a float32 array times a
        # python float stays float32 under NumPy 2 promotion, and 256*hi
        # overflows the f32 integer range
        s_d2 = 256.0 * r["s_d2_hi"].astype(f64) + r["s_d2_lo"].astype(f64)
        s_i2 = 256.0 * r["s_i2_hi"].astype(f64) + r["s_i2_lo"].astype(f64)
        s_j2 = 256.0 * r["s_j2_hi"].astype(f64) + r["s_j2_lo"].astype(f64)
        s_i = r["s_i"].astype(f64)
        s_j = r["s_j"].astype(f64)

        contrast = s_d2 / safe_N
        dissimilarity = r["dissim_raw"].astype(f64) / safe_N
        homogeneity = r["homog_sum"].astype(f64) / safe_N
        from tpumcia.features.stats import glcm_sumsq_value

        asm = glcm_sumsq_value(r["sumsq"], np, f64) / (safe_N * safe_N)
        energy = np.sqrt(asm)
        # correlation from exact integer sums: cov*N^2 = N*s_ij - s_i*s_j
        s_ij = (s_i2 + s_j2 - s_d2) / 2.0
        cov_nn = safe_N * s_ij - s_i * s_j
        var_i_nn = safe_N * s_i2 - s_i * s_i
        var_j_nn = safe_N * s_j2 - s_j * s_j
        denom = np.sqrt(np.maximum(var_i_nn, 0.0) * np.maximum(var_j_nn, 0.0))
        # skimage: correlation = 1 when either marginal std ~ 0. var_nn are
        # exact integers, so zero variance is exactly var_nn == 0 (the
        # smallest nonzero integer variance gives std >> skimage's 1e-15).
        ok = (var_i_nn > 0) & (var_j_nn > 0)
        correlation = np.where(ok, cov_nn / np.where(ok, denom, 1.0), 1.0)
        glcm = np.stack(
            [contrast, dissimilarity, homogeneity, asm, energy, correlation],
            axis=-1,
        )
        blocks.append(glcm.reshape(B, -1))

    values = np.concatenate(blocks, axis=1)
    degenerate = (r["n"] == 0) | (r["vmax"] <= 0)
    return FinalizedFeatures(values=values, degenerate=degenerate)
