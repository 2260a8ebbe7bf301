"""Fused Pallas TPU kernel for the per-(image, channel) sufficient statistics.

Grid = (image, channel, pixel-chunk). Each step reduces one chunk of pixels /
pixel-pairs into revisited per-(image, channel) output blocks: raw-level
histogram, GLCM marginals, level-difference histogram, and a VMEM-resident
256x256 co-occurrence accumulator whose sum of squares (for ASM/energy) is
emitted on the last chunk. No intermediate (one-hots, co-occurrence matrix)
ever touches HBM.

This replaces the reference's Cython ``_glcm_loop`` scatter (ipynb:298) with
an MXU-native formulation: scatter-free one-hot contractions
(``G = onehot(left)^T @ onehot(right)``), per the SURVEY.md §2.2 plan.

Mosaic notes: no reshapes, transposes, gathers or dynamic slices inside the
kernel. Operands arrive pre-flattened as (N, 1) columns (compact in HBM; the
lane padding only exists in VMEM, which is why pixels are chunked), and the
reference's rescale LUT row (a function of the channel max) is pre-gathered
per (image, channel) by the surrounding XLA prologue.

Contract identical to ``stats.sufficient_stats`` (same :class:`SuffStats`);
golden tests assert equality against both the XLA path and the CPU oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpumcia.features.stats import SuffStats, rescale_lut, _prep_inputs

_CHUNK = 1024  # pixels/pairs per grid step; sized for ~11 MB peak VMEM


def _kernel(
    raw_ref,  # (1, 1, CH, 1) int32   raw levels (chunk), column layout
    w_ref,  # (1, 1, CH, 1) f32    mask weights (chunk)
    lraw_ref,  # (1, 1, CH, 1) int32   left pair endpoints (chunk)
    rraw_ref,  # (1, 1, CH, 1) int32   right pair endpoints (chunk)
    pw_ref,  # (1, 1, CH, 1) f32    pair weights (chunk)
    row_ref,  # (1, 1, L, 1) f32     rescale LUT row for this channel's max
    hist_ref,  # (1, 1, 1, L) f32     -- outputs, revisited across chunks --
    count_ref,  # (1, 1, 1, 1) f32
    marg_l_ref,  # (1, 1, 1, L) f32
    marg_r_ref,  # (1, 1, 1, L) f32
    diff_ref,  # (1, 1, 1, DPAD) f32
    sumsq_ref,  # (1, 1, 1, 1) f32
    pairs_ref,  # (1, 1, 1, 1) f32
    glcm_acc,  # (L, L) f32 scratch   co-occurrence accumulator
    *,
    levels: int,
    dpad: int,
):
    L = levels
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    k = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(k == 0)
    def _init():
        hist_ref[...] = jnp.zeros_like(hist_ref)
        count_ref[...] = jnp.zeros_like(count_ref)
        marg_l_ref[...] = jnp.zeros_like(marg_l_ref)
        marg_r_ref[...] = jnp.zeros_like(marg_r_ref)
        diff_ref[...] = jnp.zeros_like(diff_ref)
        sumsq_ref[...] = jnp.zeros_like(sumsq_ref)
        pairs_ref[...] = jnp.zeros_like(pairs_ref)
        glcm_acc[...] = jnp.zeros_like(glcm_acc)

    raw = raw_ref[0, 0]  # (CH, 1) i32
    w = w_ref[0, 0]  # (CH, 1) f32
    CH = raw.shape[0]

    iota_c = jax.lax.broadcasted_iota(jnp.int32, (CH, L), 1)
    oh_raw = ((raw == iota_c).astype(f32) * w).astype(bf16)  # (CH, L) weighted

    ones_c = jnp.ones((1, CH), bf16)
    hist_ref[0, 0] += jnp.dot(ones_c, oh_raw, preferred_element_type=f32)
    count_ref[0, 0] += jnp.sum(w, axis=0, keepdims=True)

    lraw = lraw_ref[0, 0]  # (CH, 1) i32
    rraw = rraw_ref[0, 0]
    pw = pw_ref[0, 0]  # (CH, 1) f32
    row_bf = row_ref[0, 0].astype(bf16)  # (L, 1) rescale map as a column

    oh_lraw = (lraw == iota_c).astype(bf16)
    oh_rraw = (rraw == iota_c).astype(bf16)
    resc_l = jnp.dot(oh_lraw, row_bf, preferred_element_type=f32).astype(jnp.int32)
    resc_r = jnp.dot(oh_rraw, row_bf, preferred_element_type=f32).astype(jnp.int32)

    oh_l = ((resc_l == iota_c).astype(f32) * pw).astype(bf16)  # weighted
    oh_r = (resc_r == iota_c).astype(bf16)

    marg_l_ref[0, 0] += jnp.dot(ones_c, oh_l, preferred_element_type=f32)
    marg_r_ref[0, 0] += jnp.dot(
        ones_c, (oh_r.astype(f32) * pw).astype(bf16), preferred_element_type=f32
    )

    diff = resc_l - resc_r + (L - 1)  # (CH, 1) in [0, 2L-2]
    iota_d = jax.lax.broadcasted_iota(jnp.int32, (CH, dpad), 1)
    oh_d = ((diff == iota_d).astype(f32) * pw).astype(bf16)
    diff_ref[0, 0] += jnp.dot(ones_c, oh_d, preferred_element_type=f32)

    glcm_acc[...] += jax.lax.dot_general(
        oh_l,
        oh_r,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )  # (L, L)
    pairs_ref[0, 0] += jnp.sum(pw, axis=0, keepdims=True)

    @pl.when(k == num_k - 1)
    def _emit_sumsq():
        g = glcm_acc[...]
        s = jnp.sum(g * g, axis=0, keepdims=True)  # (1, L)
        sumsq_ref[0, 0] = jnp.sum(s, axis=1, keepdims=True)


def _pad_cols(x, total):
    """(B, C, N, 1) -> zero-padded (B, C, total, 1)."""
    n = x.shape[2]
    if n == total:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, total - n), (0, 0)))


@functools.partial(jax.jit, static_argnames=("levels", "offset", "interpret"))
def _pallas_stats_jit(img, w, lut, *, levels, offset, interpret=False):
    B, C, H, W = img.shape
    L = levels
    dpad = 2 * L  # 2L-1 rounded up to a lane-friendly size
    f32 = jnp.float32

    dr, dc = offset
    r0, r1 = max(0, -dr), H - max(0, dr)
    c0, c1 = max(0, -dc), W - max(0, dc)
    if r0 >= r1 or c0 >= c1:
        raise ValueError(f"GLCM offset {offset} leaves no valid pairs for {H}x{W}")

    # XLA prologue: flatten to column layout, compute the channel max and
    # gather its rescale LUT row (ipynb:293-295 semantics, exact via the LUT).
    vmax = jnp.max(jnp.where(w > 0, img, -1), axis=(2, 3)).astype(jnp.int32)  # (B,C)
    rows = jnp.take(lut.astype(f32), jnp.clip(vmax, 0, L - 1).reshape(-1), axis=0)
    rows = rows.reshape(B, C, L, 1)

    HW = H * W
    K = -(-HW // _CHUNK)
    total = K * _CHUNK
    raw_col = _pad_cols(img.reshape(B, C, HW, 1), total)
    w_col = _pad_cols(w.astype(f32).reshape(B, C, HW, 1), total)
    lraw = _pad_cols(img[:, :, r0:r1, c0:c1].reshape(B, C, -1, 1), total)
    rraw = _pad_cols(
        img[:, :, r0 + dr : r1 + dr, c0 + dc : c1 + dc].reshape(B, C, -1, 1), total
    )
    pw = _pad_cols(
        (w[:, :, r0:r1, c0:c1] * w[:, :, r0 + dr : r1 + dr, c0 + dc : c1 + dc])
        .astype(f32)
        .reshape(B, C, -1, 1),
        total,
    )

    grid = (B, C, K)
    chunk = lambda: pl.BlockSpec(
        (1, 1, _CHUNK, 1), lambda b, c, k: (b, c, k, 0), memory_space=pltpu.VMEM
    )
    row_spec = pl.BlockSpec(
        (1, 1, L, 1), lambda b, c, k: (b, c, 0, 0), memory_space=pltpu.VMEM
    )
    vec = lambda n: pl.BlockSpec(
        (1, 1, 1, n), lambda b, c, k: (b, c, 0, 0), memory_space=pltpu.VMEM
    )
    scal = pl.BlockSpec(
        (1, 1, 1, 1), lambda b, c, k: (b, c, 0, 0), memory_space=pltpu.VMEM
    )

    out_shapes = (
        jax.ShapeDtypeStruct((B, C, 1, L), f32),  # hist
        jax.ShapeDtypeStruct((B, C, 1, 1), f32),  # count
        jax.ShapeDtypeStruct((B, C, 1, L), f32),  # marg_l
        jax.ShapeDtypeStruct((B, C, 1, L), f32),  # marg_r
        jax.ShapeDtypeStruct((B, C, 1, dpad), f32),  # diff_hist (padded)
        jax.ShapeDtypeStruct((B, C, 1, 1), f32),  # sumsq
        jax.ShapeDtypeStruct((B, C, 1, 1), f32),  # pair_count
    )
    out_specs = (vec(L), scal, vec(L), vec(L), vec(dpad), scal, scal)

    kernel = functools.partial(_kernel, levels=L, dpad=dpad)
    hist, count, marg_l, marg_r, diff, sumsq, pairs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[chunk(), chunk(), chunk(), chunk(), chunk(), row_spec],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((L, L), f32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
    )(raw_col, w_col, lraw, rraw, pw, rows)

    return SuffStats(
        hist=hist[:, :, 0, :],
        count=count[:, :, 0, 0],
        vmax=vmax,
        marg_l=marg_l[:, :, 0, :],
        marg_r=marg_r[:, :, 0, :],
        diff_hist=diff[:, :, 0, : 2 * L - 1],
        glcm_sumsq=sumsq[:, :, 0, 0],
        pair_count=pairs[:, :, 0, 0],
    )


def sufficient_stats_pallas(
    images,
    mask=None,
    *,
    levels: int = 256,
    offset: tuple[int, int] = (0, 5),
    with_intensity: bool = True,  # kernel always computes both; kept for API parity
    with_glcm: bool = True,
    interpret: bool = False,
) -> SuffStats:
    """Pallas-fused version of :func:`tpumcia.features.stats.sufficient_stats`.

    ``interpret=True`` runs the kernel in the Pallas interpreter (for CPU
    tests).
    """
    del with_intensity, with_glcm
    img, w = _prep_inputs(images, mask)
    lut = jnp.asarray(rescale_lut(levels))
    return _pallas_stats_jit(
        img, w, lut, levels=levels, offset=offset, interpret=interpret
    )
