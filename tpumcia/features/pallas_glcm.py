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

Layout design (the part that matters on TPU): every HBM operand keeps its
pixel axis on *lanes* — inputs are (B, C, K, CHUNK) chunk rows and outputs are
(B, C, 1, L) rows, so nothing acquires a size-1 minor dimension (XLA pads
those 128x in HBM). In-kernel, one-hots are built *transposed* — levels on
sublanes, pixels on lanes, via a broadcasted sublane iota — and every
reduction is an ``A @ B^T`` contraction over the lane axis, which lands
row-oriented for direct output stores. Zero reshapes/transposes/dynamic
slices; the reference's rescale-LUT row (a function of the channel max) is
pre-gathered per (image, channel) by the surrounding XLA prologue.

Contract identical to ``stats.sufficient_stats`` (same :class:`SuffStats`);
golden tests assert equality against both the XLA path and the CPU oracle.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpumcia.features.stats import SuffStats, rescale_lut, _prep_inputs

_CHUNK = 2048  # pixels/pairs per grid step (lane-major), ~8 MB peak VMEM
# int8 one-hot matmuls (s8 x s8 -> s32) run ~20% faster than bf16 on the v5e
# MXU and stay exact (operands are 0/1, accumulators are integer counts).
# Set TPUMCIA_KERNEL_INT8=0 to fall back to bf16.
_USE_INT8 = os.environ.get("TPUMCIA_KERNEL_INT8", "1") == "1"


def _rowdot(a, b):
    """(1, N) x (M, N) -> (1, M): contraction over the lane axis (A @ B^T)."""
    acc = jnp.int32 if _USE_INT8 else jnp.float32
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=acc,
    ).astype(jnp.float32)


def _kernel(
    in_ref,  # (1, 1, K*5, CH) int32: K chunks of (raw, mask, left, right, pw)
    row_ref,  # (1, 1, 1, L) f32     rescale LUT row for this channel's max
    hist_ref,  # (1, 1, 1, L) f32     -- outputs, written once per (b, c) --
    count_ref,  # (1, 1, 1, 1) f32
    marg_l_ref,  # (1, 1, 1, L) f32
    marg_r_ref,  # (1, 1, 1, L) f32
    diff_ref,  # (1, 1, 1, DPAD) f32
    sumsq_ref,  # (1, 1, 1, 4) i32 limbs (see stats._glcm_sumsq_limbs)
    pairs_ref,  # (1, 1, 1, 1) f32
    *,
    levels: int,
    dpad: int,
    num_chunks: int,
):
    L = levels
    f32 = jnp.float32
    bf16 = jnp.int8 if _USE_INT8 else jnp.bfloat16
    acc = jnp.int32 if _USE_INT8 else jnp.float32

    packed_all = in_ref[0, 0]  # (K*5, CH) i32; one DMA per grid step
    row = row_ref[0, 0]  # (1, L) f32; row values up to 255 exceed int8
    CH = packed_all.shape[1]
    iota_lvl = jax.lax.broadcasted_iota(jnp.int32, (L, CH), 0)
    iota_d = jax.lax.broadcasted_iota(jnp.int32, (dpad, CH), 0)
    ones = jnp.ones((1, CH), bf16)

    hist = jnp.zeros((1, L), f32)
    count = jnp.zeros((1, 1), f32)
    marg_l = jnp.zeros((1, L), f32)
    marg_r = jnp.zeros((1, L), f32)
    diffh = jnp.zeros((1, dpad), f32)
    pairs = jnp.zeros((1, 1), f32)
    # integer accumulator on the int8 path keeps counts exact to 2^31
    glcm = jnp.zeros((L, L), acc)

    # the chunk loop is unrolled in-kernel: one grid step per (image, channel)
    # with write-once outputs (no revisited blocks, no init/emit predication)
    for k in range(num_chunks):
        base = 5 * k
        raw = packed_all[base : base + 1, :]  # (1, CH)
        wb = packed_all[base + 1 : base + 2, :] > 0
        lraw = packed_all[base + 2 : base + 3, :]
        rraw = packed_all[base + 3 : base + 4, :]
        pwb = packed_all[base + 4 : base + 5, :] > 0
        pw = pwb.astype(bf16)

        # mask weights are binary, so weighting a one-hot is a boolean AND —
        # this keeps every operand a plain 0/1 cast (int8-matmul friendly)
        oh_raw_t = ((raw == iota_lvl) & wb).astype(bf16)  # (L, CH) weighted
        hist += _rowdot(ones, oh_raw_t)
        count += jnp.sum(wb.astype(f32), axis=1, keepdims=True)

        # Reference rescale (ipynb:293-295): raw -> uint8 level via the
        # pre-gathered LUT row:  resc[p] = sum_l row[l] * onehot_t[l, p]
        oh_lraw_t = (lraw == iota_lvl).astype(bf16)
        oh_rraw_t = (rraw == iota_lvl).astype(bf16)
        resc_l = jnp.dot(
            row, oh_lraw_t.astype(jnp.bfloat16) if _USE_INT8 else oh_lraw_t,
            preferred_element_type=f32,
        ).astype(jnp.int32)
        resc_r = jnp.dot(
            row, oh_rraw_t.astype(jnp.bfloat16) if _USE_INT8 else oh_rraw_t,
            preferred_element_type=f32,
        ).astype(jnp.int32)

        oh_l_t = ((resc_l == iota_lvl) & pwb).astype(bf16)  # (L, CH) weighted
        oh_r_t = (resc_r == iota_lvl).astype(bf16)
        marg_l += _rowdot(ones, oh_l_t)
        marg_r += _rowdot(pw, oh_r_t)

        diff = resc_l - resc_r + (L - 1)  # (1, CH) in [0, 2L-2]
        oh_d_t = ((diff == iota_d) & pwb).astype(bf16)  # (dpad, CH) weighted
        diffh += _rowdot(ones, oh_d_t)

        # G[i, j] += sum_p pw_p * [l_p == i] * [r_p == j]  — lane contraction
        # (pair weight already folded into oh_l_t)
        glcm += jax.lax.dot_general(
            oh_l_t,
            oh_r_t,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc,
        )  # (L, L)
        pairs += jnp.sum(pwb.astype(f32), axis=1, keepdims=True)

    hist_ref[0, 0] = hist
    count_ref[0, 0] = count
    marg_l_ref[0, 0] = marg_l
    marg_r_ref[0, 0] = marg_r
    diff_ref[0, 0] = diffh
    # exact sum(G^2) as base-2^k integer limbs (stats._glcm_sumsq_limbs):
    # c = a*2^12 + b -> S = 2^24*S(a^2) + 2^13*S(ab) + 2^8*S(b^2>>8) + S(b^2&255)
    g = glcm.astype(jnp.int32)
    ga = g >> 12
    gb = g & 4095
    gbb = gb * gb

    def _total(x):  # (L, L) i32 -> (1, 1)
        return jnp.sum(jnp.sum(x, axis=0, keepdims=True), axis=1, keepdims=True)

    iota4 = jax.lax.broadcasted_iota(jnp.int32, (1, 4), 1)
    sumsq_ref[0, 0] = (
        _total(ga * ga) * (iota4 == 0)
        + _total(ga * gb) * (iota4 == 1)
        + _total(gbb >> 8) * (iota4 == 2)
        + _total(gbb & 255) * (iota4 == 3)
    )
    pairs_ref[0, 0] = pairs


def _chunk_rows(x, total, K, CH):
    """(B, C, N) -> zero-padded (B, C, K, 1, CH), pixels kept on lanes (the
    singleton axis makes the block's trailing dims equal the array's, per
    Mosaic's block-shape rule)."""
    B, C, n = x.shape
    if n != total:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, total - n)))
    return x.reshape(B, C, K, 1, CH)


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

    # XLA prologue: compute the channel max and gather its rescale LUT row
    # (ipynb:293-295 semantics, exact via the LUT).
    vmax = jnp.max(jnp.where(w > 0, img, -1), axis=(2, 3)).astype(jnp.int32)  # (B,C)
    rows = jnp.take(lut.astype(f32), jnp.clip(vmax, 0, L - 1).reshape(-1), axis=0)
    rows = rows.reshape(B, C, 1, L)

    HW = H * W
    CH = min(_CHUNK, max(128, HW))
    K = -(-HW // CH)
    total = K * CH
    wi = (w > 0).astype(jnp.int32)
    streams = [
        img.reshape(B, C, HW),
        wi.reshape(B, C, HW),
        img[:, :, r0:r1, c0:c1].reshape(B, C, -1),
        img[:, :, r0 + dr : r1 + dr, c0 + dc : c1 + dc].reshape(B, C, -1),
        (wi[:, :, r0:r1, c0:c1]
         * wi[:, :, r0 + dr : r1 + dr, c0 + dc : c1 + dc]).reshape(B, C, -1),
    ]
    # one packed operand -> one input DMA per grid step instead of five,
    # with all K chunks in the block (the kernel unrolls the chunk loop)
    packed = jnp.stack(
        [_chunk_rows(x.astype(jnp.int32), total, K, CH) for x in streams],
        axis=4,
    )[:, :, :, 0, :, :].reshape(B, C, K * 5, CH)

    grid = (B, C)
    in_spec = pl.BlockSpec(
        (1, 1, K * 5, CH), lambda b, c: (b, c, 0, 0), memory_space=pltpu.VMEM
    )
    row_spec = pl.BlockSpec(
        (1, 1, 1, L), lambda b, c: (b, c, 0, 0), memory_space=pltpu.VMEM
    )
    vec = lambda n: pl.BlockSpec(
        (1, 1, 1, n), lambda b, c: (b, c, 0, 0), memory_space=pltpu.VMEM
    )
    scal = pl.BlockSpec(
        (1, 1, 1, 1), lambda b, c: (b, c, 0, 0), memory_space=pltpu.VMEM
    )

    out_shapes = (
        jax.ShapeDtypeStruct((B, C, 1, L), f32),  # hist
        jax.ShapeDtypeStruct((B, C, 1, 1), f32),  # count
        jax.ShapeDtypeStruct((B, C, 1, L), f32),  # marg_l
        jax.ShapeDtypeStruct((B, C, 1, L), f32),  # marg_r
        jax.ShapeDtypeStruct((B, C, 1, dpad), f32),  # diff_hist (padded)
        jax.ShapeDtypeStruct((B, C, 1, 4), jnp.int32),  # sumsq limbs
        jax.ShapeDtypeStruct((B, C, 1, 1), f32),  # pair_count
    )
    out_specs = (vec(L), scal, vec(L), vec(L), vec(dpad), vec(4), scal)

    kernel = functools.partial(_kernel, levels=L, dpad=dpad, num_chunks=K)
    hist, count, marg_l, marg_r, diff, sumsq, pairs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_spec, row_spec],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(packed, rows)

    return SuffStats(
        hist=hist[:, :, 0, :],
        count=count[:, :, 0, 0],
        vmax=vmax,
        marg_l=marg_l[:, :, 0, :],
        marg_r=marg_r[:, :, 0, :],
        diff_hist=diff[:, :, 0, : 2 * L - 1],
        glcm_sumsq=sumsq[:, :, 0, :],
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
