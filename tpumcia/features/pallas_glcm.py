"""Fused Pallas TPU kernel for the per-(image, channel) sufficient statistics.

Grid = (image,); channels and pixel-chunks are unrolled in-kernel. Each grid
step reduces one image's pixels/pixel-pairs into per-(image, channel) output
blocks: raw-level histogram, GLCM marginals, level-difference histogram, and
a VMEM-resident LxL co-occurrence accumulator whose exact sum of squares
(for ASM/energy) is emitted as int32 limbs. No intermediate (one-hots,
co-occurrence matrix) ever touches HBM.

This replaces the reference's Cython ``_glcm_loop`` scatter (ipynb:298) with
an MXU-native formulation: scatter-free one-hot contractions
(``G = onehot(left)^T @ onehot(right)``), per the SURVEY.md §2.2 plan.

v2 kernel — the r1 kernel's cost was NOT the math: profiling showed its XLA
prologue (an interleaved 5-stream pack) cost ~31 of the 34 us/image. The
restructure:

* **No packing.** The kernel reads the image as a free reshape
  ``(B, C, K, CHUNK)`` of the level array plus ONE contiguous flat-shifted
  copy (the co-occurring neighbour at ``s = dr*W + dc``); pair validity
  (offset window + padding) is reconstructed in-kernel from lane iotas, so
  the left stream IS the raw stream and no interleaved copy exists at all.
  Without a mask the two mask streams vanish entirely (``has_mask`` is a
  static specialisation).
* **Factorized histograms.** A 256-bin histogram is a 16x16 outer product:
  ``hist[h*16+l] = sum_p [raw_p>>4 == h][raw_p&15 == l]`` — two (16, CH)
  compares and ONE int8 matmul instead of a (256, CH) one-hot, 16x less VPU
  work. The 511-bin difference histogram factorizes the same way (32x16).
* **Boundary one-hots for the rescale.** The reference's rescale LUT row
  (ipynb:293-295) is monotone in the raw level, so the one-hot of the
  *rescaled* value is built directly from raw levels with two compares
  against per-level ``[start_i, end_i)`` boundaries (``start_i = #{v:
  row[v] < i}``, computed in-kernel once per channel from the row) —
  eliminating the raw left/right one-hots and their LUT matvecs. The
  rescaled values themselves (for the difference histogram) are recovered
  with an iota matvec over the already-built one-hot.
* **Grid over images only**, channels unrolled in-kernel, amortising
  per-grid-step overhead over C channels.

v3 kernel — measured ablation at B=2048 (17.9 us/img): one-hot construction
5.6, diff path 5.1, G matmul 3.3 (MXU roofline), hist+fixed 3.0. Changes:

* **Sentinel masking.** Pair validity folds into the left raw stream as a
  ``-1`` sentinel (one (1, CH) select) instead of an (L, CH) boolean AND on
  the built one-hot (-2.4 us/img).
* **s8 nibble matvecs for the rescaled values.** ``resc = 16*(hi_w @ oh) +
  lo_w @ oh`` with int8 nibble weights replaces the (L, CH) i8->bf16 cast +
  bf16 iota matvec per side (-2.0 us/img). 13.55 us/img (73.8k img/s) after
  both.
* **Static counts.** The maskless kernel's pixel/pair counts are Python
  constants of the offset window — no VPU reductions.
* Rejected by measurement: 2 images/grid step (+1.4% only, VMEM-OOM at 4);
  int8/bf16/bool-shift single-compare one-hots (Mosaic won't legalize
  ``arith.subi``/``arith.cmpf`` on packed sub-32-bit vectors or mask
  concats).

v4 kernel — everything re-derivable from the VMEM G accumulator moves out of
the per-pixel-chunk loop to one end-of-channel pass:

* **Marginals from G.** ``marg_l`` = row sums and ``marg_r`` = column sums
  of the accumulator, two (1, L) x (L, L) f32 matvecs per channel at
  HIGHEST precision (integer-exact: counts < 2^24) — the per-chunk marginal
  matvecs are gone.
* **Counts from the accumulators.** Masked pixel count = sum(hist), pair
  count = sum(G); the per-chunk VPU count reductions are gone.
* **diff-derived stats from G** (``need_diff_hist=False``, the hybrid-wire
  path): the only quantities the wire reads off the difference histogram —
  ``sum(G*(i-j)^2)`` (as base-256 limbs, each < 2^24 exact),
  ``sum(G*|i-j|)``, and ``sum(G/(1+(i-j)^2))`` — are emitted directly as
  fixed weight-plane reductions of G (``SuffStats.dstats``), and the whole
  per-chunk difference path (two stacked s8 nibble matvecs, the diff
  one-hot compares, the (2L/16, 16) matmul) is compiled out. The full
  difference histogram stays available behind ``need_diff_hist=True`` for
  the 'exact' backend.

v5 kernel — the rescale runs through the NIBBLE factorization instead of
(L, CH) boundary compares:

* The LUT row ships as an (L/16, 16) value grid; per chunk,
  ``R = (rowh @ oh_lo) * 16 + rowl @ oh_lo`` recovers ``row[16h + lo(p)]``
  for every hi-bucket (two narrow (L/16, 16) x (16, CH) matmuls on the
  already-built histogram nibble one-hots), and the pixel's rescaled value
  is the hi-bucket select ``sum(oh_hi * R, axis=0)``.
* The (L, CH) one-hot is then ONE equality compare against a sublane iota
  (sentinel applied to the value first) instead of two boundary compares
  + AND — half the (L, CH)-class VPU work per stream.
* The rescaled values come for free for the difference path, so the v3
  stacked nibble matvecs are gone from the full kernel too, and the
  per-channel (L, L) boundary construction disappears entirely.

v6 (r4) — measured restructures; default = in-kernel rolled neighbour
stream:

* **Rolled neighbour stream (default).** Single-chunk images with a
  positive flat offset derive the co-occurring neighbour in-kernel with a
  lane roll (``pltpu.roll``) instead of reading a materialised
  flat-shifted HBM copy — the wrapped lanes all fall outside the
  offset-validity window, so the circular wrap is harmless. Halves the
  chunk-stream HBM traffic and deletes the XLA pad+copy prologue stage;
  measured e2e bench 47.9k -> 54.7k img/s (r4 probe). Ineligible shapes
  fall back to the copy path (``TPUMCIA_KERNEL_SHIFT=copy`` forces it).
* **One-step software pipeline (default).** Step i+1's one-hot
  construction is emitted before step i's MXU accumulates
  (``TPUMCIA_KERNEL_SCHED=pipelined``). Measured upside is real but
  bounded: wire 10.38 -> 9.61 us/img (pipelined+roll), 9.23 with the
  VMEM-heavy ``phased`` variant at small C*K — the serialized VPU+MXU
  chain is mostly a genuine dependence/issue-port limit, not a
  scheduling artifact (r4 probe; ablation puts G+epilogue at ~6-8
  us/img of the 10.4). ``serial`` restores the pre-r4 order.

Layout design (the part that matters on TPU): every HBM operand keeps its
pixel axis on *lanes* — inputs are (B, C, K, CHUNK) chunk rows, outputs are
(B, C, 1, L) rows or (B, C, HI, 16) factor grids, so nothing acquires a
size-1 minor dimension (XLA pads those 128x in HBM). In-kernel, one-hots are
built *transposed* — levels on sublanes, pixels on lanes, via broadcasted
sublane iotas — and every reduction is an ``A @ B^T`` contraction over the
lane axis, which lands row-oriented for direct output stores. Zero reshapes/
transposes/dynamic slices in-kernel; factor grids are reshaped to flat
histograms by the surrounding XLA epilogue.

Contract identical to ``stats.sufficient_stats`` (same :class:`SuffStats`);
golden tests assert equality against both the XLA path and the CPU oracle.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpumcia.features.stats import (
    SuffStats,
    rescale_lut_device,
    _prep_inputs,
)

# pixels/pairs per chunk (lane-major). Dev knob: with the pipelined
# schedule, smaller chunks create MORE (channel, chunk) steps per image
# for VPU/MXU overlap (at CHUNK=4096 a 64x64 image is one chunk, so only
# C steps exist) at the price of shorter MXU contractions.
_CHUNK = int(os.environ.get("TPUMCIA_KERNEL_CHUNK", "4096"))
# int8 one-hot matmuls (s8 x s8 -> s32) run faster than bf16 on the v5e MXU
# and stay exact (operands are 0/1, accumulators are integer counts).
# Set TPUMCIA_KERNEL_INT8=0 to fall back to bf16.
# TPUMCIA_KERNEL_OH=int4 is a dev-only experiment knob (sub-byte one-hot
# operands; Mosaic support is version-dependent — not a supported config).
_USE_INT8 = os.environ.get("TPUMCIA_KERNEL_INT8", "1") == "1"
_OH_KIND = os.environ.get("TPUMCIA_KERNEL_OH", "int8" if _USE_INT8 else "bf16")

# ---- dev-only measurement knobs (default off; production = all empty) ----
# TPUMCIA_KERNEL_ABLATE: comma list of kernel pieces to DISABLE so their
# cost can be bisected on hardware (results are WRONG with any piece off):
#   g         - skip the G matmul accumulate
#   onehot    - replace the two (L, CH) one-hot equalities with reused
#               nibble one-hot slices (keeps shapes, kills the compare cost)
#   recovery  - skip the 4 value-recovery matmuls (raw levels as values)
#   hist      - skip the histogram factor matmul
#   epilogue  - skip the end-of-channel emission (marginals/sumsq/dstats)
_ABLATE = frozenset(
    p for p in os.environ.get("TPUMCIA_KERNEL_ABLATE", "").split(",") if p
)
# TPUMCIA_KERNEL_SURROGATE: NON-DCE cost bisection (results wrong by
# design). Unlike _ABLATE — where skipping a stage also dead-codes its
# producers/consumers, so stage costs overlap and cannot be attributed —
# each surrogate replaces ONE stage with a same-shape trivial op that still
# CONSUMES the stage's inputs and FEEDS its consumers, so every other
# stage's work stays live and `t_full - t_surrogate(stage)` is that stage's
# marginal cost (kernel v7 cycle model, VERDICT r4 #1):
#   g        - G matmul -> slice-add of the one-hots into the accumulator
#              (one-hot compares still execute; epilogue still reads G).
#              Requires CH >= L (true at the bench shapes).
#   epilogue - marginals/sumsq/dstats/pairs -> trivial slices of the G
#              accumulator (G stays fully live; the reduction passes go)
#   onehot   - the two (L, CH) equality compares -> reused nibble one-hot
#              rows, with the recovered values consumed through a (1, 16)
#              checksum folded into the hist accumulator (recovery stays
#              live, unlike the ABLATE variant which dead-codes it)
_SURROGATE = frozenset(
    p for p in os.environ.get("TPUMCIA_KERNEL_SURROGATE", "").split(",") if p
)
# TPUMCIA_KERNEL_SCHED: how the (channel, chunk) loop is ordered to expose
# VPU/MXU overlap to the Mosaic scheduler (all bit-identical by test):
#   auto      - DEFAULT (production since r5): `phased` when the kernel has
#               at most _PHASED_MAX_STEPS (channel, chunk) steps — the
#               bench/eval shapes (C=3, single chunk) — else `pipelined`.
#   pipelined - one-step software pipeline — step i+1's one-hot
#               construction (VPU + small matmuls) is emitted BEFORE step
#               i's big MXU accumulates, so the scheduler always has
#               independent work adjacent. Measured wire 10.38 -> 9.61
#               us/img with roll (r4 probe); bounded VMEM (one step's
#               artifacts in flight). Production default r4.
#   phased    - build every (channel, chunk) step's one-hots first, then
#               run all accumulates. Faster at small C*K (v7: 8.83 ->
#               8.53 us/img wire at C*K=3) but VMEM grows with C*K (~2 MB
#               of int8 one-hots per step at L=256, CH=4096) — only safe
#               when the step count is small, hence the `auto` gate.
#   serial    - the pre-r4 order (stage A then stage B per step).
_SCHED = os.environ.get("TPUMCIA_KERNEL_SCHED", "auto")
_PHASED_MAX_STEPS = 3  # measured safe + faster at the bench's C*K=3
# TPUMCIA_KERNEL_SHIFT: how the co-occurring neighbour stream reaches the
# kernel. Default "roll" (production since r4): derive it in-kernel with a
# lane roll instead of reading a materialised flat-shifted HBM copy
# (single-chunk images, shift > 0 only: every wrapped lane falls outside
# the offset-validity window, so the circular wrap is harmless). Halves
# the kernel's chunk-stream HBM traffic and deletes the XLA pad+copy
# prologue stage that builds the shifted stream — measured e2e 47.9k ->
# 54.7k img/s on the bench workload (r4 probe), bit-identical outputs.
# Ineligible shapes (multi-chunk, non-positive shift) fall back to the
# copy path automatically; TPUMCIA_KERNEL_SHIFT=copy forces it everywhere.
_SHIFT_MODE = os.environ.get("TPUMCIA_KERNEL_SHIFT", "roll")


def _oh_dtypes():
    if _OH_KIND == "int4":
        return jnp.int4, jnp.int32
    if _OH_KIND == "bf16":
        return jnp.bfloat16, jnp.float32
    return jnp.int8, jnp.int32


def _nibble_rows(row16, oh_t):
    """Split the (HI, 16) LUT value grid into per-cell nibble operands for
    the v5 value-recovery matmuls. Nibbles span 0..15, which signed int4
    CANNOT represent (range -8..7) — so the row operands never drop below
    int8 regardless of the one-hot dtype knob (an int4 row dtype would
    silently wrap 8..15 negative and corrupt every GLCM statistic)."""
    row_t = jnp.int8 if jnp.dtype(oh_t).name in ("int4", "uint4") else oh_t
    return (row16 >> 4).astype(row_t), (row16 & 15).astype(row_t)


def _resc_values(hi_b, lo_oh, rowh, rowl, acc):
    """Rescaled values from NIBBLE one-hots (kernel v5): with the LUT row
    laid out as a (HI, 16) grid split into per-cell nibbles,
    ``R = rowh @ lo_oh * 16 + rowl @ lo_oh`` holds ``row[16h + lo(p)]``
    for every hi-bucket h, and the pixel's value is the hi-bucket select
    ``sum(hi_b * R, axis=0)``. Two (HI, 16) x (16, CH) matmuls + small
    elementwise work instead of any (L, CH) compare. Shared by the single-
    and multi-offset kernels."""
    i32 = jnp.int32
    Rh = jnp.dot(rowh, lo_oh, preferred_element_type=acc)  # (HI, CH)
    Rl = jnp.dot(rowl, lo_oh, preferred_element_type=acc)
    R = Rh.astype(i32) * 16 + Rl.astype(i32)
    return jnp.sum(hi_b.astype(i32) * R, axis=0, keepdims=True)  # (1, CH)


def _lanedot(a, b, acc):
    """(M, N) x (K, N) -> (M, K): contraction over the lane axis (A @ B^T)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=acc,
    )


def _total(x):  # (L, L) -> (1, 1) full reduction, reshape-free
    return jnp.sum(jnp.sum(x, axis=0, keepdims=True), axis=1, keepdims=True)


def _marginals_from_glcm(glcm, ones_L):
    """Row/column sums of the VMEM co-occurrence accumulator -> the GLCM
    marginals, as two (1, L) matvecs once per channel (kernel v4) instead of
    two per-pixel-chunk matvecs. Counts are < 2^24, so the f32 MXU matmul is
    integer-exact at HIGHEST precision (every product and partial sum is an
    exactly-representable f32 integer)."""
    gf = glcm.astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    marg_l = jax.lax.dot_general(  # contraction over lanes: row sums
        ones_L, gf, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=hi,
    )
    marg_r = jax.lax.dot_general(  # contraction over sublanes: column sums
        ones_L, gf, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=hi,
    )
    return marg_l, marg_r


def _cheap_tail_planes(levels):
    """Loop-invariant (L, L) planes for the kernel-v7 cheap epilogue, built
    ONCE per grid step and shared by every (channel, offset) emission: the
    |i-j| weight plane (i32) and the homogeneity reciprocal 1/(1+(i-j)^2)
    (f32 — hoisting it means ONE (L, L) divide per image instead of one per
    channel)."""
    i32 = jnp.int32
    di = jax.lax.broadcasted_iota(i32, (levels, levels), 0) - (
        jax.lax.broadcasted_iota(i32, (levels, levels), 1)
    )
    d2 = di * di
    return jnp.abs(di), 1.0 / (1.0 + d2.astype(jnp.float32))


def _emit_glcm_tail(glcm, c, marg_l_ref, marg_r_ref, sumsq_ref, dstat_ref,
                    diff_ref, dh16, ones_L, levels, cheap_planes=None):
    """End-of-channel emission of everything derivable from the VMEM G
    accumulator (kernel v4, VERDICT r2 #1): marginals as row/column sums,
    the exact sum(G^2) limbs, and — when the difference histogram is dropped
    (``dstat_ref`` given) — the three fixed weight-plane reductions the
    hybrid wire derives from it: sum(G*(i-j)^2) as base-256 limbs (each
    partial < 2^24, exact in i32/f32), sum(G*|i-j|) (exact, < 2^24), and
    sum(G/(1+(i-j)^2)) (f32).

    With ``cheap_planes`` (kernel v7, hw <= 4096 so every count and G entry
    is <= 2^12 and levels <= 256): ~10 per-channel (L, L) elementwise passes
    + 8 full-plane reductions collapse to 2 passes + 3 reductions. The
    marginal matvecs grow a second, index-weighted row (an (M, L) matvec
    costs the same MXU pass as M=1 — CLAUDE.md v3.1), sum(G^2) becomes ONE
    f32-exact plane (G^2 <= 2^24 and sum(G^2) <= sum(G)^2 <= 2^24), and
    sum(G*(i-j)^2) falls out of the index-weighted marginals via
    sum(i^2 G) - 2 sum(i j G) + sum(j^2 G) on (1, L) vectors (every term
    <= hw*(L-1)^2 < 2^31, exact in i32). The limb ENCODINGS differ from the
    generic path (hi limbs zero; value-identical after the linear
    reassembly in stats.glcm_sumsq_value / hybrid._wire_u32_quads) — the
    XLA path (stats._glcm_sumsq_limbs) switches on the same hw <= 4096 gate
    so kernel-vs-XLA parity stays bit-exact. The pair count also collapses
    to a (1, L) row sum of the marginal instead of a full-plane reduction.
    """
    i32 = jnp.int32
    f32 = jnp.float32
    L = levels
    if cheap_planes is not None:
        absd, recip = cheap_planes
        gf = glcm.astype(f32)
        hi = jax.lax.Precision.HIGHEST
        # (Mosaic iota must be integer-typed; cast to f32 after)
        lane_f = jax.lax.broadcasted_iota(i32, (1, L), 1).astype(f32)
        # A = [ones; iota]: row 0 -> marginal, row 1 -> index-weighted sums
        A = jnp.where(jax.lax.broadcasted_iota(i32, (2, 1), 0) == 0, 1.0, lane_f)
        AL = jax.lax.dot_general(  # (2, L): [sum_j G[k,j]; sum_j j*G[k,j]]
            A, gf, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=hi,
        )
        AR = jax.lax.dot_general(  # (2, L): [sum_i G[i,k]; sum_i i*G[i,k]]
            A, gf, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=hi,
        )
        marg_l, marg_r = AL[0:1, :], AR[0:1, :]
        marg_l_ref[0, c] = marg_l
        marg_r_ref[0, c] = marg_r
        iota4 = jax.lax.broadcasted_iota(i32, (1, 4), 1)
        s2 = _total(gf * gf).astype(i32)  # one exact f32 plane (<= 2^24)
        sumsq_ref[0, c] = (s2 >> 8) * (iota4 == 2) + (s2 & 255) * (iota4 == 3)
        if dstat_ref is not None:
            lane_i = lane_f.astype(i32)
            wrow = AL[1:2, :].astype(i32)  # sum_j j*G[k,j] per row k
            cross = jnp.sum(lane_i * wrow, axis=1, keepdims=True)
            ii = lane_i * lane_i
            si2 = jnp.sum(ii * marg_l.astype(i32), axis=1, keepdims=True)
            sj2 = jnp.sum(ii * marg_r.astype(i32), axis=1, keepdims=True)
            t_d2 = si2 + sj2 - 2 * cross  # = sum(G*(i-j)^2), exact i32
            dstat_ref[0, c] = (
                (t_d2 >> 8).astype(f32) * (iota4 == 0)
                + (t_d2 & 255).astype(f32) * (iota4 == 1)
                + _total(glcm.astype(i32) * absd).astype(f32) * (iota4 == 2)
                + _total(gf * recip) * (iota4 == 3)
            )
        else:
            diff_ref[0, c] = dh16.astype(i32)
        return jnp.sum(marg_l, axis=1, keepdims=True)  # pair count = sum(G)

    marg_l, marg_r = _marginals_from_glcm(glcm, ones_L)
    marg_l_ref[0, c] = marg_l
    marg_r_ref[0, c] = marg_r

    # exact sum(G^2) as base-2^k integer limbs (stats._glcm_sumsq_limbs):
    # c = a*2^12 + b -> S = 2^24*S(a^2) + 2^13*S(ab) + 2^8*S(b^2>>8)
    #                      + S(b^2&255)
    g = glcm.astype(i32)
    ga = g >> 12
    gb = g & 4095
    gbb = gb * gb
    iota4 = jax.lax.broadcasted_iota(i32, (1, 4), 1)
    sumsq_ref[0, c] = (
        _total(ga * ga) * (iota4 == 0)
        + _total(ga * gb) * (iota4 == 1)
        + _total(gbb >> 8) * (iota4 == 2)
        + _total(gbb & 255) * (iota4 == 3)
    )

    if dstat_ref is not None:
        di = jax.lax.broadcasted_iota(i32, (L, L), 0) - jax.lax.broadcasted_iota(
            i32, (L, L), 1
        )
        d2 = di * di  # <= (L-1)^2 = 65025
        dstat_ref[0, c] = (
            _total(g * (d2 >> 8)).astype(f32) * (iota4 == 0)
            + _total(g * (d2 & 255)).astype(f32) * (iota4 == 1)
            + _total(g * jnp.abs(di)).astype(f32) * (iota4 == 2)
            + _total(glcm.astype(f32) / (1.0 + d2.astype(f32))) * (iota4 == 3)
        )
    else:
        diff_ref[0, c] = dh16.astype(i32)

    return _total(glcm).astype(f32)  # pair count = sum(G)


def _kernel(
    *refs,
    levels: int,
    num_chunks: int,
    num_channels: int,
    hw: int,
    width: int,
    window: tuple[int, int, int, int],
    has_mask: bool,
    need_diff: bool,
    roll_shift: int = 0,
):
    if has_mask:
        if roll_shift:
            (raw_ref, wi_ref, row_ref,
             hist_ref, count_ref, marg_l_ref, marg_r_ref, dout_ref,
             sumsq_ref, pairs_ref) = refs
        else:
            (raw_ref, rsh_ref, wi_ref, wsh_ref, row_ref,
             hist_ref, count_ref, marg_l_ref, marg_r_ref, dout_ref,
             sumsq_ref, pairs_ref) = refs
    else:
        if roll_shift:
            (raw_ref, row_ref,
             hist_ref, count_ref, marg_l_ref, marg_r_ref, dout_ref,
             sumsq_ref, pairs_ref) = refs
        else:
            (raw_ref, rsh_ref, row_ref,
             hist_ref, count_ref, marg_l_ref, marg_r_ref, dout_ref,
             sumsq_ref, pairs_ref) = refs
    diff_ref = dout_ref if need_diff else None
    dstat_ref = None if need_diff else dout_ref

    L = levels
    HI = L // 16
    DHI = (2 * L) // 16
    f32 = jnp.float32
    i32 = jnp.int32
    oh_t, acc = _oh_dtypes()
    r0, r1, c0, c1 = window

    iota_hi = jax.lax.broadcasted_iota(i32, (HI, 1), 0)
    iota_16 = jax.lax.broadcasted_iota(i32, (16, 1), 0)
    iota_dhi = jax.lax.broadcasted_iota(i32, (DHI, 1), 0)
    iota_L = jax.lax.broadcasted_iota(i32, (L, 1), 0)
    lane = jax.lax.broadcasted_iota(i32, (1, raw_ref.shape[-1]), 1)
    ones_L = jnp.ones((1, L), f32)

    # kernel v7 cheap epilogue gate (see _emit_glcm_tail): every exactness
    # bound needs pair counts <= 2^12 and levels <= 256. The weight planes
    # are hoisted here — once per grid step, shared across channels.
    cheap = hw <= 4096 and L <= 256
    if not cheap:
        tail_planes = None
    elif need_diff:
        tail_planes = (None, None)  # dstat branch never reached
    else:
        tail_planes = _cheap_tail_planes(L)

    # per-chunk static position masks: in-bounds pixels and valid pairs
    # (the offset window), reconstructed from the flat pixel index. The
    # per-chunk pixel/pair counts are Python-computable (static window),
    # so the maskless kernel never reduces them on the VPU.
    CH = raw_ref.shape[-1]
    inb, valid = [], []
    inb_full, n_inb, n_valid = [], [], []
    for k in range(num_chunks):
        flat = lane + k * CH
        row_i = flat // width
        col_i = flat - row_i * width
        inb.append(flat < hw)
        valid.append(
            (row_i >= r0) & (row_i < r1) & (col_i >= c0) & (col_i < c1)
            & (flat < hw)
        )
        inb_full.append((k + 1) * CH <= hw)
        n_inb.append(max(0, min(hw - k * CH, CH)))
        p = np.arange(k * CH, min((k + 1) * CH, hw))
        ri, ci = p // width, p % width
        n_valid.append(
            int(np.sum((ri >= r0) & (ri < r1) & (ci >= c0) & (ci < c1)))
        )

    def channel_ctx(c):
        """Per-channel stream views + LUT nibbles (cheap; shared by every
        chunk of the channel)."""
        raw_all = raw_ref[0, c]  # (K, CH) i32
        if roll_shift:
            # kernel v7: the neighbour's RESCALED values come from rolling
            # resc_l in build() — the raw neighbour stream is only needed
            # by the recovery-ablate probe (rolled lazily there)
            rsh_all = (
                pltpu.roll(raw_all, CH - roll_shift, axis=1)
                if "recovery" in _ABLATE
                else None
            )
        else:
            rsh_all = rsh_ref[0, c]
        wi_all = wsh_all = None
        if has_mask:
            wi_raw = wi_ref[0, c]
            wi_all = wi_raw > 0
            if roll_shift:
                wsh_all = pltpu.roll(wi_raw, CH - roll_shift, axis=1) > 0
            else:
                wsh_all = wsh_ref[0, c] > 0
        # LUT row as a (HI, 16) value grid, split into per-cell nibbles so
        # the value-recovery matmuls run on narrow (int8/bf16) operands
        row16 = row_ref[0, c].astype(i32)  # row16[h, l] = row[16h+l]
        rowh, rowl = _nibble_rows(row16, oh_t)
        return raw_all, rsh_all, wi_all, wsh_all, rowh, rowl

    def build(ctx, k):
        """Stage A of a (channel, chunk) step: compares, nibble value
        recovery, one-hot construction — VPU work plus 6 small matmuls.
        No dependence on any accumulator, so under _SCHED these can overlap
        the previous step's stage B."""
        raw_all, rsh_all, wi_all, wsh_all, rowh, rowl = ctx
        raw = raw_all[k : k + 1, :]  # (1, CH) left pixel = raw pixel
        # co-occurring neighbour (None in roll mode: resc_r rolls below)
        rsh = rsh_all[k : k + 1, :] if rsh_all is not None else None
        if has_mask:
            wb = wi_all[k : k + 1, :] & inb[k]
            pwb = wb & wsh_all[k : k + 1, :] & valid[k]
        else:
            wb = inb[k]
            pwb = valid[k]

        # --- factorized raw histogram operands: (HI, CH) and (16, CH)
        oh_hi_b = (raw >> 4) == iota_hi
        if has_mask or not inb_full[k]:
            oh_hi_b = oh_hi_b & wb  # pad pixels only exist in the tail
        oh_lo = ((raw & 15) == iota_16).astype(oh_t)

        # --- rescaled values via the nibble LUT grid (v5), then ONE
        # (L, CH) equality per stream builds the one-hot; pair validity
        # folds into the left stream as a -1 sentinel. The left side
        # reuses the histogram's nibble one-hots (masked hi-buckets
        # zero the value — the sentinel overrides those pixels anyway).
        if "recovery" in _ABLATE:
            resc_l, resc_r = raw, rsh  # WRONG results; cost bisection only
        else:
            resc_l = _resc_values(oh_hi_b, oh_lo, rowh, rowl, acc)
            if roll_shift:
                # kernel v7: in roll mode the neighbour's rescaled values
                # are the left stream's values lane-rolled by the flat
                # offset — the second nibble recovery (two compares + two
                # matvecs) collapses to one (1, CH) roll. Positions whose
                # rolled source was masked/padded (resc_l forced to 0) or
                # wrapped only ever reach pairs the pwb sentinel discards,
                # so the accumulated stats are bit-identical.
                resc_r = pltpu.roll(resc_l, CH - roll_shift, axis=1)
            else:
                rhi_b = (rsh >> 4) == iota_hi
                rlo = ((rsh & 15) == iota_16).astype(oh_t)
                resc_r = _resc_values(rhi_b, rlo, rowh, rowl, acc)

        chk = None
        if "onehot" in _SURROGATE:
            # non-DCE variant: the (L, CH) equalities go, but the recovered
            # values stay LIVE through a (1, 16) checksum folded into the
            # hist accumulator (the ABLATE variant dead-codes recovery)
            rescm = jnp.where(pwb, resc_l, -1)
            chk = (rescm[:, :16] + resc_r[:, :16]).astype(acc)
            oh_l = pltpu.repeat(oh_lo, HI, axis=0)
            oh_r = pltpu.repeat(oh_lo, HI, axis=0)
        elif "onehot" in _ABLATE:
            # same shapes/dtypes without the (L, CH) equality compares
            # (WRONG results; keeps the G matmul fed for cost bisection)
            oh_l = pltpu.repeat(oh_lo, HI, axis=0)
            oh_r = pltpu.repeat(oh_lo, HI, axis=0)
        else:
            rescm = jnp.where(pwb, resc_l, -1)
            oh_l = (rescm == iota_L).astype(oh_t)
            oh_r = (resc_r == iota_L).astype(oh_t)

        art = (oh_hi_b, oh_lo, oh_l, oh_r, chk, None, None)
        if need_diff:
            diff = resc_l - resc_r + (L - 1)  # (1, CH) in [0, 2L-2]
            oh_dhi = (((diff >> 4) == iota_dhi) & pwb).astype(oh_t)
            oh_dlo = ((diff & 15) == iota_16).astype(oh_t)
            art = art[:5] + (oh_dhi, oh_dlo)
        return art

    def accum(state, art):
        """Stage B: the MXU accumulates (hist factor matmul, G matmul,
        diff-hist matmul)."""
        hist16, dh16, glcm = state
        oh_hi_b, oh_lo, oh_l, oh_r, chk, oh_dhi, oh_dlo = art
        if "hist" not in _ABLATE:
            hist16 = hist16 + _lanedot(oh_hi_b.astype(oh_t), oh_lo, acc)
        if chk is not None:  # onehot surrogate: keep recovery live
            hist16 = hist16 + chk
        if "g" in _SURROGATE:
            # non-DCE surrogate: consume BOTH one-hots and feed the G
            # accumulator with a trivial slice-add (CH >= L at the probe
            # shapes) — the matmul cost goes, everything else stays live
            # (Mosaic has no sub-32-bit vector adds: cast each side first)
            glcm = glcm + oh_l[:, :L].astype(acc) + oh_r[:, :L].astype(acc)
        elif "g" not in _ABLATE:
            # G[i, j] += sum_p pw_p * [l_p == i] * [r_p == j] (pair weight
            # already folded into oh_l via the sentinel)
            glcm = glcm + _lanedot(oh_l, oh_r, acc)
        if need_diff:
            dh16 = dh16 + _lanedot(oh_dhi, oh_dlo, acc)
        return hist16, dh16, glcm

    def emit(c, state):
        """End-of-channel emission (kernel v4/v5): marginals, counts, and
        (wire path) the difference-derived reductions all come out of the
        accumulators once per channel."""
        hist16, dh16, glcm = state
        hist_ref[0, c] = hist16.astype(i32)
        if has_mask:
            # the histogram already carries the mask: count = sum(hist)
            count_ref[0, c] = _total(hist16).astype(f32)
        else:
            # static window -> counts are compile-time constants
            count_ref[0, c] = jnp.full((1, 1), float(sum(n_inb)), f32)
        if "epilogue" in _SURROGATE:
            # non-DCE surrogate: every epilogue output becomes a trivial
            # slice of the G accumulator, so G (and everything feeding it)
            # stays live while the reduction passes go (results wrong)
            marg_l_ref[0, c] = glcm[0:1, :].astype(f32)
            marg_r_ref[0, c] = glcm[1:2, :].astype(f32)
            sumsq_ref[0, c] = glcm[2:3, 0:4].astype(i32)
            if need_diff:
                diff_ref[0, c] = dh16.astype(i32)
            else:
                dstat_ref[0, c] = glcm[3:4, 0:4].astype(f32)
            pairs = glcm[4:5, 0:1].astype(f32)
        elif "epilogue" in _ABLATE:
            zrow = ones_L * 0.0
            marg_l_ref[0, c] = zrow
            marg_r_ref[0, c] = zrow
            sumsq_ref[0, c] = jnp.zeros((1, 4), i32)
            if need_diff:
                diff_ref[0, c] = dh16.astype(i32)
            else:
                dstat_ref[0, c] = jnp.zeros((1, 4), f32)
            pairs = _total(glcm).astype(f32)
        else:
            pairs = _emit_glcm_tail(
                glcm, c, marg_l_ref, marg_r_ref, sumsq_ref, dstat_ref,
                diff_ref, dh16, ones_L, L, cheap_planes=tail_planes,
            )
        pairs_ref[0, c] = (
            pairs if has_mask else jnp.full((1, 1), float(sum(n_valid)), f32)
        )

    def fresh_state():
        return (
            jnp.zeros((HI, 16), acc),
            jnp.zeros((DHI, 16), acc),
            jnp.zeros((L, L), acc),
        )

    # the (channel, chunk) loop is unrolled in-kernel with write-once
    # outputs (no revisited blocks, no init/emit predication)
    steps = [(c, k) for c in range(num_channels) for k in range(num_chunks)]
    sched = _SCHED
    if sched == "auto":
        sched = "phased" if len(steps) <= _PHASED_MAX_STEPS else "pipelined"
    if sched == "pipelined":
        # one-step software pipeline: emit step i+1's stage A before step
        # i's stage B so the Mosaic scheduler always has independent VPU
        # and MXU work adjacent (kernel v6 candidate)
        states = [fresh_state() for _ in range(num_channels)]
        ctx_cache: dict[int, tuple] = {}
        pending = None
        for c, k in steps:
            if c not in ctx_cache:
                ctx_cache[c] = channel_ctx(c)
            art = build(ctx_cache[c], k)
            if pending is not None:
                pc, pk, part = pending
                states[pc] = accum(states[pc], part)
                if pk == num_chunks - 1:
                    emit(pc, states[pc])
            pending = (c, k, art)
        pc, pk, part = pending
        states[pc] = accum(states[pc], part)
        emit(pc, states[pc])
    elif sched == "phased":
        # build EVERY step's one-hots first, then run all accumulates
        # (VMEM-heavy: all steps' artifacts live at once)
        states = [fresh_state() for _ in range(num_channels)]
        ctx_cache = {}
        arts = []
        for c, k in steps:
            if c not in ctx_cache:
                ctx_cache[c] = channel_ctx(c)
            arts.append((c, k, build(ctx_cache[c], k)))
        for c, k, art in arts:
            states[c] = accum(states[c], art)
            if k == num_chunks - 1:
                emit(c, states[c])
    else:
        # production order: stage A then stage B inline per step
        for c in range(num_channels):
            ctx = channel_ctx(c)
            state = fresh_state()
            for k in range(num_chunks):
                state = accum(state, build(ctx, k))
            emit(c, state)


def _lut_rows(lut, vmax, B, C, HI, L):
    """Per-channel rescale-LUT row selection as a one-hot matmul instead of
    a gather (kernel v7 prep): ``jnp.take`` lowers to B*C scalar-indexed row
    DMAs on TPU, while ``onehot(vmax) @ lut`` is one small MXU pass. Every
    output element is a sum with exactly ONE nonzero term (the one-hot row),
    so even DEFAULT-precision bf16 accumulation is exact — but the operands
    are kept f32 at HIGHEST anyway to match the LUT's dtype (values <= L-1,
    integer-exact either way)."""
    f32 = jnp.float32
    vm = jnp.clip(vmax, 0, L - 1).reshape(B * C, 1)
    oh = (vm == jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)).astype(f32)
    rows = jax.lax.dot_general(
        oh, lut.astype(f32), dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST,
    )
    return rows.reshape(B, C, HI, 16)


def _flat_chunks(x, total, K, CH):
    """(B, C, N) -> zero-padded (B, C, K, CH) — a reshape (plus one pad when
    N < total), never an interleaved copy."""
    B, C, n = x.shape
    if n != total:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, total - n)))
    return x.reshape(B, C, K, CH)


@functools.partial(
    jax.jit,
    static_argnames=("levels", "offset", "has_mask", "interpret", "need_diff"),
)
def _pallas_stats_core(img, w, lut, *, levels, offset, has_mask, interpret,
                       need_diff=True):
    """``w`` may be None when ``has_mask`` is False (no ones-array is ever
    materialised for the maskless specialisation). ``need_diff=False`` drops
    the in-kernel difference-histogram path and instead emits the weight-plane
    reductions of the VMEM G accumulator (``SuffStats.dstats``) that the
    hybrid wire derives from it — about a third less kernel work (v4)."""
    B, C, H, W = img.shape
    L = levels
    if L % 16:
        raise ValueError("the fused kernel requires levels % 16 == 0")
    HI = L // 16
    DHI = (2 * L) // 16
    f32 = jnp.float32
    i32 = jnp.int32

    dr, dc = offset
    r0, r1 = max(0, -dr), H - max(0, dr)
    c0, c1 = max(0, -dc), W - max(0, dc)
    if r0 >= r1 or c0 >= c1:
        raise ValueError(f"GLCM offset {offset} leaves no valid pairs for {H}x{W}")
    shift = dr * W + dc  # flat-index offset of the co-occurring neighbour
    # row-major flattening makes the 2D offset a single flat shift; the
    # offset-window mask (applied in-kernel) discards the wrapped positions

    # XLA prologue: channel max -> rescale LUT row (ipynb:293-295, exact),
    # laid out as an (HI, 16) value grid for the in-kernel nibble recovery.
    if has_mask:
        vmax = jnp.max(jnp.where(w > 0, img, -1), axis=(2, 3)).astype(i32)
    else:
        vmax = jnp.max(img, axis=(2, 3)).astype(i32)
    rows = _lut_rows(lut, vmax, B, C, HI, L)

    HW = H * W
    CH = min(_CHUNK, max(128, HW))
    K = -(-HW // CH)
    total = K * CH

    # TPUMCIA_KERNEL_SHIFT=roll: single-chunk images with a positive flat
    # offset derive the neighbour stream in-kernel (lane roll) — the
    # materialised flat-shifted HBM copies below are skipped entirely
    roll_shift = (
        shift if (_SHIFT_MODE == "roll" and K == 1 and 0 < shift < CH) else 0
    )

    flat = img.reshape(B, C, HW).astype(i32)
    inputs = [_flat_chunks(flat, total, K, CH)]
    if not roll_shift:
        if shift >= 0:
            flat_sh = jnp.pad(flat[:, :, shift:], ((0, 0), (0, 0), (0, shift)))
        else:
            flat_sh = jnp.pad(flat[:, :, :shift], ((0, 0), (0, 0), (-shift, 0)))
        inputs.append(_flat_chunks(flat_sh, total, K, CH))
    if has_mask:
        wi = (w > 0).reshape(B, C, HW).astype(i32)
        inputs.append(_flat_chunks(wi, total, K, CH))
        if not roll_shift:
            if shift >= 0:
                wi_sh = jnp.pad(wi[:, :, shift:], ((0, 0), (0, 0), (0, shift)))
            else:
                wi_sh = jnp.pad(wi[:, :, :shift], ((0, 0), (0, 0), (-shift, 0)))
            inputs.append(_flat_chunks(wi_sh, total, K, CH))
    inputs.append(rows)

    grid = (B,)
    chunk_spec = pl.BlockSpec(
        (1, C, K, CH), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    row_spec = pl.BlockSpec(
        (1, C, HI, 16), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [chunk_spec] * (len(inputs) - 1) + [row_spec]
    blk = lambda m, n: pl.BlockSpec(
        (1, C, m, n), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )

    dout_shape = (
        jax.ShapeDtypeStruct((B, C, DHI, 16), i32)  # diff_hist (factorized)
        if need_diff
        else jax.ShapeDtypeStruct((B, C, 1, 4), f32)  # dstats reductions
    )
    out_shapes = (
        jax.ShapeDtypeStruct((B, C, HI, 16), i32),  # hist (factorized)
        jax.ShapeDtypeStruct((B, C, 1, 1), f32),  # count
        jax.ShapeDtypeStruct((B, C, 1, L), f32),  # marg_l
        jax.ShapeDtypeStruct((B, C, 1, L), f32),  # marg_r
        dout_shape,
        jax.ShapeDtypeStruct((B, C, 1, 4), i32),  # sumsq limbs
        jax.ShapeDtypeStruct((B, C, 1, 1), f32),  # pair_count
    )
    out_specs = (
        blk(HI, 16), blk(1, 1), blk(1, L), blk(1, L),
        blk(DHI, 16) if need_diff else blk(1, 4),
        blk(1, 4), blk(1, 1),
    )

    kernel = functools.partial(
        _kernel,
        levels=L,
        num_chunks=K,
        num_channels=C,
        hw=HW,
        width=W,
        window=(r0, r1, c0, c1),
        has_mask=has_mask,
        need_diff=need_diff,
        roll_shift=roll_shift,
    )
    hist16, count, marg_l, marg_r, dout, sumsq, pairs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(*inputs)

    # XLA epilogue: flatten the factor grids (row-major: value = hi*16 + lo)
    hist = hist16.reshape(B, C, L).astype(f32)
    diff_hist = (
        dout.reshape(B, C, 2 * L)[:, :, : 2 * L - 1].astype(f32)
        if need_diff
        else None
    )
    return SuffStats(
        hist=hist,
        count=count[:, :, 0, 0],
        vmax=vmax,
        marg_l=marg_l[:, :, 0, :],
        marg_r=marg_r[:, :, 0, :],
        diff_hist=diff_hist,
        glcm_sumsq=sumsq[:, :, 0, :],
        pair_count=pairs[:, :, 0, 0],
        dstats=None if need_diff else dout[:, :, 0, :],
    )


def _kernel_multi(
    *refs,
    levels: int,
    num_chunks: int,
    num_channels: int,
    hw: int,
    width: int,
    windows: tuple[tuple[int, int, int, int], ...],
    has_mask: bool,
    need_diff: bool,
    roll_shifts: tuple[int, ...] = (),
):
    """Fused multi-offset variant: the raw stream, histogram, rescale
    boundaries, and LEFT one-hot are built once and shared across offsets;
    each offset adds only its right-stream one-hot and G matmul (plus, with
    ``need_diff``, the difference path). Pair validity folds into the RIGHT
    stream as a -1 sentinel (the left one-hot stays unmasked and shared);
    both marginals come out of the per-offset G accumulator at end of
    channel (row sums = left marginal, column sums = right; kernel v4).

    ``roll_shifts`` (TPUMCIA_KERNEL_SHIFT=roll, single-chunk, all offsets
    with positive flat shift): every neighbour stream is derived in-kernel
    from the raw stream by a lane roll — the O materialised shifted copies
    (and, masked, the O shifted mask copies) never exist in HBM at all.
    """
    O = len(windows)
    if has_mask:
        raw_ref = refs[0]
        wi_ref = refs[1]
        if roll_shifts:
            rsh_refs = wsh_refs = None
            row_ref = refs[2]
            outs = refs[3:]
        else:
            rsh_refs = refs[2 : 2 + O]
            wsh_refs = refs[2 + O : 2 + 2 * O]
            row_ref = refs[2 + 2 * O]
            outs = refs[3 + 2 * O :]
    else:
        raw_ref = refs[0]
        if roll_shifts:
            rsh_refs = None
            row_ref = refs[1]
            outs = refs[2:]
        else:
            rsh_refs = refs[1 : 1 + O]
            row_ref = refs[1 + O]
            outs = refs[2 + O :]
    hist_ref, count_ref = outs[0], outs[1]
    marg_l_refs = outs[2 : 2 + O]
    marg_r_refs = outs[2 + O : 2 + 2 * O]
    dout_refs = outs[2 + 2 * O : 2 + 3 * O]
    sumsq_refs = outs[2 + 3 * O : 2 + 4 * O]
    pairs_refs = outs[2 + 4 * O : 2 + 5 * O]

    L = levels
    HI = L // 16
    DHI = (2 * L) // 16
    f32 = jnp.float32
    i32 = jnp.int32
    oh_t, acc = _oh_dtypes()

    iota_hi = jax.lax.broadcasted_iota(i32, (HI, 1), 0)
    iota_16 = jax.lax.broadcasted_iota(i32, (16, 1), 0)
    iota_dhi = jax.lax.broadcasted_iota(i32, (DHI, 1), 0)
    iota_L = jax.lax.broadcasted_iota(i32, (L, 1), 0)
    lane = jax.lax.broadcasted_iota(i32, (1, raw_ref.shape[-1]), 1)
    ones_L = jnp.ones((1, L), f32)

    # kernel v7 cheap epilogue gate + hoisted planes (see _emit_glcm_tail);
    # shared across channels AND offsets
    cheap = hw <= 4096 and L <= 256
    if not cheap:
        tail_planes = None
    elif need_diff:
        tail_planes = (None, None)
    else:
        tail_planes = _cheap_tail_planes(L)

    CH = raw_ref.shape[-1]
    inb, inb_full, n_inb = [], [], []
    valid = [[] for _ in range(O)]
    n_valid = [0] * O
    for k in range(num_chunks):
        flat = lane + k * CH
        row_i = flat // width
        col_i = flat - row_i * width
        inb.append(flat < hw)
        inb_full.append((k + 1) * CH <= hw)
        n_inb.append(max(0, min(hw - k * CH, CH)))
        p = np.arange(k * CH, min((k + 1) * CH, hw))
        ri, ci = p // width, p % width
        for o, (r0, r1, c0, c1) in enumerate(windows):
            valid[o].append(
                (row_i >= r0) & (row_i < r1) & (col_i >= c0) & (col_i < c1)
                & (flat < hw)
            )
            n_valid[o] += int(
                np.sum((ri >= r0) & (ri < r1) & (ci >= c0) & (ci < c1))
            )

    for c in range(num_channels):
        raw_all = raw_ref[0, c]
        if has_mask:
            wi_raw = wi_ref[0, c]
            wi_all = wi_raw > 0
        if roll_shifts:
            # kernel v7: the rescaled neighbour values roll out of resc_l
            # per chunk below — the O raw neighbour streams are never built
            rsh_alls = None
            if has_mask:
                wsh_alls = [
                    pltpu.roll(wi_raw, CH - s, axis=1) > 0 for s in roll_shifts
                ]
        else:
            rsh_alls = [rsh_refs[o][0, c] for o in range(O)]
            if has_mask:
                wsh_alls = [wsh_refs[o][0, c] > 0 for o in range(O)]

        row16 = row_ref[0, c].astype(i32)  # (HI, 16) value grid
        rowh, rowl = _nibble_rows(row16, oh_t)

        hist16 = jnp.zeros((HI, 16), acc)
        dh16 = [jnp.zeros((DHI, 16), acc) for _ in range(O)]
        glcm = [jnp.zeros((L, L), acc) for _ in range(O)]

        for k in range(num_chunks):
            raw = raw_all[k : k + 1, :]
            if has_mask:
                wb = wi_all[k : k + 1, :] & inb[k]
            else:
                wb = inb[k]

            oh_hi_b = (raw >> 4) == iota_hi
            if has_mask or not inb_full[k]:
                oh_hi_b = oh_hi_b & wb
            oh_lo = ((raw & 15) == iota_16).astype(oh_t)
            hist16 += _lanedot(oh_hi_b.astype(oh_t), oh_lo, acc)

            # shared left side: rescaled values + one-hot (mask-aliased
            # pixels resolve to level 0 — the RIGHT stream's sentinel zeroes
            # those pairs, exactly like the previous unmasked left one-hot)
            resc_l = _resc_values(oh_hi_b, oh_lo, rowh, rowl, acc)
            oh_l = (resc_l == iota_L).astype(oh_t)

            for o in range(O):
                if has_mask:
                    pwb = wb & wsh_alls[o][k : k + 1, :] & valid[o][k]
                else:
                    pwb = valid[o][k]
                if roll_shifts:
                    # kernel v7 (see the single-offset kernel): per offset,
                    # one lane roll of the shared left values replaces the
                    # whole right-stream nibble recovery; rolled-from-
                    # masked/padded/wrapped lanes only reach pairs the
                    # sentinel below discards
                    resc_r = pltpu.roll(
                        resc_l, CH - roll_shifts[o], axis=1
                    )
                else:
                    rsh = rsh_alls[o][k : k + 1, :]
                    rhi_b = (rsh >> 4) == iota_hi
                    rlo = ((rsh & 15) == iota_16).astype(oh_t)
                    resc_r = _resc_values(rhi_b, rlo, rowh, rowl, acc)
                rescm = jnp.where(pwb, resc_r, -1)
                oh_r = (rescm == iota_L).astype(oh_t)
                glcm[o] += _lanedot(oh_l, oh_r, acc)
                if need_diff:
                    diff = resc_l - resc_r + (L - 1)
                    oh_dhi = (((diff >> 4) == iota_dhi) & pwb).astype(oh_t)
                    oh_dlo = ((diff & 15) == iota_16).astype(oh_t)
                    dh16[o] += _lanedot(oh_dhi, oh_dlo, acc)

        hist_ref[0, c] = hist16.astype(i32)
        if has_mask:
            count_ref[0, c] = _total(hist16).astype(f32)
        else:
            count_ref[0, c] = jnp.full((1, 1), float(sum(n_inb)), f32)

        for o in range(O):
            # sentinel is on the RIGHT stream here, but G only counts valid
            # pairs either way: row sums give the left marginal, column sums
            # the right, total the pair count
            pairs = _emit_glcm_tail(
                glcm[o], c, marg_l_refs[o], marg_r_refs[o], sumsq_refs[o],
                None if need_diff else dout_refs[o],
                dout_refs[o] if need_diff else None,
                dh16[o], ones_L, L, cheap_planes=tail_planes,
            )
            pairs_refs[o][0, c] = (
                pairs
                if has_mask
                else jnp.full((1, 1), float(n_valid[o]), f32)
            )


def _shifted(flat, shift):
    if shift >= 0:
        return jnp.pad(flat[:, :, shift:], ((0, 0), (0, 0), (0, shift)))
    return jnp.pad(flat[:, :, :shift], ((0, 0), (0, 0), (-shift, 0)))


@functools.partial(
    jax.jit,
    static_argnames=("levels", "offsets", "has_mask", "interpret", "need_diff"),
)
def _pallas_stats_multi_core(img, w, lut, *, levels, offsets, has_mask,
                             interpret, need_diff=True):
    """Multi-offset sibling of :func:`_pallas_stats_core` — one fused kernel
    pass producing per-offset :class:`SuffStats` (stats.py's
    ``sufficient_stats_multi`` contract, TPU path)."""
    B, C, H, W = img.shape
    L = levels
    if L % 16:
        raise ValueError("the fused kernel requires levels % 16 == 0")
    HI = L // 16
    DHI = (2 * L) // 16
    f32 = jnp.float32
    i32 = jnp.int32

    windows, shifts = [], []
    for dr, dc in offsets:
        r0, r1 = max(0, -dr), H - max(0, dr)
        c0, c1 = max(0, -dc), W - max(0, dc)
        if r0 >= r1 or c0 >= c1:
            raise ValueError(
                f"GLCM offset {(dr, dc)} leaves no valid pairs for {H}x{W}"
            )
        windows.append((r0, r1, c0, c1))
        shifts.append(dr * W + dc)

    if has_mask:
        vmax = jnp.max(jnp.where(w > 0, img, -1), axis=(2, 3)).astype(i32)
    else:
        vmax = jnp.max(img, axis=(2, 3)).astype(i32)
    rows = _lut_rows(lut, vmax, B, C, HI, L)

    HW = H * W
    CH = min(_CHUNK, max(128, HW))
    K = -(-HW // CH)
    total = K * CH

    # all-or-nothing in-kernel rolled neighbour streams (see _SHIFT_MODE):
    # every offset must have a positive in-range flat shift
    roll_shifts = (
        tuple(shifts)
        if (_SHIFT_MODE == "roll" and K == 1
            and all(0 < s < CH for s in shifts))
        else ()
    )

    flat = img.reshape(B, C, HW).astype(i32)
    inputs = [_flat_chunks(flat, total, K, CH)]
    wi = (w > 0).reshape(B, C, HW).astype(i32) if has_mask else None
    if has_mask:
        inputs.append(_flat_chunks(wi, total, K, CH))
    if not roll_shifts:
        for s in shifts:
            inputs.append(_flat_chunks(_shifted(flat, s), total, K, CH))
        if has_mask:
            for s in shifts:
                inputs.append(_flat_chunks(_shifted(wi, s), total, K, CH))
    inputs.append(rows)

    O = len(offsets)
    grid = (B,)
    chunk_spec = pl.BlockSpec(
        (1, C, K, CH), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    row_spec = pl.BlockSpec(
        (1, C, HI, 16), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [chunk_spec] * (len(inputs) - 1) + [row_spec]
    blk = lambda m, n: pl.BlockSpec(
        (1, C, m, n), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )

    dout_shape = (
        jax.ShapeDtypeStruct((B, C, DHI, 16), i32)
        if need_diff
        else jax.ShapeDtypeStruct((B, C, 1, 4), f32)
    )
    out_shapes = (
        [jax.ShapeDtypeStruct((B, C, HI, 16), i32)]
        + [jax.ShapeDtypeStruct((B, C, 1, 1), f32)]
        + [jax.ShapeDtypeStruct((B, C, 1, L), f32)] * (2 * O)
        + [dout_shape] * O
        + [jax.ShapeDtypeStruct((B, C, 1, 4), i32)] * O
        + [jax.ShapeDtypeStruct((B, C, 1, 1), f32)] * O
    )
    out_specs = (
        [blk(HI, 16), blk(1, 1)]
        + [blk(1, L)] * (2 * O)
        + [blk(DHI, 16) if need_diff else blk(1, 4)] * O
        + [blk(1, 4)] * O
        + [blk(1, 1)] * O
    )

    kernel = functools.partial(
        _kernel_multi,
        levels=L,
        num_chunks=K,
        num_channels=C,
        hw=HW,
        width=W,
        windows=tuple(windows),
        has_mask=has_mask,
        need_diff=need_diff,
        roll_shifts=roll_shifts,
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(*inputs)

    hist16, count = outs[0], outs[1]
    marg_l = outs[2 : 2 + O]
    marg_r = outs[2 + O : 2 + 2 * O]
    dout = outs[2 + 2 * O : 2 + 3 * O]
    sumsq = outs[2 + 3 * O : 2 + 4 * O]
    pairs = outs[2 + 4 * O : 2 + 5 * O]

    hist = hist16.reshape(B, C, L).astype(f32)
    return tuple(
        SuffStats(
            hist=hist,
            count=count[:, :, 0, 0],
            vmax=vmax,
            marg_l=marg_l[o][:, :, 0, :],
            marg_r=marg_r[o][:, :, 0, :],
            diff_hist=(
                dout[o].reshape(B, C, 2 * L)[:, :, : 2 * L - 1].astype(f32)
                if need_diff
                else None
            ),
            glcm_sumsq=sumsq[o][:, :, 0, :],
            pair_count=pairs[o][:, :, 0, 0],
            dstats=None if need_diff else dout[o][:, :, 0, :],
        )
        for o in range(O)
    )


def sufficient_stats_pallas_multi(
    images,
    mask=None,
    *,
    levels: int = 256,
    offsets: tuple[tuple[int, int], ...] = ((0, 5),),
    interpret: bool = False,
    need_diff_hist: bool = True,
) -> tuple[SuffStats, ...]:
    """Fused multi-offset Pallas pass (TPU sibling of
    ``stats.sufficient_stats_multi``): the raw histogram, rescale
    boundaries, and left one-hots are computed once and shared across all
    (distance, angle) offsets (skimage list API, ipynb:298).
    ``need_diff_hist=False`` selects the reduced v4 kernel (see
    :func:`sufficient_stats_pallas`)."""
    lut = rescale_lut_device(levels)  # cached device copy, no re-upload
    offsets = tuple(tuple(o) for o in offsets)
    if mask is None:
        images = jnp.asarray(images)
        img = jnp.transpose(images, (0, 3, 1, 2)).astype(jnp.int32)
        return _pallas_stats_multi_core(
            img, None, lut, levels=levels, offsets=offsets,
            has_mask=False, interpret=interpret, need_diff=need_diff_hist,
        )
    img, w = _prep_inputs(images, mask)
    return _pallas_stats_multi_core(
        img, w, lut, levels=levels, offsets=offsets,
        has_mask=True, interpret=interpret, need_diff=need_diff_hist,
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
    need_diff_hist: bool = True,
) -> SuffStats:
    """Pallas-fused version of :func:`tpumcia.features.stats.sufficient_stats`.

    ``interpret=True`` runs the kernel in the Pallas interpreter (for CPU
    tests).

    ``need_diff_hist=False`` (the hybrid-wire fast path) skips the in-kernel
    difference-histogram construction — the nibble matvecs, diff one-hot
    compares, and the (2L/16, 16) matmul per chunk — and emits
    ``SuffStats.dstats`` (weight-plane reductions of the VMEM G accumulator)
    in its place; ``diff_hist`` is ``None`` on the result. The 'exact'
    finalize backend needs the full histogram and must use the default.
    """
    del with_intensity, with_glcm
    lut = rescale_lut_device(levels)  # cached device copy, no re-upload
    if mask is None:
        # skip _prep_inputs' all-ones weight array (100 MB at B=2048)
        images = jnp.asarray(images)
        img = jnp.transpose(images, (0, 3, 1, 2)).astype(jnp.int32)
        return _pallas_stats_core(
            img, None, lut, levels=levels, offset=offset,
            has_mask=False, interpret=interpret, need_diff=need_diff_hist,
        )
    img, w = _prep_inputs(images, mask)
    return _pallas_stats_core(
        img, w, lut, levels=levels, offset=offset,
        has_mask=True, interpret=interpret, need_diff=need_diff_hist,
    )
