"""MFU / roofline accounting for the fused GLCM sufficient-stats kernel.

Counts the kernel's per-image MXU and VPU work analytically from the kernel
structure (`features/pallas_glcm.py` v5), measures the achieved rate on the
real chip (chained dispatches, one tiny final fetch — single-dispatch
timings lie through the tunnel), and prints achieved-vs-peak MFU.

The reference workload this replaces is the Cython ``_glcm_loop`` scatter +
~20 numpy passes per channel (channel_importance_hand_crafted_features
.ipynb:298, :241-262) at 53.46 img/s on one CPU core.

Peak numbers (TPU v5e, per chip): 394.7 int8 TOPS, 197.4 bf16 TFLOPS,
819 GB/s HBM. MACs are counted as 2 ops (mul+add), the standard FLOP
convention, so MFU = achieved_ops / peak_ops.

Usage:
  python benchmarks/mfu.py            # analytic table + measured (TPU)
  python benchmarks/mfu.py --analytic # table only, no device needed
"""

from __future__ import annotations

import json
import sys

# v5e per-chip peaks
PEAK_INT8_OPS = 394.7e12
PEAK_BF16_FLOPS = 197.4e12
PEAK_HBM_BPS = 819e9


def kernel_ops(
    *,
    levels: int = 256,
    hw: int = 4096,
    channels: int = 3,
    chunk: int = 4096,
    masked: bool = False,
    need_diff: bool = False,
    roll: bool = True,
) -> dict:
    """Per-image op counts for the v5 kernel (pallas_glcm.py::_kernel).

    Every term is annotated with the kernel line it models; MACs×2 = ops.
    """
    L = levels
    HI = L // 16
    DHI = (2 * L) // 16
    K = -(-hw // chunk)  # chunks per channel
    CH = chunk

    per_ch = {}
    # --- MXU matmuls (int8 s8xs8->s32 unless noted), per channel ---------
    # hist16 += (HI,CH)x(16,CH)^T  [pallas_glcm.py:338]
    per_ch["mxu_hist_macs"] = K * HI * 16 * CH
    # value recovery: 2 matmuls (HI,16)x(16,CH) per stream, 2 streams
    # [pallas_glcm.py:345-348 -> _resc_values]
    per_ch["mxu_value_recovery_macs"] = K * 4 * HI * 16 * CH
    # G matmul: (L,CH)x(L,CH)^T -> (L,L)  [pallas_glcm.py:356]
    per_ch["mxu_G_macs"] = K * L * L * CH
    # end-of-channel marginals: 2 f32 matvecs (1,L)x(L,L) at HIGHEST
    # (6 bf16 MXU passes each) [pallas_glcm.py:181-188]
    per_ch["mxu_marginal_macs_f32"] = 2 * L * L
    if need_diff:
        # diff path: (DHI,CH)x(16,CH)^T per chunk [pallas_glcm.py:358-362]
        per_ch["mxu_diff_macs"] = K * DHI * 16 * CH
    else:
        per_ch["mxu_diff_macs"] = 0

    # --- VPU elementwise, per channel (ops ~= vector lanes touched) ------
    # nibble compares for hist + right stream: 2 streams x (HI+16, CH)
    per_ch["vpu_nibble_compares"] = K * 2 * (HI + 16) * CH
    # the two (L,CH) one-hot equalities [pallas_glcm.py:351-352]
    per_ch["vpu_onehot_compares"] = K * 2 * L * CH
    # value-recovery elementwise: R=Rh*16+Rl + hi-bucket select, 2 streams
    per_ch["vpu_value_recovery"] = K * 2 * (3 * HI * CH)
    # sentinel select + masks
    per_ch["vpu_masks"] = K * (4 if masked else 1) * CH
    # epilogue: sumsq limb split (~6 ops) + dstats planes (~8 ops) on (L,L)
    per_ch["vpu_epilogue"] = (6 + (0 if need_diff else 8)) * L * L
    if need_diff:
        per_ch["vpu_diff"] = K * (DHI + 16 + 2) * CH
    else:
        per_ch["vpu_diff"] = 0

    mxu_int8_macs = (
        per_ch["mxu_hist_macs"]
        + per_ch["mxu_value_recovery_macs"]
        + per_ch["mxu_G_macs"]
        + per_ch["mxu_diff_macs"]
    )
    vpu_ops = sum(v for k, v in per_ch.items() if k.startswith("vpu"))

    # HBM traffic per image, i32 chunk streams read once each. The default
    # kernel (TPUMCIA_KERNEL_SHIFT=roll, r4) derives the neighbour stream
    # in-kernel, so only the raw stream (and, masked, one mask stream)
    # comes from HBM; SHIFT=copy adds the materialised shifted copies.
    if roll:
        n_streams = 2 if masked else 1
    else:
        n_streams = 4 if masked else 2
    bytes_in = n_streams * hw * 4 * channels + HI * 16 * 4 * channels
    bytes_out = (HI * 16 + 1 + 2 * L + (DHI * 16 if need_diff else 4) + 4 + 1) * 4 * channels

    return {
        "per_channel": per_ch,
        "channels": channels,
        "mxu_int8_macs_per_img": mxu_int8_macs * channels,
        "mxu_int8_ops_per_img": 2 * mxu_int8_macs * channels,
        "mxu_f32_macs_per_img": per_ch["mxu_marginal_macs_f32"] * channels,
        "vpu_ops_per_img": vpu_ops * channels,
        "hbm_bytes_per_img": bytes_in + bytes_out,
        "roofline_int8_us_per_img": 2 * mxu_int8_macs * channels / PEAK_INT8_OPS * 1e6,
        "roofline_G_only_us_per_img": 2 * per_ch["mxu_G_macs"] * channels / PEAK_INT8_OPS * 1e6,
        "roofline_hbm_us_per_img": (bytes_in + bytes_out) / PEAK_HBM_BPS * 1e6,
    }


def resnet_fwd_macs(
    *,
    width: int = 32,
    h: int = 64,
    w: int = 64,
    channels: int = 3,
    classes: int = 6,
    stages: tuple = (2, 2, 2, 2),
) -> int:
    """Per-image forward MACs of models/cnn.py::ResNet (convs + classifier;
    GroupNorm/relu/pool are bandwidth-trivial next to the convs).

    Mirrors the module structure: 3x3 stem at full resolution, then stages
    of residual blocks — stage s has ``width * 2**s`` features, downsampling
    by 2 at its first block (stage > 0), whose shape change also adds a 1x1
    projection conv. This is the dense count (every output position pays all
    9 taps); XLA's compiled cost_analysis, which discounts the SAME-padding
    border taps, measures 4.1% lower (1.069 vs 1.114 GFLOP fwd) — so MFU
    derived from this count overstates by ~4%, noted in BENCHMARKS.md."""
    macs = h * w * 9 * channels * width  # stem
    f_in, hh, ww = width, h, w
    for s, blocks in enumerate(stages):
        f = width * (2**s)
        for b in range(blocks):
            stride = 2 if s > 0 and b == 0 else 1
            hh2, ww2 = hh // stride, ww // stride
            macs += hh2 * ww2 * 9 * f_in * f  # conv1
            macs += hh2 * ww2 * 9 * f * f  # conv2
            if f_in != f or stride != 1:
                macs += hh2 * ww2 * 1 * f_in * f  # 1x1 proj
            f_in, hh, ww = f, hh2, ww2
    macs += f_in * classes  # classifier dense
    return macs


def cnn_config3_table(
    train_img_s: float | None = None, occ_img_s: float | None = None
) -> str:
    """Config 3 MFU rows (ResNet-18 width 32, 64x64x3, B=256, 6 classes).

    Train step FLOPs = 3x forward (activation + weight gradients each
    re-pay the forward's MACs — the standard dense-training rule); the
    occlusion sweep is forward-only but evaluates C+1 variants (baseline +
    one per zeroed channel) per image. Pass the measured img/s from
    run_configs.py config 3 to get achieved bf16 MFU."""
    fwd = resnet_fwd_macs()
    rows = [
        f"- ResNet-18 width 32, 64x64x3: forward = {2 * fwd / 1e9:.2f} "
        f"GFLOP/img (dense conv count; XLA's padding-aware count is 4% lower)",
        f"- train step = {6 * fwd / 1e9:.2f} GFLOP/img (3x fwd), roofline "
        f"{6 * fwd / PEAK_BF16_FLOPS * 1e6:.1f} us/img at 197.4 bf16 TFLOPS "
        f"-> {PEAK_BF16_FLOPS / (6 * fwd) / 1e3:.1f}k img/s",
        f"- occlusion sweep = {(3 + 1) * 2 * fwd / 1e9:.2f} GFLOP/img "
        f"(C+1 = 4 forwards), roofline "
        f"{(3 + 1) * 2 * fwd / PEAK_BF16_FLOPS * 1e6:.1f} us/img -> "
        f"{PEAK_BF16_FLOPS / ((3 + 1) * 2 * fwd) / 1e3:.1f}k img/s",
    ]
    if train_img_s:
        ach = 6 * fwd * train_img_s
        rows.append(
            f"- measured train {train_img_s / 1e3:.1f}k img/s -> "
            f"{ach / 1e12:.1f} bf16 TFLOPS = "
            f"{100 * ach / PEAK_BF16_FLOPS:.1f}% MFU"
        )
    if occ_img_s:
        ach = (3 + 1) * 2 * fwd * occ_img_s
        rows.append(
            f"- measured occlusion {occ_img_s / 1e3:.1f}k img/s -> "
            f"{ach / 1e12:.1f} bf16 TFLOPS = "
            f"{100 * ach / PEAK_BF16_FLOPS:.1f}% MFU"
        )
    return "\n".join(rows)


def analytic_table() -> str:
    wire = kernel_ops(need_diff=False)
    full = kernel_ops(need_diff=True)
    rows = [
        ("G matmul (L,CH)x(L,CH)^T", "int8 MXU",
         wire["per_channel"]["mxu_G_macs"], full["per_channel"]["mxu_G_macs"]),
        ("hist nibble matmul", "int8 MXU",
         wire["per_channel"]["mxu_hist_macs"], full["per_channel"]["mxu_hist_macs"]),
        ("value recovery x4", "int8 MXU",
         wire["per_channel"]["mxu_value_recovery_macs"],
         full["per_channel"]["mxu_value_recovery_macs"]),
        ("diff-hist matmul", "int8 MXU", 0, full["per_channel"]["mxu_diff_macs"]),
        ("marginal matvecs", "f32 MXU (HIGHEST)",
         wire["per_channel"]["mxu_marginal_macs_f32"],
         full["per_channel"]["mxu_marginal_macs_f32"]),
        ("one-hot equalities (L,CH)x2", "VPU",
         wire["per_channel"]["vpu_onehot_compares"],
         full["per_channel"]["vpu_onehot_compares"]),
        ("nibble compares", "VPU",
         wire["per_channel"]["vpu_nibble_compares"],
         full["per_channel"]["vpu_nibble_compares"]),
        ("epilogue (sumsq/dstats)", "VPU",
         wire["per_channel"]["vpu_epilogue"], full["per_channel"]["vpu_epilogue"]),
    ]
    out = ["| stage | unit | wire MACs-or-ops/(img,ch) | full |",
           "|---|---|---|---|"]
    for name, unit, w, f in rows:
        out.append(f"| {name} | {unit} | {w:,} | {f:,} |")
    out.append("")
    for tag, d in (("wire (need_diff=False)", wire), ("full (exact)", full)):
        out.append(
            f"- **{tag}**: {d['mxu_int8_ops_per_img']/1e9:.2f} Gops int8/img "
            f"(roofline {d['roofline_int8_us_per_img']:.2f} us/img; G alone "
            f"{d['roofline_G_only_us_per_img']:.2f}), VPU "
            f"{d['vpu_ops_per_img']/1e6:.1f} Mops/img, HBM "
            f"{d['hbm_bytes_per_img']/1024:.0f} KiB/img "
            f"({d['roofline_hbm_us_per_img']:.2f} us/img at 819 GB/s)"
        )
    return "\n".join(out)


def measure(batch: int = 2048, reps: int = 16) -> dict:
    """Amortized kernel-only rate: chain `reps` dispatches, one tiny fetch."""
    from tpumcia.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpumcia.features.pallas_glcm import sufficient_stats_pallas

    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, size=(batch, 64, 64, 3), dtype=np.uint8)
    dev = jax.device_put(imgs)

    results = {}
    for tag, need_diff in (("wire", False), ("full", True)):
        def run(x, need_diff=need_diff):
            s = sufficient_stats_pallas(x, need_diff_hist=need_diff)
            return s.pair_count[0, 0]

        # warm
        np.asarray(run(dev))
        t0 = time.perf_counter()
        outs = [run(dev) for _ in range(reps)]
        np.asarray(outs[-1])  # force through the tunnel
        dt = time.perf_counter() - t0
        us_per_img = dt / (reps * batch) * 1e6
        results[tag] = us_per_img
    return results


def main() -> None:
    print(analytic_table())
    print()
    print("CNN path (config 3; pass measured img/s via --cnn train occ):")
    cnn_args = None
    if "--cnn" in sys.argv[1:]:
        i = sys.argv.index("--cnn")
        cnn_args = (float(sys.argv[i + 1]), float(sys.argv[i + 2]))
    print(cnn_config3_table(*(cnn_args or ())))
    if "--analytic" in sys.argv[1:]:
        return
    meas = measure()
    wire = kernel_ops(need_diff=False)
    full = kernel_ops(need_diff=True)
    for tag, d in (("wire", wire), ("full", full)):
        us = meas[tag]
        ach = d["mxu_int8_ops_per_img"] / (us * 1e-6)
        print(
            json.dumps(
                {
                    "kernel": tag,
                    "us_per_img": round(us, 2),
                    "img_per_s": round(1e6 / us),
                    "int8_ops_per_img": d["mxu_int8_ops_per_img"],
                    "achieved_int8_tops": round(ach / 1e12, 1),
                    "mfu_pct": round(100 * ach / PEAK_INT8_OPS, 1),
                    "roofline_us_per_img": round(d["roofline_int8_us_per_img"], 2),
                }
            )
        )


if __name__ == "__main__":
    main()
