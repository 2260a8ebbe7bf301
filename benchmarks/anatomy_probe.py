"""Fast-path dispatch anatomy: where the per-image device time goes.

Times the bench workload's per-batch fused dispatch (synth -> prep ->
Pallas wire kernel -> u32 wire reduce -> device f32 features) in nested
prefixes at B=2048, so successive differences isolate each stage:

  synth        noise_channels_chw alone
  +kernel      synth -> _pallas_stats_core (wire path)
  +wire        synth -> stats -> _device_reduce_wire
  full         the production _batch_fused_dispatch (wire + device feats)

Each stage is one jit, timed by chaining >= 16 dispatches with one tiny
final fetch (single-dispatch timings lie through the tunnel). The kernel-
only number comes from benchmarks/mfu.py; kernel-internal vs prep split
within '+kernel' uses that.

Prints one JSON line per stage plus a derived per-stage breakdown.
"""

from __future__ import annotations

import functools
import json
import time

REPS = 16
BATCH = 2048


@functools.partial(__import__("jax").jit, static_argnames=("stage",))
def _staged(imgs, key, lut, *, stage):
    import jax.numpy as jnp

    from tpumcia.features.finalize import _finalize
    from tpumcia.features.hybrid import _device_reduce_wire
    from tpumcia.features.pallas_glcm import _pallas_stats_core
    from tpumcia.preprocess.synth import noise_channels_chw

    img = noise_channels_chw(imgs, key, num_noise=2, var=0.01)
    if stage == "synth":
        return img[0, 0, 0, 0]
    st = _pallas_stats_core(
        img, None, lut, levels=256, offset=(0, 1), has_mask=False,
        interpret=False, need_diff=False,
    )
    if stage == "kernel":
        return st.pair_count[0, 0]
    wire = _device_reduce_wire(st)
    if stage == "wire":
        return wire[0, 0, 0]
    feats = jnp.nan_to_num(_finalize(st, jnp, jnp.float32, True, True).values)
    return wire[0, 0, 0] + feats[0, 0].astype(wire.dtype)


def main() -> None:
    from tpumcia.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import numpy as np

    from tpumcia.features.stats import rescale_lut_device

    rng = np.random.RandomState(0)
    imgs = jax.device_put(
        rng.randint(0, 256, size=(BATCH, 64, 64), dtype=np.uint8)
    )
    key = jax.device_put(jax.random.key(7))
    lut = rescale_lut_device(256)

    stages = ("synth", "kernel", "wire", "full")
    us = {}
    for stage in stages:
        np.asarray(_staged(imgs, key, lut, stage=stage))  # warm/compile
        t0 = time.perf_counter()
        outs = [_staged(imgs, key, lut, stage=stage) for _ in range(REPS)]
        np.asarray(outs[-1])
        us[stage] = (time.perf_counter() - t0) / (REPS * BATCH) * 1e6
        print(json.dumps({"stage": stage, "us_per_img_cumulative": round(us[stage], 2)}))

    print(json.dumps({
        "breakdown_us_per_img": {
            "synth": round(us["synth"], 2),
            "prep_plus_kernel": round(us["kernel"] - us["synth"], 2),
            "wire_reduce": round(us["wire"] - us["kernel"], 2),
            "device_features": round(us["full"] - us["wire"], 2),
            "total_full_dispatch": round(us["full"], 2),
        },
        "batch": BATCH,
        "reps": REPS,
    }))


if __name__ == "__main__":
    main()
