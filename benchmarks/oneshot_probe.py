"""Decompose the one-shot ``extract_features`` call's wall clock (VERDICT r3 #7).

Config-1 shape (B=2048, 64x64x3, masked optional): the one-shot API measured
2.5x slower than the batched API on the same workload, and nobody knew where
the 88 ms went. This probe times the stages the one-shot wire branch
(`features/extract.py:209-232`) actually runs:

  enqueue   - returning from the fused stats->wire dispatch (async enqueue)
  compute   - until a 1-element fetch of the wire completes (device compute
              + one link round trip)
  fetch     - `_fetch_concurrent(wire)` (chunked-concurrent D2H)
  assemble  - unpack_wire + assemble_reduced on host
  public    - the whole public `extract_features` call, same inputs

Prints one JSON line per variant (maskless / masked).
"""

from __future__ import annotations

import json
import os
import time

from tpumcia.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tpumcia.config import FeatureConfig  # noqa: E402
from tpumcia.features.extract import (  # noqa: E402
    _batch_fused_dispatch,
    _resolve_pallas,
    extract_features,
)
from tpumcia.features.hybrid import (  # noqa: E402
    _fetch_concurrent,
    assemble_reduced,
    unpack_wire,
)
from tpumcia.features.stats import rescale_lut_device  # noqa: E402

B = int(os.environ.get("TPUMCIA_PROBE_B", 2048))


def probe(masked: bool) -> dict:
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, size=(B, 64, 64, 3), dtype=np.uint8)
    mask = (
        (rng.random((B, 64, 64, 3)) > 0.3).astype(np.uint8) if masked else None
    )
    imgs_dev = jax.device_put(imgs)
    mask_dev = jax.device_put(mask) if masked else None

    cfg = FeatureConfig()
    lut = rescale_lut_device(cfg.glcm.levels)
    use_pallas = _resolve_pallas(cfg)
    kw = dict(
        levels=cfg.glcm.levels, offset=tuple(cfg.glcm.offset),
        use_pallas=use_pallas, keep_device=False,
        chunk_size=cfg.chunk_size, onehot_dtype=cfg.onehot_dtype,
    )

    # warm both the staged path and the public call
    wire, _ = _batch_fused_dispatch(imgs_dev, mask_dev, None, lut, **kw)
    np.asarray(wire.reshape(-1)[:1])
    _fetch_concurrent(wire)
    extract_features(imgs_dev, mask=mask_dev, config=cfg)

    stages = {k: [] for k in ("enqueue", "compute", "fetch", "assemble", "public")}
    for _ in range(6):
        t0 = time.perf_counter()
        wire, _ = _batch_fused_dispatch(imgs_dev, mask_dev, None, lut, **kw)
        t1 = time.perf_counter()
        np.asarray(wire.reshape(-1)[:1])  # device compute + 1 link RTT
        t2 = time.perf_counter()
        host = _fetch_concurrent(wire)
        t3 = time.perf_counter()
        assemble_reduced(unpack_wire(host), levels=cfg.glcm.levels)
        t4 = time.perf_counter()
        stages["enqueue"].append(t1 - t0)
        stages["compute"].append(t2 - t1)
        stages["fetch"].append(t3 - t2)
        stages["assemble"].append(t4 - t3)

        t0 = time.perf_counter()
        extract_features(imgs_dev, mask=mask_dev, config=cfg)
        stages["public"].append(time.perf_counter() - t0)

    best = {k: round(min(v) * 1e3, 1) for k, v in stages.items()}
    return {
        "probe": "oneshot_extract_features",
        "masked": masked,
        "batch": B,
        "ms_best_of_6": best,
        "public_img_per_s": round(B / min(stages["public"])),
        "wire_mb": round(np.asarray(wire).nbytes / 1e6, 2),
    }


def main() -> None:
    for masked in (False, True):
        print(json.dumps(probe(masked)))


if __name__ == "__main__":
    main()
