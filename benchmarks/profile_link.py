"""Config-5 streaming bottleneck isolation probe (real chip).

Separates the three costs that could bound `stream_extract` at config-5
scale (BASELINE.json config 5; reference loop ipynb:358-364) and prints
each in isolation:

1. bare serial H2D of the identical shards (`jax.device_put`) — the link
   ceiling in img/s at this tunnel moment;
2. dispatch enqueue + wire fetch (compute + D2H) + host assembly, each
   timed separately;
3. a duplex probe: H2D on one thread while D2H + assembly run on another,
   vs the serial sum — measures whether the link full-duplexes.

Recorded result (2026-08-17, benchmarks/BENCHMARKS.md): the pipeline's
end-to-end rate equals the bare-H2D ceiling; assembly and fetches are
negligible; the tunnel does not full-duplex. Config 5 measures the link.
"""
import time
import numpy as np

from tpumcia.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from tpumcia.io.synthetic import synthetic_multichannel
from tpumcia.config import FeatureConfig
from tpumcia.features.extract import _batch_fused_dispatch, _resolve_pallas
from tpumcia.features.hybrid import _fetch_concurrent, assemble_reduced, unpack_wire
from tpumcia.features.stats import rescale_lut_device

N, SHARD = 16384, 2048
imgs, labels, _ = synthetic_multichannel(N // 6 + 1, seed=0)
imgs = imgs[:N]
cfg = FeatureConfig()
lut = rescale_lut_device(cfg.glcm.levels)
use_pallas = _resolve_pallas(cfg)
offset = tuple(cfg.glcm.offsets[0] if cfg.include_glcm else cfg.glcm.offset)

shards = [imgs[i : i + SHARD] for i in range(0, N, SHARD)]

# warm compile at shard shape
d0 = jax.device_put(shards[0])
wire, _ = _batch_fused_dispatch(
    d0, None, None, lut, levels=256, offset=offset, use_pallas=use_pallas,
    keep_device=False, chunk_size=cfg.chunk_size, onehot_dtype=cfg.onehot_dtype,
)
w_host = _fetch_concurrent(wire)
_ = assemble_reduced(unpack_wire(w_host), levels=256)

# 1) pure serial H2D of all 8 shards
t0 = time.perf_counter()
staged = [jax.device_put(s) for s in shards]
for s in staged:
    s.block_until_ready()
# force real sync through the tunnel: fetch one byte from each
for s in staged:
    np.asarray(s[0, 0, 0])
t_h2d = time.perf_counter() - t0
print(f"serial H2D 8x{SHARD * 12288 / 1e6:.1f}MB: {t_h2d:.2f}s "
      f"({N * 12288 / t_h2d / 1e6:.1f} MB/s, {N / t_h2d:.0f} img/s ceiling)")

# 2) dispatch all 8 (inputs already on device), fetch wires serially
t0 = time.perf_counter()
wires = []
for s in staged:
    w, _ = _batch_fused_dispatch(
        s, None, None, lut, levels=256, offset=offset, use_pallas=use_pallas,
        keep_device=False, chunk_size=cfg.chunk_size, onehot_dtype=cfg.onehot_dtype,
    )
    wires.append(w)
t_disp = time.perf_counter() - t0
hosts = []
t0 = time.perf_counter()
for w in wires:
    hosts.append(_fetch_concurrent(w))
t_fetch = time.perf_counter() - t0
t0 = time.perf_counter()
outs = [assemble_reduced(unpack_wire(h), levels=256) for h in hosts]
t_asm = time.perf_counter() - t0
print(f"dispatch-enqueue: {t_disp:.2f}s; wire fetch (compute+D2H): {t_fetch:.2f}s; "
      f"host assemble x8: {t_asm:.2f}s")

# 3) duplex test: upload shard i+1 on a thread WHILE fetching wire i
import threading

staged2 = [None] * len(shards)
t0 = time.perf_counter()

def uploader():
    for i, s in enumerate(shards):
        d = jax.device_put(s)
        d.block_until_ready()
        staged2[i] = d

up = threading.Thread(target=uploader)
up.start()
# concurrently re-fetch the wires (D2H) + assemble on host
hosts2 = [assemble_reduced(unpack_wire(_fetch_concurrent(w)), levels=256) for w in wires]
up.join()
for s in staged2:
    np.asarray(s[0, 0, 0])
t_duplex = time.perf_counter() - t0
print(f"duplex (H2D thread || D2H fetch + host assemble): {t_duplex:.2f}s "
      f"vs serial sum {t_h2d + t_fetch + t_asm:.2f}s")
