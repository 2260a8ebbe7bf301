"""Round-5 kernel cycle model: NON-DCE per-stage costs (VERDICT r4 #1).

Runs the wire kernel (need_diff_hist=False, B=2048, 64x64x3, maskless) in a
fresh subprocess per knob (kernel knobs are read at import) and reports
`t_full - t_variant` as each stage's marginal cost. The SURROGATE knobs keep
every other stage's producers AND consumers live (pallas_glcm.py), so the
costs are attributable — unlike the r4 ABLATE bisection, whose stage skips
dead-coded their neighbours and overlapped.

Usage: python benchmarks/r5_probe.py   (TPU; fresh variants pay one Mosaic
remote compile each, cached under .jax_cache afterwards)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = '''
import sys; sys.path.insert(0, "/root/repo")
from tpumcia.utils.cache import enable_compilation_cache
enable_compilation_cache()
import time
import numpy as np
import jax
from tpumcia.features.pallas_glcm import sufficient_stats_pallas

BATCH, REPS = 2048, 16
rng = np.random.RandomState(0)
imgs = rng.randint(0, 256, size=(BATCH, 64, 64, 3), dtype=np.uint8)
dev = jax.device_put(imgs)

def run(x):
    return sufficient_stats_pallas(x, need_diff_hist=False).pair_count[0, 0]

np.asarray(run(dev))  # warm/compile
best = None
for _ in range(3):
    t0 = time.perf_counter()
    outs = [run(dev) for _ in range(REPS)]
    np.asarray(outs[-1])
    dt = (time.perf_counter() - t0) / (REPS * BATCH) * 1e6
    best = dt if best is None else min(best, dt)
print("US_PER_IMG", best)
'''

VARIANTS = [
    ("full", {}),
    ("surrogate:g", {"TPUMCIA_KERNEL_SURROGATE": "g"}),
    ("surrogate:epilogue", {"TPUMCIA_KERNEL_SURROGATE": "epilogue"}),
    ("surrogate:onehot", {"TPUMCIA_KERNEL_SURROGATE": "onehot"}),
    ("surrogate:g+epilogue", {"TPUMCIA_KERNEL_SURROGATE": "g,epilogue"}),
    ("ablate:recovery", {"TPUMCIA_KERNEL_ABLATE": "recovery"}),
    ("ablate:hist", {"TPUMCIA_KERNEL_ABLATE": "hist"}),
]


def main() -> None:
    results = {}
    for name, env_extra in VARIANTS:
        env = dict(os.environ, **env_extra)
        p = subprocess.run(
            [sys.executable, "-c", CHILD], env=env, capture_output=True,
            text=True, cwd="/root/repo", timeout=1800,
        )
        us = None
        for line in p.stdout.splitlines():
            if line.startswith("US_PER_IMG"):
                us = float(line.split()[1])
        results[name] = us
        print(json.dumps({"variant": name, "us_per_img": us}), flush=True)
        if us is None:
            print(p.stderr[-1500:], file=sys.stderr)
    full = results.get("full")
    if full:
        stages = {
            k.split(":", 1)[1]: round(full - v, 2)
            for k, v in results.items()
            if v is not None and ":" in k and "+" not in k
        }
        print(json.dumps({"full_us_per_img": full, "stage_costs_us": stages}))


if __name__ == "__main__":
    main()
