"""Shared link-condition probe for recorded benchmark lines.

Every recorded throughput line carries a ~1 MB D2H timing captured just
before the run so regressions are attributable to tunnel load at a glance
(round-3 lesson: a config 'regressed' purely from link conditions and the
record couldn't show it). One implementation — bench.py and
benchmarks/run_configs.py must never drift apart on the probe's contract.
"""

from __future__ import annotations

import time


def probe_link(dev_array=None, n_bytes: int = 1 << 20) -> dict:
    """One warmed ~``n_bytes`` D2H timing. ``dev_array``: reuse an existing
    device array (sliced flat) instead of allocating one."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    if dev_array is None:
        flat = jax.device_put(jnp.zeros((n_bytes // 4,), jnp.float32))
    else:
        flat = dev_array.reshape(-1)[: n_bytes // dev_array.dtype.itemsize]
    np.asarray(flat)  # warm the fetch path (compiles the slice)
    t0 = time.perf_counter()
    out = np.asarray(flat)
    dt = time.perf_counter() - t0
    mb = out.nbytes / 1e6
    return {"probe_mb": round(mb, 2), "d2h_mbps": round(mb / max(dt, 1e-9), 1)}
