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
    """One warmed ~``n_bytes`` timing in EACH direction (D2H then H2D).

    The warm fetch and the timed fetch MUST be distinct ``jax.Array``
    objects: ``np.asarray`` caches the host copy on the array
    (``_npy_value``), so re-fetching the same object is a host memcpy and
    times the cache, not the link (r4 bug: probes recorded ~9 GB/s through
    a ~30 MB/s tunnel). ``dev_array``: reuse an existing device array
    (sliced flat) instead of allocating one.

    H2D matters independently of D2H: the tunnel's directions load
    differently (ingest-bound workloads like streaming sit on the H2D
    floor while fetch-bound ones sit on D2H), so a line stamped with only
    one direction can't attribute the other's regressions (r4 lesson:
    config 5 recorded 387 img/s next to a healthy 28 MB/s d2h stamp)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    n_elems = n_bytes // 4
    if dev_array is None:
        base = jax.device_put(jnp.zeros((2, n_elems), jnp.float32))
        warm, flat = base[0], base[1]
    else:
        raveled = dev_array.reshape(-1)
        n = min(n_bytes // dev_array.dtype.itemsize, raveled.shape[0] // 2)
        warm, flat = raveled[:n], raveled[n : 2 * n]
    np.asarray(warm)  # warm the transfer path and force prior dispatches
    t0 = time.perf_counter()
    out = np.asarray(flat)
    dt = time.perf_counter() - t0
    mb = out.nbytes / 1e6
    # H2D: device_put returns as soon as the transfer is enqueued; a 1-elem
    # D2H fetch of the UPLOADED array forces completion without adding a
    # second bulk transfer to the timing. The forcing fetch costs one link
    # round trip (~30-300 ms), so the upload is 4x the D2H probe size to
    # keep the stamp closer to sustained bandwidth than to RTT.
    host = np.empty(4 * n_bytes, np.uint8)
    t0 = time.perf_counter()
    up = jax.device_put(host)
    np.asarray(up[:1])
    dt_up = time.perf_counter() - t0
    mb_up = host.nbytes / 1e6
    return {
        "probe_mb": round(mb, 2),
        "d2h_mbps": round(mb / max(dt, 1e-9), 1),
        "h2d_mbps": round(mb_up / max(dt_up, 1e-9), 1),
    }
