"""Profiling / observability utilities (SURVEY.md §5: tracing + metrics)."""

import json

import numpy as np

from tpumcia.utils.logging import MetricsLogger
from tpumcia.utils.profiling import ThroughputMeter


def test_throughput_meter_accumulates():
    m = ThroughputMeter()
    with m.measure("extract", 100):
        pass
    with m.measure("extract", 50):
        pass
    with m.measure("fit", 10):
        pass
    rep = m.report()
    assert rep["extract"]["items"] == 150
    assert rep["fit"]["items"] == 10
    assert rep["extract"]["per_second"] == m.rate("extract") > 0
    assert m.rate("missing") == 0.0


def test_metrics_logger_jsonl(tmp_path):
    path = tmp_path / "metrics.jsonl"
    log = MetricsLogger(path)
    log.log("stage_done", stage="features", images=12, rate=3.5)
    log.log("stage_done", stage="fit", accuracy=0.9)
    lines = [json.loads(l) for l in path.read_text().splitlines()]
    assert len(lines) == 2
    assert lines[0]["stage"] == "features" and lines[0]["images"] == 12
    assert all("ts" in l and l["event"] == "stage_done" for l in lines)


def test_probe_link_times_an_uncached_fetch(monkeypatch):
    """Regression: the warm fetch and the timed fetch must be DISTINCT
    jax.Arrays — np.asarray caches the host copy on the array object, so
    timing a re-fetch of the warmed array measures a host memcpy, not the
    link (observed: ~9 GB/s stamped through a ~30 MB/s tunnel)."""
    import numpy
    import jax.numpy as jnp

    from tpumcia.utils import linkprobe

    fetched = []
    real = numpy.asarray

    def spy(a, *args, **kw):
        fetched.append(id(a))
        return real(a, *args, **kw)

    monkeypatch.setattr(numpy, "asarray", spy)

    out = linkprobe.probe_link(n_bytes=1 << 20)
    assert len(fetched) >= 2 and fetched[-1] != fetched[-2]
    assert out["probe_mb"] > 0 and out["d2h_mbps"] > 0
    # both directions stamped: ingest-bound workloads regress on H2D while
    # the D2H stamp looks healthy (r4 config-5 lesson)
    assert out["h2d_mbps"] > 0

    fetched.clear()
    dev = jnp.zeros((1 << 19,), jnp.float32)
    out = linkprobe.probe_link(dev, n_bytes=1 << 20)
    assert len(fetched) >= 2 and fetched[-1] != fetched[-2]
    assert out["probe_mb"] > 0
