"""Hybrid (device-reduce + host-assemble) finalisation vs oracle and host path."""

import numpy as np
import pytest

from tpumcia.config import FeatureConfig
from tpumcia.features.extract import extract_features
from tpumcia.reference_impl import oracle


def test_fetch_concurrent_matches_plain():
    """Chunked concurrent D2H must preserve content and order, and fall
    back to a plain fetch for small arrays."""
    import jax.numpy as jnp

    from tpumcia.features.hybrid import _fetch_concurrent

    big = jnp.arange(7 * 191 * 20, dtype=jnp.uint32).reshape(7 * 191, 20)
    np.testing.assert_array_equal(
        _fetch_concurrent(big, min_bytes=0), np.asarray(big)
    )
    small = jnp.arange(12, dtype=jnp.uint32).reshape(3, 4)
    np.testing.assert_array_equal(_fetch_concurrent(small), np.asarray(small))
    # small leading axis, wide second axis -> splits on axis 1
    wide = jnp.arange(3 * 100000, dtype=jnp.uint32).reshape(3, 100000)
    np.testing.assert_array_equal(
        _fetch_concurrent(wide, min_bytes=0), np.asarray(wide)
    )

HYBRID = FeatureConfig(precision="hybrid", use_pallas="never")
EXACT = FeatureConfig(precision="exact", use_pallas="never")


def test_hybrid_golden(small_batch):
    ref = np.stack([oracle.feature_vector(im / 255.0) for im in small_batch])
    fm = extract_features(small_batch, config=HYBRID)
    err = np.abs(fm.values - ref)
    assert np.nanmax(err) < 1e-5  # BASELINE.md target
    assert np.nanmean(err) < 1e-6
    # the exact-integer features are bit-tight even in hybrid mode
    exact_cols = [
        i for i, n in enumerate(fm.names)
        if n.split("_Ch")[0] in (
            "min_intensity", "max_intensity", "total_intensity",
            "mean_intensity", "contrast", "dissimilarity", "ASM", "energy",
            "correlation",
        ) or n.startswith("percentile")
    ]
    assert np.nanmax(err[:, exact_cols]) < 1e-9


def test_hybrid_matches_host_on_edges(rng):
    imgs = np.zeros((4, 32, 32, 2), dtype=np.uint8)
    imgs[0, :, :, 0] = 7  # constant channel
    imgs[1] = (rng.random((32, 32, 2)) * 256).astype(np.uint8)
    imgs[2, :, :, :] = 255
    imgs[3, :16] = 3
    imgs[3, 16:] = 250
    a = extract_features(imgs, config=HYBRID)
    b = extract_features(imgs, config=EXACT)
    assert np.array_equal(np.isnan(a.values), np.isnan(b.values))
    err = np.abs(np.nan_to_num(a.values) - np.nan_to_num(b.values))
    assert err.max() < 1e-5
    np.testing.assert_array_equal(
        np.asarray(a.degenerate), np.asarray(b.degenerate)
    )


def test_hybrid_masked(rng):
    img = (rng.random((2, 32, 32, 1)) * 256).astype(np.uint8)
    mask = rng.random((2, 32, 32, 1)) > 0.3
    a = extract_features(img, mask=mask, config=HYBRID)
    b = extract_features(img, mask=mask, config=EXACT)
    err = np.abs(np.nan_to_num(a.values) - np.nan_to_num(b.values))
    assert err.max() < 1e-5


def test_hybrid_falls_back_for_large_images(rng):
    # 256x256 = 65536 pixels: hybrid's exact-integer bounds don't hold
    img = (rng.random((1, 256, 256, 1)) * 256).astype(np.uint8)
    a = extract_features(img, config=HYBRID)
    b = extract_features(img, config=EXACT)
    np.testing.assert_array_equal(a.values, b.values)  # same (host) backend


def test_wire_format_matches_packed(rng):
    """The 20-word u32 wire decodes to exactly the same reduction dict as the
    51-f32 packed layout (including fully-masked and constant channels)."""
    from tpumcia.features.hybrid import (
        _device_reduce_packed,
        _device_reduce_wire,
        unpack_reduced,
        unpack_wire,
    )
    from tpumcia.features.stats import sufficient_stats

    imgs = (rng.random((4, 24, 24, 2)) * 256).astype(np.uint8)
    imgs[0, :, :, 0] = 9  # constant channel
    mask = np.ones((4, 24, 24, 2), bool)
    mask[1, :, :, 1] = False  # fully masked channel (n = 0)
    stats = sufficient_stats(imgs, mask=mask)
    a = unpack_reduced(np.asarray(_device_reduce_packed(stats)))
    b = unpack_wire(np.asarray(_device_reduce_wire(stats)))
    assert set(a) == set(b)
    for key in a:
        np.testing.assert_array_equal(
            np.asarray(a[key], np.float64),
            np.asarray(b[key], np.float64),
            err_msg=key,
        )


@pytest.mark.slow
def test_hybrid_fuzz_vs_exact(rng):
    """Randomized images + masks: hybrid stays within the MAE target of the
    exact path across many draws (regression net for the exact-integer
    bounds and mask interactions)."""
    for trial in range(8):
        B = int(rng.integers(1, 4))
        H = int(rng.integers(8, 48))
        W = int(rng.integers(8, 48))
        C = int(rng.integers(1, 4))
        img = (rng.random((B, H, W, C)) * 256).astype(np.uint8)
        if trial % 3 == 0:
            mask = rng.random((B, H, W, C)) > rng.uniform(0.1, 0.7)
        else:
            mask = None
        a = extract_features(img, mask=mask, config=HYBRID)
        b = extract_features(img, mask=mask, config=EXACT)
        av = np.nan_to_num(np.asarray(a.values, np.float64))
        bv = np.nan_to_num(np.asarray(b.values, np.float64))
        err = np.abs(av - bv)
        assert err.max() < 1e-5, (trial, B, H, W, C, err.max())
        np.testing.assert_array_equal(
            np.asarray(a.degenerate), np.asarray(b.degenerate)
        )
