"""Direct (sort-based) float intensity path vs the oracle formulas."""

import numpy as np
import pytest

from tpumcia.features.intensity_direct import intensity_features_direct
from tpumcia.reference_impl import oracle


def _oracle_intensity(img_f64):
    feats = oracle.basic_statistical_features(img_f64)
    C = img_f64.shape[2]
    out = np.zeros((C, 17))
    for c in range(C):
        for i, f in enumerate(oracle.INTENSITY_FEATURES):
            out[c, i] = feats[f"{f}_Ch{c + 1}"]
    return out


def test_direct_matches_oracle_float(rng):
    imgs = rng.random((3, 32, 32, 2)).astype(np.float32)
    got = np.asarray(intensity_features_direct(imgs), np.float64)
    for b in range(3):
        want = _oracle_intensity(imgs[b].astype(np.float64))
        np.testing.assert_allclose(got[b], want, rtol=2e-4, atol=2e-4)


def test_direct_on_16bit(rng):
    raw = (rng.random((2, 24, 24, 1)) * 65535).astype(np.uint16)
    imgs = raw.astype(np.float32) / 65535.0
    got = np.asarray(intensity_features_direct(imgs), np.float64)
    want = _oracle_intensity(imgs[0].astype(np.float64))
    np.testing.assert_allclose(got[0], want, rtol=2e-4, atol=2e-4)


def test_direct_masked(rng):
    imgs = rng.random((1, 16, 16, 1)).astype(np.float32)
    mask = np.zeros((1, 16, 16, 1), bool)
    mask[:, 2:14, 3:12] = True
    got = np.asarray(intensity_features_direct(imgs, mask), np.float64)
    crop = imgs[:, 2:14, 3:12]
    want = _oracle_intensity(crop[0].astype(np.float64))
    np.testing.assert_allclose(got[0], want, rtol=2e-4, atol=2e-4)


def test_direct_empty_and_constant():
    imgs = np.full((1, 8, 8, 2), 0.5, np.float32)
    mask = np.zeros((1, 8, 8, 2), bool)
    mask[..., 1] = True  # channel 0 empty, channel 1 constant
    got = np.asarray(intensity_features_direct(imgs, mask))
    assert np.all(got[0, 0] == 0)  # empty channel -> zeros
    # constant channel: std 0, skew/kurt NaN->0 is NOT applied (mask nonempty)
    std_idx = 13
    assert got[0, 1, std_idx] == 0
    assert np.isnan(got[0, 1, 14]) and np.isnan(got[0, 1, 15])
    # entropy of constant channel = 0
    assert got[0, 1, 16] == 0
