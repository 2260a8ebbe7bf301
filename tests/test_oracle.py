"""Sanity tests for the CPU oracle itself (the golden-test ground truth).

The oracle re-implements the skimage primitives the reference delegates to
(skimage is not installed here); these tests pin its semantics against
hand-computable cases and scipy.
"""

import numpy as np
import pytest

from tpumcia.reference_impl import oracle


def test_graycomatrix_tiny():
    # 2x3 image, offset (0, +1): pairs (0,1), (1,2), (2,0), (0,1)
    img = np.array([[0, 1, 2], [2, 0, 1]], dtype=np.uint8)
    glcm = oracle.graycomatrix(img, distances=[1], angles=[0], levels=3)
    assert glcm.shape == (3, 3, 1, 1)
    m = glcm[:, :, 0, 0]
    expected = np.zeros((3, 3))
    expected[0, 1] = 2
    expected[1, 2] = 1
    expected[2, 0] = 1
    np.testing.assert_array_equal(m, expected)
    assert m.sum() == 4  # 2 rows x (3-1) cols


def test_graycomatrix_vertical_offset():
    img = np.array([[0, 1], [1, 1]], dtype=np.uint8)
    glcm = oracle.graycomatrix(img, distances=[1], angles=[np.pi / 2], levels=2)
    # skimage angle pi/2: row offset round(sin)=1, col offset round(cos)=0
    m = glcm[:, :, 0, 0]
    assert m.sum() == 2
    assert m[0, 1] == 1 and m[1, 1] == 1


def test_graycoprops_uniform():
    # GLCM with all mass at (i, i): contrast 0, homogeneity 1, correlation 1
    glcm = np.zeros((4, 4, 1, 1), dtype=np.uint32)
    for i in range(4):
        glcm[i, i, 0, 0] = 5
    assert oracle.graycoprops(glcm, "contrast")[0, 0] == 0
    assert oracle.graycoprops(glcm, "dissimilarity")[0, 0] == 0
    assert oracle.graycoprops(glcm, "homogeneity")[0, 0] == 1
    # 4 cells each p=1/4 -> ASM = 4 * (1/4)^2 = 1/4
    assert oracle.graycoprops(glcm, "ASM")[0, 0] == pytest.approx(0.25)
    assert oracle.graycoprops(glcm, "energy")[0, 0] == pytest.approx(0.5)
    assert oracle.graycoprops(glcm, "correlation")[0, 0] == pytest.approx(1.0)


def test_graycoprops_constant_value_correlation_is_one():
    glcm = np.zeros((4, 4, 1, 1), dtype=np.uint32)
    glcm[2, 2, 0, 0] = 7  # zero marginal variance
    assert oracle.graycoprops(glcm, "correlation")[0, 0] == 1.0


def test_shannon_entropy_matches_definition():
    img = np.array([0, 0, 1, 1], dtype=np.uint8)
    assert oracle.shannon_entropy(img) == pytest.approx(1.0)
    img = np.array([3, 3, 3, 3], dtype=np.uint8)
    assert oracle.shannon_entropy(img) == pytest.approx(0.0)
    # non-integer values are supported (unique-value histogram)
    img = np.array([0.5, 0.5, 1.5, 2.5])
    p = np.array([2, 1, 1]) / 4
    assert oracle.shannon_entropy(img) == pytest.approx(-(p * np.log2(p)).sum())


def test_percentile_quirk_is_replicated():
    """The reference passes q=0.1..0.9, i.e. near-minimum order statistics
    (SURVEY.md §2.3)."""
    img = np.arange(100, dtype=np.float64).reshape(10, 10, 1) / 99.0
    feats = oracle.basic_statistical_features(img)
    # q=0.1 on 100 sorted values: position 0.099 -> ~ the minimum
    assert feats["percentile10_intensity_Ch1"] == pytest.approx(
        np.percentile(img[:, :, 0], 0.1)
    )
    assert feats["percentile10_intensity_Ch1"] < 0.02  # NOT the 10th percentile


def test_feature_vector_layout():
    rng = np.random.default_rng(0)
    img = (rng.random((16, 16, 3)) * 255).astype(np.uint8) / 255.0
    img[0, 0, :] = 1.0  # avoid all-zero channels
    vec = oracle.feature_vector(img)
    names = oracle.feature_names(3)
    assert vec.shape == (69,)
    assert len(names) == 69
    assert names[0] == "min_intensity_Ch1"
    assert names[17] == "min_intensity_Ch2"
    assert names[51] == "contrast_Ch1"
    assert names[-1] == "correlation_Ch3"


def test_scipy_moment_defaults():
    """Pin scipy's biased fisher kurtosis / biased skew (reference defaults,
    ipynb:259-260)."""
    from scipy.stats import kurtosis, skew

    rng = np.random.default_rng(3)
    x = rng.random(1000)
    m = x.mean()
    m2 = ((x - m) ** 2).mean()
    m3 = ((x - m) ** 3).mean()
    m4 = ((x - m) ** 4).mean()
    assert kurtosis(x) == pytest.approx(m4 / m2**2 - 3)
    assert skew(x) == pytest.approx(m3 / m2**1.5)


def test_add_noise_channels_semantics(rng):
    img = (np.arange(64 * 64).reshape(64, 64) % 256).astype(np.uint8)
    out = oracle.add_noise_channels(img, rng)
    assert out.shape == (64, 64, 3)
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out[:, :, 0], img)  # /255 then *255 round-trips
    # noise channels: clipped N(0, 0.1)*255 truncated -> mean well below 128
    assert 0 < out[:, :, 1].mean() < 40
    assert (out[:, :, 1] >= 0).all()


def test_glcm_features_all_zero_channel_raises():
    img = np.zeros((8, 8, 1))
    with pytest.raises(FloatingPointError):
        oracle.glcm_features(img)
