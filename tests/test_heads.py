"""Heads: device logistic regression, RF adapter, device forest, scaler."""

import numpy as np
import pytest

from tpumcia.config import HeadConfig
from tpumcia.models import MinMaxScaler, fit_head
from tpumcia.models.heads import LogisticHead, RandomForestHead


@pytest.fixture(scope="module")
def blobs():
    rng = np.random.default_rng(7)
    centers = rng.normal(0, 3, size=(4, 10))
    X = np.concatenate([c + rng.normal(0, 0.5, size=(50, 10)) for c in centers])
    y = np.repeat(np.arange(4), 50)
    perm = rng.permutation(len(y))
    return X[perm].astype(np.float32), y[perm]


def test_minmax_scaler_matches_sklearn(blobs):
    from sklearn.preprocessing import MinMaxScaler as SkScaler

    X, _ = blobs
    ours = MinMaxScaler.fit(X)
    sk = SkScaler().fit(X)
    np.testing.assert_allclose(
        np.asarray(ours.transform(X)), sk.transform(X), atol=1e-6
    )


def test_minmax_scaler_zero_range():
    X = np.array([[1.0, 5.0], [1.0, 7.0]])
    s = MinMaxScaler.fit(X)
    out = np.asarray(s.transform(X))
    np.testing.assert_allclose(out[:, 0], 0.0)  # zero-range -> scale 1, x-min=0
    np.testing.assert_allclose(out[:, 1], [0.0, 1.0])


def test_minmax_scaler_inverse_round_trip(blobs):
    X, _ = blobs
    s = MinMaxScaler.fit(X)
    back = np.asarray(s.inverse_transform(s.transform(X)))
    np.testing.assert_allclose(back, X, atol=1e-5)
    # zero-range columns come back at their constant value too
    Z = np.array([[2.0, 1.0], [2.0, 3.0]], np.float32)
    sz = MinMaxScaler.fit(Z)
    np.testing.assert_allclose(
        np.asarray(sz.inverse_transform(sz.transform(Z))), Z, atol=1e-6
    )


def test_logistic_head_learns(blobs):
    X, y = blobs
    head = fit_head(X, y, config=HeadConfig(kind="logistic", num_steps=300))
    assert isinstance(head, LogisticHead)
    assert head.score(X, y) > 0.95
    proba = np.asarray(head.predict_proba(X))
    np.testing.assert_allclose(proba.sum(axis=1), 1.0, atol=1e-5)
    assert set(head.predict(X)) <= set(np.unique(y))


def test_logistic_head_string_labels(blobs):
    X, y = blobs
    names = np.array(["a", "b", "c", "d"])[y]
    head = fit_head(X, names, config=HeadConfig(kind="logistic", num_steps=200))
    assert head.score(X, names) > 0.9
    assert set(head.predict(X)) <= set("abcd")


def test_rf_head_and_device_forest_agree(blobs):
    X, y = blobs
    head = fit_head(X, y, config=HeadConfig(kind="random_forest", n_estimators=20))
    assert isinstance(head, RandomForestHead)
    assert head.score(X, y) > 0.95

    dev = head.to_device()
    host_proba = head.predict_proba(X)
    dev_proba = np.asarray(dev.predict_proba(X))
    np.testing.assert_allclose(dev_proba, host_proba, atol=1e-5)
    np.testing.assert_array_equal(dev.predict(X), head.predict(X))


def test_device_forest_gemm_matches_lockstep(blobs):
    """The GEMM formulation (path-matrix matmuls) must agree exactly with the
    lock-step descent, and with sklearn to f32 rounding."""
    from tpumcia.models.forest_device import _forest_proba, _forest_proba_gemm

    X, y = blobs
    head = fit_head(X, y, config=HeadConfig(kind="random_forest", n_estimators=20))
    dev = head.to_device()
    assert dev.gemm is not None  # compact forest -> GEMM path active
    Xs = dev._prep(X)
    p_lock = np.asarray(
        _forest_proba(Xs, dev.feature, dev.threshold, dev.left, dev.right,
                      dev.leaf_proba, depth=dev.depth)
    )
    p_gemm = np.asarray(_forest_proba_gemm(Xs, *dev.gemm))
    np.testing.assert_array_equal(p_gemm, p_lock)
    np.testing.assert_allclose(
        p_gemm, head.predict_proba(X), atol=1e-6
    )


def test_rf_seeded_deterministic(blobs):
    X, y = blobs
    cfg = HeadConfig(kind="random_forest", n_estimators=10, seed=3)
    h1 = fit_head(X, y, config=cfg)
    h2 = fit_head(X, y, config=cfg)
    np.testing.assert_array_equal(h1.mdi_importance(), h2.mdi_importance())


def test_classification_report_shape(blobs):
    from tpumcia.utils.metrics import classification_report, accuracy

    X, y = blobs
    head = fit_head(X, y, config=HeadConfig(kind="logistic", num_steps=200))
    pred = head.predict(X)
    rep = classification_report(y, pred)
    assert "precision" in rep and "weighted avg" in rep
    assert 0.9 < accuracy(y, pred) <= 1.0


def test_split_modes():
    from tpumcia.utils.split import train_test_split_indices

    y = np.repeat(np.arange(4), 25)
    s = train_test_split_indices(100, test_size=0.25, seed=0)
    assert len(s.test_idx) == 25 and len(s.train_idx) == 75
    assert len(np.intersect1d(s.train_idx, s.test_idx)) == 0

    s2 = train_test_split_indices(100, test_size=0.2, seed=0, stratify=y)
    test_labels = y[s2.test_idx]
    for cls in range(4):
        assert np.sum(test_labels == cls) == 5

    groups = np.repeat(np.arange(10), 10)
    s3 = train_test_split_indices(100, test_size=0.3, seed=1, groups=groups)
    assert len(np.intersect1d(groups[s3.train_idx], groups[s3.test_idx])) == 0

    # determinism
    s4 = train_test_split_indices(100, test_size=0.25, seed=0)
    np.testing.assert_array_equal(s.test_idx, s4.test_idx)

    # a grouped split with one group cannot put a whole group on each side
    with pytest.raises(ValueError, match="distinct groups"):
        train_test_split_indices(100, test_size=0.3, seed=1,
                                 groups=np.zeros(100, dtype=np.int32))


def test_mlp_head_learns_nonlinear():
    """XOR-style labels: linearly inseparable, so the logistic head fails
    where the MLP succeeds."""
    rng = np.random.default_rng(5)
    X = rng.normal(0, 1, size=(600, 2)).astype(np.float32)
    y = ((X[:, 0] > 0) ^ (X[:, 1] > 0)).astype(np.int32)
    mlp = fit_head(
        X, y, config=HeadConfig(kind="mlp", hidden=(32, 32), num_steps=800,
                                learning_rate=0.01)
    )
    logi = fit_head(X, y, config=HeadConfig(kind="logistic", num_steps=800))
    assert mlp.score(X, y) > 0.9
    assert logi.score(X, y) < 0.7


def test_mlp_head_permutation_importance():
    from tpumcia.importance import permutation_importance

    rng = np.random.default_rng(6)
    X = rng.normal(0, 1, size=(300, 6)).astype(np.float32)
    y = (X[:, 2] > 0).astype(np.int32)
    head = fit_head(X, y, config=HeadConfig(kind="mlp", num_steps=400))
    res = permutation_importance(head, X, y, n_repeats=4, seed=0)
    assert res.ranking()[0] == 2


def test_logistic_head_checkpoint(blobs, tmp_path):
    X, y = blobs
    head = fit_head(X, y, config=HeadConfig(kind="logistic", num_steps=200))
    p = tmp_path / "logistic.npz"
    head.save(p)
    restored = LogisticHead.load(p)
    np.testing.assert_array_equal(restored.predict(X), head.predict(X))


def test_rf_head_checkpoint(blobs, tmp_path):
    X, y = blobs
    head = fit_head(X, y, config=HeadConfig(kind="random_forest", n_estimators=10))
    p = tmp_path / "forest.joblib"
    head.save(p)
    restored = RandomForestHead.load(p)
    np.testing.assert_array_equal(restored.predict(X), head.predict(X))
    np.testing.assert_array_equal(
        restored.mdi_importance(), head.mdi_importance()
    )


def test_mlp_head_checkpoint(blobs, tmp_path):
    from tpumcia.models.heads import MLPHead

    X, y = blobs
    head = fit_head(X, y, config=HeadConfig(kind="mlp", num_steps=150, hidden=(16, 8)))
    p = tmp_path / "mlp.npz"
    head.save(p)
    restored = MLPHead.load(p)
    np.testing.assert_array_equal(restored.predict(X), head.predict(X))
    np.testing.assert_allclose(
        np.asarray(restored.predict_proba(X)), np.asarray(head.predict_proba(X))
    )


def test_device_forest_apply_fn_is_partial(blobs):
    """apply_fn must be a tree_util.Partial (stable jit identity)."""
    from jax.tree_util import Partial

    X, y = blobs
    head = fit_head(X, y, config=HeadConfig(kind="random_forest", n_estimators=5))
    dev = head.to_device()
    fn = dev.apply_fn()
    assert isinstance(fn, Partial)
    np.testing.assert_allclose(
        np.asarray(fn(dev._prep(X))), np.asarray(dev.predict_proba(X)),
        atol=1e-6,
    )


def test_threshold_f32_floor_preserves_sklearn_branching():
    """r4 regression: a round-to-nearest f64->f32 threshold cast can land
    ABOVE sklearn's threshold and flip (x <= thr) for samples exactly at
    the split-adjacent training value; the floored cast is branch-exact
    for every f32 input."""
    from tpumcia.models.forest_device import _thr_f32_floor

    b = np.float32(1.0)  # even mantissa: the midpoint tie rounds UP to b
    a = np.nextafter(b, np.float32(0.0))
    thr = (a.astype(np.float64) + b.astype(np.float64)) / 2.0
    # this (a, b) pair makes the plain cast round UP to b
    assert thr.astype(np.float32) == b
    t32 = _thr_f32_floor(np.array([thr]))[0]
    assert t32 <= thr
    # the branch predicate matches f64 for both boundary samples
    assert (a <= t32) == (a.astype(np.float64) <= thr)
    assert (b <= t32) == (b.astype(np.float64) <= thr)
    # -inf padding survives
    assert _thr_f32_floor(np.array([-np.inf]))[0] == -np.inf


def test_occlusion_probes_accept_unseen_test_labels():
    """r4 regression: the occlusion probes crashed with KeyError on test
    labels never seen at training time; the shared sentinel mapping scores
    them as mispredictions instead."""
    from tpumcia.importance.occlusion import channel_occlusion_importance
    from tpumcia.models.train import CNNConfig, fit_cnn

    rng = np.random.RandomState(0)
    imgs = rng.random((8, 16, 16, 2)).astype(np.float32)
    labels = (np.arange(8) % 2).astype(np.int64)
    head = fit_cnn(
        imgs, labels,
        config=CNNConfig(num_classes=2, width=8, epochs=1, batch_size=8),
    )
    y_test = labels.copy()
    y_test[:2] = 9  # unseen class
    occ = channel_occlusion_importance(head, imgs, y_test)
    assert occ.shape == (2,) and np.isfinite(occ).all()


def test_fit_head_guards_label_shape_and_degenerate_classes():
    """Mismatched label length and single-class label sets raise clear
    ValueErrors instead of an opaque jax broadcasting failure / a silently
    trivial classifier."""
    import pytest

    from tpumcia.config import HeadConfig
    from tpumcia.models.heads import fit_head

    rng = np.random.default_rng(0)
    X = rng.random((20, 6)).astype(np.float32)
    with pytest.raises(ValueError, match="labels"):
        fit_head(X, np.zeros(17, int), config=HeadConfig(kind="logistic"))
    with pytest.raises(ValueError, match="2 distinct classes"):
        fit_head(X, np.zeros(20, int), config=HeadConfig(kind="logistic"))
