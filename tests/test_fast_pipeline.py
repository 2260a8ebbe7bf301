"""The fused fast path (device-resident features + one-dispatch head/sweeps)
must agree with the classic pipeline — the round-2 verdict's "the public API
is the fast path" requirement."""

import numpy as np
import pytest

from tpumcia.config import (
    FeatureConfig,
    HeadConfig,
    ImportanceConfig,
    PipelineConfig,
    SplitConfig,
    SynthConfig,
)


@pytest.fixture(scope="module")
def workload():
    from tpumcia.io.synthetic import synthetic_mednist

    gray, labels, _ = synthetic_mednist(30, num_classes=6, seed=3)
    return gray, labels


def _cfg(fast, **kw):
    return PipelineConfig(
        synth=SynthConfig(noise_channels=2, seed=0),
        head=HeadConfig(kind="logistic", num_steps=60),
        split=SplitConfig(test_size=0.25, seed=0, stratify=True),
        fast_path=fast,
        batch_size=64,
        **kw,
    )


def test_fast_path_matches_classic(workload):
    from tpumcia.pipeline.run import run_pipeline

    gray, labels = workload
    fast = run_pipeline(gray, labels, config=_cfg("always"))
    classic = run_pipeline(gray, labels, config=_cfg("never"))

    # feature values are exact on both paths (same hybrid wire math)
    np.testing.assert_allclose(
        np.asarray(fast.features.values),
        np.asarray(classic.features.values),
        rtol=1e-12, atol=1e-12,
    )
    assert fast.features.names == classic.features.names
    # head/sweeps ride device f32 features on the fast path vs host-f64->f32
    # on the classic one — rankings and accuracy must agree
    assert list(fast.channel_result.ranking) == list(
        classic.channel_result.ranking
    )
    assert fast.channel_result.ranking[0] == 0
    assert abs(fast.test_accuracy - classic.test_accuracy) < 0.06
    assert fast.feature_result is not None
    assert fast.channel_result.extras["permutation"].importances.shape[1] == 10


def test_fast_path_sweep_matches_unfused_on_same_head(workload):
    """The fused sweep must reproduce the standalone permutation sweep
    bit-for-bit given the same head, features, and seed (same PRNG stream)."""
    from tpumcia.importance.permutation import permutation_importance
    from tpumcia.pipeline.run import run_pipeline

    gray, labels = workload
    res = run_pipeline(gray, labels, config=_cfg("always"))
    X = np.nan_to_num(np.asarray(res.features.values, np.float32))
    y_te = np.asarray(labels)[res.test_idx]
    groups = res.features.channel_columns()
    unfused = permutation_importance(
        res.head, X[res.test_idx], y_te, n_repeats=10, seed=42, groups=groups
    )
    fused = res.channel_result.extras["permutation"]
    np.testing.assert_allclose(
        fused.importances, unfused.importances, atol=1e-6
    )


def test_keep_device_values(workload):
    import jax

    from tpumcia.features.extract import extract_features_batched
    from tpumcia.preprocess.synth import add_noise_channels

    gray, labels = workload
    imgs = np.asarray(add_noise_channels(gray[:96], jax.random.key(0)))
    fm = extract_features_batched(
        imgs, batch_size=40, keep_device_values=True
    )
    assert fm.device_values is not None
    assert isinstance(fm.device_values, jax.Array)
    assert fm.device_values.shape == fm.values.shape
    np.testing.assert_allclose(
        np.asarray(fm.device_values),
        np.nan_to_num(np.asarray(fm.values, np.float32)),
        rtol=2e-4, atol=1e-3,
    )


def test_pending_matches_direct(workload):
    import jax

    from tpumcia.features.extract import (
        extract_features,
        extract_features_pending,
    )
    from tpumcia.preprocess.synth import add_noise_channels

    gray, labels = workload
    imgs = np.asarray(add_noise_channels(gray[:50], jax.random.key(1)))
    pend = extract_features_pending(imgs, batch_size=24).result()
    direct = extract_features(imgs, config=FeatureConfig())
    # integer-exact wire fields are bit-equal; the f32-summed fields
    # (moments, entropy, homogeneity) vary ~1e-6 with batch shape/fusion
    np.testing.assert_allclose(
        np.asarray(pend.values), np.asarray(direct.values),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(pend.degenerate), np.asarray(direct.degenerate)
    )


def test_synth_classic_path(workload):
    """synth config on the classic (non-fast) path synthesizes up front."""
    from tpumcia.pipeline.run import run_pipeline

    gray, labels = workload
    res = run_pipeline(gray[:60], labels[:60], config=_cfg("never"))
    assert res.features.num_channels == 3
    assert res.channel_result.ranking[0] == 0


def test_fused_fit_importance_channel_names():
    """Custom channel names flow through the fused results."""
    import jax

    from tpumcia.models.fused import fit_logistic_with_importance

    rng = np.random.default_rng(0)
    N, F = 120, 6
    X = rng.random((N, F)).astype(np.float32)
    y = (X[:, 0] > 0.5).astype(np.int64)
    X[:, 0] += y  # make column 0 informative
    names = [f"f{i}_Ch{1 + i // 3}" for i in range(F)]
    res = fit_logistic_with_importance(
        jax.numpy.asarray(X), y,
        train_idx=np.arange(0, 90), test_idx=np.arange(90, N),
        groups=[[0, 1, 2], [3, 4, 5]], names=names,
        head_config=HeadConfig(kind="logistic", num_steps=80),
        importance_config=ImportanceConfig(n_repeats=4),
        channel_names=["alpha", "beta"],
    )
    assert res.channel_result.channel_names == ["alpha", "beta"]
    assert res.channel_result.top_channel() == 0
    assert res.head.score(X[90:], y[90:]) >= 0.7
    assert len(res.y_pred) == N - 90


def test_fast_path_with_mask(workload):
    """Masked inputs ride the fused fast path (no synth) and agree with the
    classic pipeline."""
    import jax

    from tpumcia.pipeline.run import run_pipeline
    from tpumcia.preprocess.synth import add_noise_channels

    gray, labels = workload
    imgs = np.asarray(add_noise_channels(gray[:120], jax.random.key(2)))
    rng = np.random.default_rng(7)
    mask = rng.random(imgs.shape) > 0.25

    def cfg(fast):
        return PipelineConfig(
            head=HeadConfig(kind="logistic", num_steps=60),
            split=SplitConfig(test_size=0.25, seed=0, stratify=True),
            fast_path=fast,
            batch_size=48,
        )

    fast = run_pipeline(imgs, labels[:120], mask=mask, config=cfg("always"))
    classic = run_pipeline(imgs, labels[:120], mask=mask, config=cfg("never"))
    np.testing.assert_allclose(
        np.asarray(fast.features.values),
        np.asarray(classic.features.values),
        rtol=1e-4, atol=1e-5,
    )
    assert list(fast.channel_result.ranking) == list(
        classic.channel_result.ranking
    )
    assert fast.channel_result.ranking[0] == 0
