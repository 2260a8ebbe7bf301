"""Real-hardware coverage of the non-kernel device paths (VERDICT r4 #4).

Before round 5 only the kernel-parity tests carried ``-m tpu``; a Mosaic/XLA
regression in the CNN train/occlusion path, the batched extraction API, the
streaming wire mode, the GEMM forest sweep, or the multi-offset wire would
land silently. Each test here is bounded to seconds once the compilation
cache is warm (``enable_compilation_cache`` first, like the bench).

Run: ``TPUMCIA_TEST_BACKEND=native python -m pytest tests/ -m tpu``
(or ``make test-tpu``, which waits tunnel outages out first).
"""

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _warm_cache():
    from tpumcia.utils.cache import enable_compilation_cache

    enable_compilation_cache()


@pytest.fixture
def batch96(rng):
    # one shape shared by every test in this file: fresh Mosaic compiles
    # through the remote-compile tunnel cost minutes per new batch shape
    img = (rng.random((96, 64, 64, 3)) * 256).astype(np.uint8)
    img[:, :, :, 0] = (img[:, :, :, 0] // 2) + (
        np.arange(96, dtype=np.uint8)[:, None, None] % 2
    ) * 100  # channel 0 carries a class signal
    labels = np.array(["a", "b"] * 48)
    return img, labels


@pytest.mark.tpu
def test_batched_extraction_matches_one_shot_on_tpu(batch96):
    """extract_features_batched over >= 2 fused per-batch dispatches must be
    bit-identical to the one-shot call (stats are per-image, so the batch
    split cannot change any reduction order)."""
    from tpumcia.features.extract import (
        extract_features,
        extract_features_batched,
    )

    img, _ = batch96
    one = extract_features(img)
    batched = extract_features_batched(
        img, batch_size=48, keep_device_values=True
    )
    assert batched.shape == one.shape
    np.testing.assert_array_equal(
        np.asarray(batched.values), np.asarray(one.values)
    )
    np.testing.assert_array_equal(
        np.asarray(batched.degenerate), np.asarray(one.degenerate)
    )
    dv = np.asarray(batched.device_values)
    assert dv.shape == one.shape and np.isfinite(dv).all()


@pytest.mark.tpu
def test_streaming_wire_mode_and_resume_on_tpu(tmp_path, batch96):
    """The streaming wire mode (fused dispatch + deferred wire fetch per
    shard, wrap-padded shard shapes) on hardware, plus a resume pass."""
    from tpumcia.pipeline.streaming import stream_extract

    img, labels = batch96

    def fetch(idx):
        return img[idx], None, labels[idx]

    out = tmp_path / "shards"
    res = stream_extract(fetch, len(img), out, shard_size=48)
    assert res.shards_computed == 2
    assert res.features.shape[0] == 96
    assert np.isfinite(np.nan_to_num(res.features.to_numpy())).all()

    res2 = stream_extract(fetch, len(img), out, shard_size=48)
    assert res2.shards_computed == 0 and res2.shards_skipped == 2
    np.testing.assert_array_equal(
        np.asarray(res2.features.values), np.asarray(res.features.values)
    )


@pytest.mark.tpu
def test_multi_offset_one_fetch_wire_on_tpu(batch96):
    """The round-5 multi-offset u32 wire (one fetch for the whole offset
    list) against the exact backend on hardware."""
    from tpumcia.config import FeatureConfig, GLCMConfig
    from tpumcia.features.extract import extract_features

    img, _ = batch96
    glcm = GLCMConfig(distance=(1, 5), angle=(0.0, np.pi / 2))
    fm = extract_features(img, config=FeatureConfig(glcm=glcm))
    assert fm.shape == (96, 3 * (17 + 6 * 4))
    exact = extract_features(
        img, config=FeatureConfig(glcm=glcm, precision="exact")
    )
    ve, vw = np.asarray(exact.values), np.asarray(fm.values)
    assert (np.isnan(ve) == np.isnan(vw)).all()
    err = np.abs(np.nan_to_num(ve) - np.nan_to_num(vw))
    # hybrid-vs-exact on hardware: the f32 homogeneity/correlation sums
    # reduce in MXU order, slightly looser than the CPU golden bound
    # (observed max 1.8e-5); the mean must stay at the golden contract
    assert err.max() < 5e-5
    assert err.mean() < 1e-6


@pytest.mark.tpu
def test_cnn_train_and_occlusion_on_tpu(batch96):
    """One tiny CNN fit (width 16, 2 epochs) + the occlusion sweep on the
    real chip — the bf16 conv/GroupNorm train path and the vectorised
    occlusion jit never executed on hardware under -m tpu before r5."""
    import jax

    from tpumcia.importance.occlusion import channel_occlusion_importance
    from tpumcia.models.train import CNNConfig, fit_cnn

    img, labels = batch96
    x = jax.device_put((img / 255.0).astype(np.float32))
    head = fit_cnn(
        x, labels,
        config=CNNConfig(
            num_classes=2, width=16, depth="10", epochs=8, batch_size=32,
        ),
    )
    assert len(head.history) == 8
    assert head.history[-1]["loss"] < head.history[0]["loss"]
    assert head.score(x, labels) > 0.8  # learnable signal in channel 0
    occ = np.asarray(channel_occlusion_importance(head, x, labels))
    assert occ.shape == (3,)
    assert np.isfinite(occ).all()
    assert int(np.argmax(occ)) == 0  # zeroing the signal channel hurts most


@pytest.mark.tpu
def test_gemm_forest_permutation_sweep_on_tpu(batch96):
    """RF head scored through the GEMM forest (path-matrix matmul leaf
    selection) driving the one-jit permutation sweep on hardware."""
    from tpumcia.config import HeadConfig, ImportanceConfig
    from tpumcia.features.extract import extract_features
    from tpumcia.importance.channels import channel_importance
    from tpumcia.models.heads import fit_head

    img, labels = batch96
    fm = extract_features(img)
    X = np.nan_to_num(np.asarray(fm.values, np.float32))
    head = fit_head(
        X, labels, config=HeadConfig(kind="random_forest", n_estimators=20)
    )
    res = channel_importance(
        head, fm, labels, method="permutation",
        config=ImportanceConfig(n_repeats=3),
        eval_features=X, eval_labels=labels,
    )
    total = np.asarray(res.total)
    assert total.shape == (3,) and np.isfinite(total).all()
    assert int(np.argmax(total)) == 0
