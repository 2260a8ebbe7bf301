"""eval CLI contract: in-process main() over each source type + error paths."""

import json

import numpy as np
import pytest

from tpumcia import eval as eval_cli


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
