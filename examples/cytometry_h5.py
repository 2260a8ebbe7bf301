"""Imaging-flow-cytometry workflow: 12-channel 16-bit h5 objects with masks,
donor-grouped splits, masked intensity/texture/morphology features, and
channel importance (BASELINE config 4).

    python examples/cytometry_h5.py [work_dir]
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # repo root

import sys
import tempfile
from pathlib import Path

import numpy as np

import tpumcia
from tpumcia.config import (
    FeatureConfig,
    HeadConfig,
    ImportanceConfig,
    PipelineConfig,
    SplitConfig,
)
from tpumcia.io.h5 import write_object


def make_dataset(root: Path, n=80, hw=48, channels=12, signal_ch=4, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[:hw, :hw]
    names = [f"marker{c + 1}" for c in range(channels)]
    for i in range(n):
        label = ["activated", "resting"][i % 2]
        img = rng.integers(200, 1500, size=(hw, hw, channels)).astype(np.uint16)
        cy, cx = rng.uniform(hw * 0.35, hw * 0.65, 2)
        r = np.hypot(yy - cy, xx - cx)
        cell = r < rng.uniform(10, 16)
        boost = (np.exp(-r / 8) * 38000) if label == "activated" else (cell * 6000)
        img[:, :, signal_ch] = np.clip(
            img[:, :, signal_ch] + boost.astype(np.uint16), 0, 65535
        )
        write_object(
            root / f"{i:05d}.h5",
            img,
            mask=np.repeat(cell[:, :, None], channels, 2).astype(np.uint8),
            label=label,
            donor=f"donor{i % 8}",
            experiment="run1",
            channels=names,
        )


def main(work_dir=None):
    root = Path(work_dir or tempfile.mkdtemp()) / "objects"
    root.mkdir(parents=True, exist_ok=True)
    make_dataset(root)

    objs = tpumcia.load_objects(root)
    print(f"{len(objs)} objects {objs.images.shape} {objs.images.dtype}, "
          f"channels={objs.channels[:3]}..., donors={sorted(set(objs.donors))}")

    cfg = PipelineConfig(
        features=FeatureConfig(include_morphology=True),
        head=HeadConfig(kind="logistic", num_steps=400),
        importance=ImportanceConfig(n_repeats=5),
        split=SplitConfig(test_size=0.3, group_by="donor"),
    )
    res = tpumcia.analyze_objects(objs, config=cfg)

    train_donors = set(objs.donors[res.train_idx])
    test_donors = set(objs.donors[res.test_idx])
    print(f"donor split: train={sorted(train_donors)} test={sorted(test_donors)}")
    assert not train_donors & test_donors

    print(res.report)
    print(res.channel_result.summary())


if __name__ == "__main__":
    main(*sys.argv[1:])
