"""Streaming sharded extraction with resume (BASELINE config 5 in miniature):
manifest-driven shards, atomic outputs, restart skips completed work.

    python examples/streaming_scale.py [work_dir]
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # repo root

import sys
import tempfile
from pathlib import Path

import jax
import numpy as np

from tpumcia.io.synthetic import synthetic_mednist
from tpumcia.pipeline.streaming import stream_extract
from tpumcia.preprocess.synth import add_noise_channels


def main(work_dir=None):
    out = Path(work_dir or tempfile.mkdtemp()) / "features"
    gray, labels, _ = synthetic_mednist(300, seed=0)
    key = jax.random.key(0)

    def fetch(idx):
        # host decode stand-in; synthesis runs on device
        imgs = np.asarray(add_noise_channels(gray[idx], jax.random.fold_in(key, int(idx[0]))))
        return imgs, None, labels[idx]

    res = stream_extract(fetch, len(gray), out, shard_size=256)
    print(f"pass 1: computed={res.shards_computed} skipped={res.shards_skipped} "
          f"rate={res.images_per_second:.0f} img/s features={res.features.shape}")

    res2 = stream_extract(fetch, len(gray), out, shard_size=256)
    print(f"pass 2 (resume): computed={res2.shards_computed} "
          f"skipped={res2.shards_skipped}")
    assert res2.shards_computed == 0

    print(f"manifest + shards + progress.jsonl in {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
