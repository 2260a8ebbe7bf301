"""Learned-feature path: ResNet-style CNN on multichannel images, with
channel occlusion/permutation importance and a spatial occlusion map
(BASELINE config 3).

    python examples/cnn_workflow.py
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # repo root

import numpy as np

from tpumcia.io.synthetic import synthetic_multichannel
from tpumcia.models.train import CNNConfig
from tpumcia.pipeline.run_cnn import run_cnn_pipeline


def main():
    images, labels, class_names = synthetic_multichannel(60, num_classes=4,
                                                         hw=32, seed=1)
    cfg = CNNConfig(num_classes=4, width=16, depth="10", epochs=8,
                    batch_size=32, learning_rate=2e-3)
    res = run_cnn_pipeline(images, labels, config=cfg, n_repeats=3)
    print(res.report)
    print(res.summary())

    # spatial saliency for a few test images
    from tpumcia.importance.occlusion import occlusion_map

    x = images[res.test_idx[:4]].astype(np.float32) / 255.0
    maps = occlusion_map(res.head, x, labels[res.test_idx[:4]], window=8,
                         stride=8)
    print("occlusion maps:", maps.shape,
          "peak drop:", float(maps.max()))


if __name__ == "__main__":
    main()
