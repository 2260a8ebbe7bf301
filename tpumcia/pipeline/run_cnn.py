"""End-to-end CNN pipeline (BASELINE.json config 3): train the
ResNet-style classifier on multichannel images and derive channel importance
by occlusion and pixel-space permutation — the learned-feature counterpart of
``pipeline/run.py``."""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

from tpumcia.importance.channels import ChannelImportanceResult
from tpumcia.importance.occlusion import (
    channel_occlusion_importance,
    channel_permutation_importance_images,
)
from tpumcia.models.train import CNNConfig, CNNHead, fit_cnn
from tpumcia.utils.metrics import accuracy, classification_report
from tpumcia.utils.split import train_test_split_indices


@dataclass
class CNNPipelineResult:
    head: CNNHead
    test_accuracy: float
    report: str
    occlusion: ChannelImportanceResult
    permutation: ChannelImportanceResult
    train_idx: np.ndarray
    test_idx: np.ndarray
    timings: dict = field(default_factory=dict)

    def summary(self) -> str:
        return "\n".join(
            [
                f"test accuracy: {self.test_accuracy:.4f}",
                self.occlusion.summary(),
                self.permutation.summary(),
            ]
        )


def _to_channel_result(drops: np.ndarray, method: str) -> ChannelImportanceResult:
    drops = np.atleast_2d(drops.T).T  # (C, R?)
    mean = drops.mean(axis=1)
    return ChannelImportanceResult(
        per_channel=[drops[c] for c in range(len(drops))],
        mean=mean,
        total=mean,
        ranking=np.argsort(mean)[::-1],
        feature_importances=np.zeros(0),
        feature_names=[],
        method=method,
    )


def run_cnn_pipeline(
    images,
    labels,
    *,
    config: CNNConfig | None = None,
    mesh=None,
    test_size: float = 0.25,
    split_seed: int = 0,
    n_repeats: int = 5,
    importance_seed: int = 42,
    groups: np.ndarray | None = None,
    verbose: bool = False,
) -> CNNPipelineResult:
    """images: (B, H, W, C) uint8 levels or float in [0, 1]."""
    images = np.asarray(images)
    if images.dtype.kind in "ui":
        images = images.astype(np.float32) / float(np.iinfo(images.dtype).max)
    labels = np.asarray(labels)

    split = train_test_split_indices(
        len(images), test_size=test_size, seed=split_seed,
        stratify=labels if groups is None else None, groups=groups,
    )
    timings = {}
    t0 = time.perf_counter()
    classes = np.unique(labels)
    cfg = config or CNNConfig(num_classes=len(classes))
    head = fit_cnn(
        images[split.train_idx], labels[split.train_idx], config=cfg, mesh=mesh,
        verbose=verbose,
    )
    timings["fit_s"] = time.perf_counter() - t0

    x_test, y_test = images[split.test_idx], labels[split.test_idx]
    pred = head.predict(x_test)
    test_acc = accuracy(y_test, pred)
    report = classification_report(y_test, pred)

    t0 = time.perf_counter()
    occ = channel_occlusion_importance(head, x_test, y_test)
    perm = channel_permutation_importance_images(
        head, x_test, y_test, n_repeats=n_repeats, seed=importance_seed
    )
    timings["importance_s"] = time.perf_counter() - t0

    return CNNPipelineResult(
        head=head,
        test_accuracy=test_acc,
        report=report,
        occlusion=_to_channel_result(occ[:, None], "occlusion"),
        permutation=_to_channel_result(perm, "image_permutation"),
        train_idx=split.train_idx,
        test_idx=split.test_idx,
        timings=timings,
    )
