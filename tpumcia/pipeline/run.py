"""End-to-end pipeline runner mirroring the reference notebook workflow:

    load -> (synthesize channels) -> extract features -> split -> scale ->
    fit head -> classification report -> feature + channel importance

(cells 5..28 of the reference, driven by one :class:`PipelineConfig`).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

import numpy as np

from tpumcia.config import PipelineConfig
from tpumcia.features.extract import FeatureMatrix, extract_features
from tpumcia.importance.channels import ChannelImportanceResult, channel_importance
from tpumcia.models.heads import fit_head
from tpumcia.utils.metrics import accuracy, classification_report
from tpumcia.utils.split import train_test_split_indices


@dataclass
class PipelineResult:
    features: FeatureMatrix
    head: Any
    test_accuracy: float
    report: str
    channel_result: ChannelImportanceResult
    feature_result: ChannelImportanceResult | None
    train_idx: np.ndarray
    test_idx: np.ndarray
    timings: dict[str, float] = field(default_factory=dict)

    def summary(self) -> str:
        lines = [
            f"objects: {len(self.features)}  features: {self.features.shape[1]}",
            f"test accuracy: {self.test_accuracy:.4f}",
            self.channel_result.summary(),
        ]
        return "\n".join(lines)


def run_pipeline(
    images,
    labels,
    *,
    mask=None,
    config: PipelineConfig | None = None,
    channel_names: list[str] | None = None,
    groups: np.ndarray | None = None,
) -> PipelineResult:
    """Run the full analysis on a batch of level-quantised images.

    ``groups``: optional per-object group ids (donor/experiment) for grouped
    splitting (h5 contract, BASELINE.json config 4).

    With ``config.mesh`` resolving to more than one device (``data=-1`` uses
    all of them), the extraction, scaler fit, and permutation sweeps run SPMD
    over the mesh's ``data`` axis (SURVEY.md §2.4).
    """
    from tpumcia.parallel.mesh import mesh_from_config

    cfg = config or PipelineConfig()
    labels = np.asarray(labels)
    timings: dict[str, float] = {}
    mesh = mesh_from_config(cfg.mesh)

    t0 = time.perf_counter()
    if mesh is None and len(images) > 4096:
        # large single-device inputs: pipelined fixed-size batches (one
        # compiled shape, concurrent wire fetches) instead of one giant
        # collection-sized dispatch
        from tpumcia.features.extract import extract_features_batched

        fm = extract_features_batched(
            images, mask=mask, config=cfg.features,
            channel_names=channel_names,
        )
    else:
        fm = extract_features(
            images, mask=mask, config=cfg.features,
            channel_names=channel_names, mesh=mesh,
        )
    timings["features_s"] = time.perf_counter() - t0

    X = np.nan_to_num(np.asarray(fm.values, dtype=np.float32))
    split = train_test_split_indices(
        len(X),
        test_size=cfg.split.test_size,
        seed=cfg.split.seed,
        stratify=labels if cfg.split.stratify else None,
        groups=groups if cfg.split.group_by else None,
    )

    t0 = time.perf_counter()
    scaler = None
    if mesh is not None and cfg.normalize == "minmax":
        from tpumcia.parallel.sharding import fit_scaler_sharded

        scaler = fit_scaler_sharded(X[split.train_idx], mesh=mesh)
    head = fit_head(
        X[split.train_idx],
        labels[split.train_idx],
        config=cfg.head,
        scale=cfg.normalize == "minmax",
        scaler=scaler,
    )
    timings["fit_s"] = time.perf_counter() - t0

    pred = head.predict(X[split.test_idx])
    test_acc = accuracy(labels[split.test_idx], pred)
    report = classification_report(labels[split.test_idx], pred)

    fm_test = FeatureMatrix(
        values=X[split.test_idx],
        names=fm.names,
        num_channels=fm.num_channels,
        degenerate=None,
        config=fm.config,
        channel_names=fm.channel_names,
    )

    t0 = time.perf_counter()
    channel_res = channel_importance(
        head,
        fm_test,
        labels[split.test_idx],
        method="permutation",
        config=cfg.importance,
        mesh=mesh,
    )
    # per-feature view (notebook cell 28, ipynb:493-505): MDI for forests,
    # per-feature permutation sweep otherwise (NOT the grouped channel sweep
    # again — that both duplicated compute and rendered all-zero plots)
    from tpumcia.models.heads import RandomForestHead

    feature_method = (
        "mdi" if isinstance(head, RandomForestHead) else "permutation_features"
    )
    feature_res = channel_importance(
        head,
        fm_test,
        labels[split.test_idx],
        method=feature_method,
        config=cfg.importance,
        mesh=mesh,
    )
    timings["importance_s"] = time.perf_counter() - t0

    return PipelineResult(
        features=fm,
        head=head,
        test_accuracy=test_acc,
        report=report,
        channel_result=channel_res,
        feature_result=feature_res,
        train_idx=split.train_idx,
        test_idx=split.test_idx,
        timings=timings,
    )
