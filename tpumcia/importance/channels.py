"""Channel-importance aggregation and the high-level channel_importance API.

The reference aggregates per-feature MDI importances into channels by *name
substring* ("Ch1" in name) with a 0.01 floor (ipynb:458-462) — which both
breaks at >= 10 channels ("Ch1" matches "Ch10") and silently drops features.
The default here groups by the parsed channel index
(``registry.columns_by_channel``); ``match='substring'`` replicates the
reference behaviour for compat.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import numpy as np

from tpumcia.config import ImportanceConfig
from tpumcia.features import registry
from tpumcia.features.extract import FeatureMatrix


@dataclass
class ChannelImportanceResult:
    per_channel: list[np.ndarray]  # filtered importance values per channel
    mean: np.ndarray  # (C,) mean of filtered values (0 if none)
    total: np.ndarray  # (C,) sum of filtered values
    ranking: np.ndarray  # channel indices sorted by total, descending
    feature_importances: np.ndarray  # (F,) the per-feature values aggregated
    feature_names: list[str]
    method: str = "mdi"
    channel_names: list[str] | None = None  # display names (h5 contract)
    extras: dict = field(default_factory=dict)

    @property
    def num_channels(self) -> int:
        return len(self.per_channel)

    def top_channel(self) -> int:
        return int(self.ranking[0])

    def channel_label(self, c: int) -> str:
        if self.channel_names is not None and c < len(self.channel_names):
            return self.channel_names[c]
        return f"Ch{c + 1}"

    def summary(self) -> str:
        lines = [f"channel importance ({self.method}):"]
        for c in self.ranking:
            lines.append(
                f"  {self.channel_label(c)}: total={self.total[c]:.4f} "
                f"mean={self.mean[c]:.4f} n={len(self.per_channel[c])}"
            )
        return "\n".join(lines)


def aggregate_channel_importance(
    importances,
    names: list[str],
    num_channels: int,
    *,
    threshold: float = 0.01,
    match: str = "exact",
    method: str = "mdi",
    groups: list[list[int]] | None = None,
) -> ChannelImportanceResult:
    """Group per-feature importances into per-channel distributions.

    ``threshold`` drops features with importance <= threshold before
    aggregation (reference ipynb:459: ``value > 0.01``).
    ``groups`` (per-channel column index lists) overrides name-based
    matching — required when columns carry custom h5 channel names
    (contract key ``channels``, README.md:13) that no ``_Ch{i}`` parse can
    resolve.
    """
    imp = np.asarray(importances, dtype=np.float64)
    if imp.shape[0] != len(names):
        raise ValueError("importances and names length mismatch")
    if threshold is None:
        threshold = -np.inf  # keep everything (incl. zero/negative drops)

    if groups is not None:
        if len(groups) != num_channels:
            raise ValueError("groups length must equal num_channels")
    elif match == "exact":
        groups = registry.columns_by_channel(list(names), num_channels)
        if all(len(g) == 0 for g in groups):
            # custom channel names carry no _Ch{i} suffix; silently
            # returning zeros would fake a "no channel matters" result
            raise ValueError(
                "no _Ch{i} suffixes found in feature names; pass "
                "groups= (e.g. FeatureMatrix.channel_columns()) for "
                "custom channel names"
            )
    elif match == "substring":
        # reference semantics (ipynb:462): `"Ch{i}" in name`
        groups = [
            [j for j, n in enumerate(names) if f"Ch{c + 1}" in n]
            for c in range(num_channels)
        ]
        if all(len(g) == 0 for g in groups):
            # same guard as the exact branch: custom channel names carry no
            # Ch{i} substring, and silently returning zeros would fake a
            # "no channel matters" result
            raise ValueError(
                "no Ch{i} substrings found in feature names; pass groups= "
                "(e.g. FeatureMatrix.channel_columns()) for custom channel "
                "names"
            )
    else:
        raise ValueError(f"unknown match mode {match!r}")

    per_channel = []
    for cols in groups:
        vals = imp[cols]
        per_channel.append(vals[vals > threshold])
    total = np.array([v.sum() for v in per_channel])
    mean = np.array([v.mean() if len(v) else 0.0 for v in per_channel])
    return ChannelImportanceResult(
        per_channel=per_channel,
        mean=mean,
        total=total,
        ranking=np.argsort(total)[::-1],
        feature_importances=imp,
        feature_names=list(names),
        method=method,
    )


def _sweep(head, X, y, *, n_repeats, seed, groups, mesh):
    """Permutation sweep, sharded over the mesh's data axis when given."""
    if mesh is not None:
        from tpumcia.parallel.sharding import permutation_importance_sharded

        return permutation_importance_sharded(
            head, X, y, mesh=mesh, n_repeats=n_repeats, seed=seed,
            groups=groups,
        )
    from tpumcia.importance.permutation import permutation_importance

    return permutation_importance(
        head, X, y, n_repeats=n_repeats, seed=seed, groups=groups
    )


def channel_importance(
    head,
    features,
    labels=None,
    *,
    method: str = "auto",
    config: ImportanceConfig | None = None,
    eval_features=None,
    eval_labels=None,
    mesh=None,
) -> ChannelImportanceResult:
    """High-level channel importance, mirroring the notebook workflow
    (cells 23-28): derive per-feature importances from the head, then
    aggregate per channel.

    methods:
      * ``'mdi'`` — forest impurity importances (needs a RandomForestHead)
      * ``'coef'`` — |weight| importances of the logistic head
      * ``'permutation'`` — batched device permutation importance with each
        channel's columns shuffled *jointly* (robust to intra-channel
        feature redundancy), on the evaluation set
        (eval_features/eval_labels, else features/labels)
      * ``'permutation_features'`` — reference-style aggregation of
        per-feature permutation importances (ipynb:493-505)
      * ``'ablation'`` — per-channel column ablation score drop
      * ``'auto'`` — mdi for forests, permutation otherwise
    """
    from tpumcia.models.heads import LogisticHead, RandomForestHead

    cfg = config or ImportanceConfig()
    if not isinstance(features, FeatureMatrix):
        raise TypeError("features must be a FeatureMatrix (need column names)")
    names = features.names
    C = features.num_channels

    if method == "auto":
        method = "mdi" if isinstance(head, RandomForestHead) else "permutation"

    ch_names = getattr(features, "channel_names", None)
    # positional layout groups work regardless of custom h5 channel names;
    # used for 'exact' matching (substring compat keeps name-based matching)
    pos_groups = (
        features.channel_columns() if cfg.channel_match == "exact" else None
    )

    if method == "mdi":
        if not isinstance(head, RandomForestHead):
            raise TypeError("mdi requires a RandomForestHead")
        imp = head.mdi_importance()
        out = aggregate_channel_importance(
            imp, names, C, threshold=cfg.mdi_threshold, match=cfg.channel_match,
            method="mdi", groups=pos_groups,
        )
        out.channel_names = ch_names
        return out

    if method == "coef":
        if not isinstance(head, LogisticHead):
            raise TypeError("coef requires a LogisticHead")
        imp = head.coefficient_importance()
        out = aggregate_channel_importance(
            imp, names, C, threshold=cfg.mdi_threshold, match=cfg.channel_match,
            method="coef", groups=pos_groups,
        )
        out.channel_names = ch_names
        return out

    X = (eval_features.values if isinstance(eval_features, FeatureMatrix)
         else eval_features)
    y = eval_labels
    if X is None:
        X, y = features.values, labels
        if features.device_values is not None:
            X = features.device_values  # ride the device-resident copy
    # a device-resident X stays on device through the jitted sweeps
    # (np.asarray here would fetch + re-upload the whole matrix)
    X_arr = X if isinstance(X, jax.Array) else np.asarray(X)
    if y is None:
        raise ValueError(f"method {method!r} needs labels for scoring")

    if method == "permutation":
        groups = features.channel_columns()
        res = _sweep(
            head, X_arr, y, n_repeats=cfg.n_repeats, seed=cfg.seed,
            groups=groups, mesh=mesh,
        )
        per_channel = [res.importances[c] for c in range(C)]
        total = res.importances_mean.copy()
        # a grouped sweep has no per-feature resolution; broadcast each
        # channel's mean drop onto its member columns (documented semantic —
        # use method='permutation_features' for per-column importances)
        feat_imp = np.zeros(len(names))
        for c, cols in enumerate(groups):
            feat_imp[cols] = total[c]
        out = ChannelImportanceResult(
            per_channel=per_channel,
            mean=total,
            total=total,
            ranking=np.argsort(total)[::-1],
            feature_importances=feat_imp,
            feature_names=names,
            method="permutation",
            channel_names=ch_names,
        )
        out.extras["permutation"] = res
        return out

    if method == "permutation_features":
        res = _sweep(
            head, X_arr, y, n_repeats=cfg.n_repeats, seed=cfg.seed,
            groups=None, mesh=mesh,
        )
        out = aggregate_channel_importance(
            res.importances_mean, names, C, threshold=None,
            match=cfg.channel_match, method="permutation_features",
            groups=pos_groups,
        )
        out.channel_names = ch_names
        out.extras["permutation"] = res
        return out

    if method == "ablation":
        from tpumcia.features.finalize import fetch_to_host
        from tpumcia.importance.ablation import channel_ablation_importance

        # ablation scores on HOST (head.score loop): fetch once via the
        # cross-process-safe helper instead of handing it the
        # device-resident copy (np.asarray of a sharded global raises,
        # and the sweep-path device residency buys nothing here)
        drops = channel_ablation_importance(
            head, fetch_to_host(X_arr), y, features.channel_columns(),
        )
        per_channel = [np.array([d]) for d in drops]
        return ChannelImportanceResult(
            per_channel=per_channel,
            mean=drops,
            total=drops,
            ranking=np.argsort(drops)[::-1],
            feature_importances=np.zeros(len(names)),
            feature_names=names,
            method="ablation",
            channel_names=ch_names,
        )

    raise ValueError(f"unknown method {method!r}")
