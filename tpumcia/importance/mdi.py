"""Mean-decrease-in-impurity (MDI) feature importance.

The reference reads ``model.feature_importances_`` from its RandomForest
(ipynb:434) — normalised impurity decreases accumulated during tree
building. Tree building stays on host (SURVEY.md §7 "hard parts"), so MDI is
read from the fitted sklearn forest; aggregation to channels lives in
``importance/channels.py``.
"""

from __future__ import annotations

import numpy as np


def mdi_importance(head) -> np.ndarray:
    """(F,) normalised MDI importances of a RandomForestHead."""
    from tpumcia.models.heads import RandomForestHead

    if not isinstance(head, RandomForestHead):
        raise TypeError(
            f"MDI is defined for forests; {type(head).__name__} has no "
            "impurity decreases (use permutation or coefficient importance)"
        )
    return head.mdi_importance()


def mdi_channel_importance(head, features, *, threshold: float = 0.01,
                           match: str = "exact"):
    """Notebook cells 23+25 in one call: MDI -> per-channel aggregation.

    Exact matching groups by the matrix's positional column layout, so
    custom h5 channel names (no ``_Ch{i}`` suffix) group correctly and the
    result carries the channel names for plots/summaries."""
    from tpumcia.importance.channels import aggregate_channel_importance

    out = aggregate_channel_importance(
        mdi_importance(head),
        features.names,
        features.num_channels,
        threshold=threshold,
        match=match,
        method="mdi",
        groups=features.channel_columns() if match == "exact" else None,
    )
    out.channel_names = getattr(features, "channel_names", None)
    return out
