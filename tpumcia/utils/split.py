"""Seeded train/test splitting with stratified and grouped modes.

The reference split is unseeded and unstratified
(``train_test_split(..., test_size=0.25)``, ipynb:386). This version is
deterministic and adds the grouped splits the h5 contract's ``donor`` /
``experiment`` keys exist for (README.md:11-12; BASELINE.json config 4):
no group ever straddles the train/test boundary.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class Split(NamedTuple):
    train_idx: np.ndarray
    test_idx: np.ndarray


def train_test_split_indices(
    n: int,
    *,
    test_size: float = 0.25,
    seed: int = 0,
    stratify: np.ndarray | None = None,
    groups: np.ndarray | None = None,
) -> Split:
    """Index split. ``stratify``: labels to keep class proportions.
    ``groups``: group ids (e.g. donor) kept whole; greedily assigned to test
    (shuffled) until ~test_size of samples is reached."""
    if not 0 < test_size < 1:
        raise ValueError("test_size must be in (0, 1)")
    rng = np.random.default_rng(seed)

    if groups is not None:
        groups = np.asarray(groups)
        uniq = rng.permutation(np.unique(groups))
        if len(uniq) < 2:
            raise ValueError(
                "grouped split needs >= 2 distinct groups (one group must "
                f"stay whole on each side); got {len(uniq)}"
            )
        target = test_size * n
        test_groups, count = [], 0
        for g in uniq:
            if count >= target:
                break
            test_groups.append(g)
            count += int((groups == g).sum())
        if count == n:  # don't let test swallow everything
            test_groups = test_groups[:-1]
        test_mask = np.isin(groups, test_groups)
        idx = np.arange(n)
        return Split(idx[~test_mask], idx[test_mask])

    if stratify is not None:
        stratify = np.asarray(stratify)
        train_parts, test_parts = [], []
        for cls in np.unique(stratify):
            cls_idx = rng.permutation(np.flatnonzero(stratify == cls))
            # cap below the class size: a tiny class must keep at least one
            # TRAIN sample, or the head never sees the class at all (the
            # unstratified branch has the same n-1 cap); a 1-sample class
            # goes entirely to train
            n_test = max(1, int(round(test_size * len(cls_idx))))
            n_test = min(n_test, len(cls_idx) - 1)
            test_parts.append(cls_idx[:n_test])
            train_parts.append(cls_idx[n_test:])
        return Split(
            np.sort(np.concatenate(train_parts)),
            np.sort(np.concatenate(test_parts)),
        )

    idx = rng.permutation(n)
    n_test = int(round(test_size * n))
    n_test = min(max(n_test, 1), n - 1)
    return Split(np.sort(idx[n_test:]), np.sort(idx[:n_test]))
