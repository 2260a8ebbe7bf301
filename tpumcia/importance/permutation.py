"""Batched on-device permutation feature importance.

The reference calls ``sklearn.inspection.permutation_importance`` with
``n_repeats=10, random_state=42, n_jobs=-1`` — a joblib *process pool* that
shuffles one column at a time and re-predicts on host (ipynb:495-496,
SURVEY.md §3.4). Here the whole (feature x repeat) sweep is one jitted device
computation: a ``lax.map`` over features of a vmap over repeats, where each
instance rebuilds the permuted matrix with a one-hot column blend (no
(F, R, N, F) materialisation).

Semantics match sklearn: ``importance[j, r] = baseline_score -
score(X with column j shuffled by permutation r)``; scores are mean accuracy.
Randomness is explicit (`seed` -> jax PRNG), so results are reproducible —
rankings (not values) are the cross-implementation contract with the
reference (SURVEY.md §7).

``permutation_importance_host`` wraps sklearn's own implementation for
host-only heads / compat checks.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class PermutationResult:
    importances: np.ndarray  # (F, R) score drops
    importances_mean: np.ndarray  # (F,)
    importances_std: np.ndarray  # (F,)
    baseline_score: float

    def ranking(self) -> np.ndarray:
        """Feature indices sorted by mean importance, descending."""
        return np.argsort(self.importances_mean)[::-1]


def _device_score_parts(head):
    """(apply_fn, X_transform, class_count) for device-capable heads."""
    from tpumcia.models.forest_device import DeviceForest
    from tpumcia.models.heads import LogisticHead, RandomForestHead, logistic_predict_logits

    if isinstance(head, RandomForestHead):
        head = head.to_device()
    if isinstance(head, LogisticHead):
        params, scaler = head.params, head.scaler

        def apply_fn(X):
            Xs = scaler.transform(X) if scaler is not None else X
            return logistic_predict_logits(params, Xs)

        return apply_fn, head.classes
    if isinstance(head, DeviceForest):
        forest_fn, scaler = head.apply_fn(), head.scaler

        def apply_fn(X):
            Xs = scaler.transform(X) if scaler is not None else X
            return forest_fn(Xs)

        return apply_fn, head.classes
    raise TypeError(
        f"head {type(head).__name__} has no device scoring path; use "
        "permutation_importance_host"
    )


@functools.partial(jax.jit, static_argnames=("apply_fn", "n_repeats"))
def _perm_sweep(X, y_idx, masks, key, *, apply_fn, n_repeats):
    """masks: (G, F) 0/1 — columns permuted *jointly* (with one permutation)
    per group. Per-feature importance is the identity-mask special case."""
    N, F = X.shape
    G = masks.shape[0]

    def accuracy(Xp):
        pred = jnp.argmax(apply_fn(Xp), axis=-1)
        return jnp.mean((pred == y_idx).astype(jnp.float32))

    baseline = accuracy(X)
    keys = jax.random.split(key, G * n_repeats).reshape(G, n_repeats)

    def one_group(args):
        mask, keys_g = args  # (F,), (R,)

        def one_repeat(k):
            perm = jax.random.permutation(k, N)
            X_perm = X * (1 - mask) + jnp.take(X, perm, axis=0) * mask
            return accuracy(X_perm)

        return jax.vmap(one_repeat)(keys_g)

    drops = jax.lax.map(one_group, (masks, keys))  # (G, R) scores
    return baseline, baseline - drops


def _run_sweep(head, X, y, masks, *, n_repeats, seed):
    apply_fn, classes = _device_score_parts(head)
    y = np.asarray(y)
    class_to_idx = {c: i for i, c in enumerate(classes)}
    y_idx = jnp.asarray(np.array([class_to_idx[v] for v in y], dtype=np.int32))
    X = jnp.asarray(X, jnp.float32)
    baseline, importances = _perm_sweep(
        X,
        y_idx,
        jnp.asarray(masks, jnp.float32),
        jax.random.key(seed),
        apply_fn=apply_fn,
        n_repeats=n_repeats,
    )
    imp = np.asarray(importances, dtype=np.float64)
    return PermutationResult(
        importances=imp,
        importances_mean=imp.mean(axis=1),
        importances_std=imp.std(axis=1),
        baseline_score=float(baseline),
    )


def permutation_importance(
    head,
    X,
    y,
    *,
    n_repeats: int = 10,
    seed: int = 42,
    groups: list[list[int]] | None = None,
) -> PermutationResult:
    """sklearn-shaped permutation importance, computed on device.

    Defaults mirror the reference call (n_repeats=10, random_state=42,
    ipynb:495-496). With ``groups`` (lists of column indices), each group's
    columns are shuffled *jointly* — the channel-level variant that stays
    informative when features within a channel are redundant (permuting one
    of many correlated columns shows no score drop; permuting the whole
    channel does).
    """
    X = np.asarray(X)
    F = X.shape[1]
    if groups is None:
        masks = np.eye(F, dtype=np.float32)
    else:
        masks = np.zeros((len(groups), F), np.float32)
        for g, cols in enumerate(groups):
            masks[g, cols] = 1.0
    return _run_sweep(head, X, y, masks, n_repeats=n_repeats, seed=seed)


def permutation_importance_host(
    head,
    X,
    y,
    *,
    n_repeats: int = 10,
    seed: int = 42,
) -> PermutationResult:
    """sklearn's own implementation (host, joblib) — compat path for
    host-only heads and cross-checking the device sweep."""
    from sklearn.inspection import permutation_importance as sk_perm

    X = np.asarray(X)
    y = np.asarray(y)

    class _Wrapper:
        def __init__(self, head):
            self._head = head
            self.classes_ = getattr(head, "classes", None)

        def fit(self, *a, **k):  # pragma: no cover - never called
            return self

        def predict(self, X):
            return self._head.predict(X)

        def score(self, X, y):
            return self._head.score(X, y)

    res = sk_perm(
        _Wrapper(head), X, y, n_repeats=n_repeats, random_state=seed, n_jobs=-1
    )
    return PermutationResult(
        importances=np.asarray(res.importances),
        importances_mean=np.asarray(res.importances_mean),
        importances_std=np.asarray(res.importances_std),
        baseline_score=float(head.score(X, y)),
    )
