"""Classification metrics and report (the reference's
``sklearn.metrics.classification_report`` output, ipynb:414-417)."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class ClassMetrics:
    precision: float
    recall: float
    f1: float
    support: int


def accuracy(y_true, y_pred) -> float:
    return float(np.mean(np.asarray(y_true) == np.asarray(y_pred)))


def per_class_metrics(y_true, y_pred, classes=None) -> dict:
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    if classes is None:
        classes = np.unique(np.concatenate([y_true, y_pred]))
    out = {}
    for c in classes:
        tp = int(np.sum((y_pred == c) & (y_true == c)))
        fp = int(np.sum((y_pred == c) & (y_true != c)))
        fn = int(np.sum((y_pred != c) & (y_true == c)))
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        out[c] = ClassMetrics(prec, rec, f1, int(np.sum(y_true == c)))
    return out


def classification_report(y_true, y_pred, classes=None, target_names=None) -> str:
    """Text report in the sklearn layout the reference prints (ipynb:417)."""
    metrics = per_class_metrics(y_true, y_pred, classes)
    keys = list(metrics.keys())
    if target_names is not None and len(target_names) != len(keys):
        # sklearn raises here too; silently zip-truncating would drop
        # class rows while the averages still covered them
        raise ValueError(
            f"Number of classes ({len(keys)}) does not match size of "
            f"target_names ({len(target_names)})"
        )
    names = target_names if target_names is not None else [str(k) for k in keys]
    width = max([len(str(n)) for n in names] + [12])
    lines = [f"{'':>{width}}  precision    recall  f1-score   support", ""]
    for k, name in zip(keys, names):
        m = metrics[k]
        lines.append(
            f"{name:>{width}}  {m.precision:9.2f} {m.recall:9.2f} "
            f"{m.f1:9.2f} {m.support:9d}"
        )
    n = len(np.asarray(y_true))
    acc = accuracy(y_true, y_pred)
    macro = np.mean([[m.precision, m.recall, m.f1] for m in metrics.values()], axis=0)
    supports = np.array([m.support for m in metrics.values()])
    weights = supports / supports.sum() if supports.sum() else supports
    weighted = np.sum(
        [np.array([m.precision, m.recall, m.f1]) * w
         for m, w in zip(metrics.values(), weights)],
        axis=0,
    )
    lines += [
        "",
        f"{'accuracy':>{width}}  {'':9} {'':9} {acc:9.2f} {n:9d}",
        f"{'macro avg':>{width}}  {macro[0]:9.2f} {macro[1]:9.2f} "
        f"{macro[2]:9.2f} {int(supports.sum()):9d}",
        f"{'weighted avg':>{width}}  {weighted[0]:9.2f} {weighted[1]:9.2f} "
        f"{weighted[2]:9.2f} {int(supports.sum()):9d}",
    ]
    return "\n".join(lines)
