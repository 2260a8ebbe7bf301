"""High-level workflow API mirroring the reference notebook (filled in below
as components land)."""

from __future__ import annotations


def load_objects(*args, **kwargs):
    from tpumcia.io.h5 import load_objects as _impl

    return _impl(*args, **kwargs)


def fit_head(*args, **kwargs):
    from tpumcia.models.heads import fit_head as _impl

    return _impl(*args, **kwargs)


def channel_importance(*args, **kwargs):
    from tpumcia.importance.channels import channel_importance as _impl

    return _impl(*args, **kwargs)


def feature_importance(*args, **kwargs):
    from tpumcia.importance.permutation import permutation_importance as _impl

    return _impl(*args, **kwargs)


def run_pipeline(*args, **kwargs):
    from tpumcia.pipeline.run import run_pipeline as _impl

    return _impl(*args, **kwargs)
