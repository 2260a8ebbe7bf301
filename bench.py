"""Headline benchmark: feature extraction + channel importance throughput.

Replicates the reference's measured workload (BASELINE.md): 12 000 images,
64x64, 3 channels (1 signal + 2 synthesized noise), 23 features x 3 channels,
classifier head, and permutation channel importance — the notebook does this
at 53.46 images/s on one CPU core (ipynb:353). Here the whole pipeline runs
as batched TPU computations (Pallas stats kernel -> f64 host finalize ->
device logistic head -> device permutation sweep).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_IMAGES_PER_SEC = 53.46  # ipynb:353, single CPU core
N_IMAGES = 12_000
BATCH = 2_048


def main() -> None:
    from tpumcia.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import numpy as np

    from tpumcia.config import HeadConfig, ImportanceConfig
    from tpumcia.features import registry
    from tpumcia.features.finalize import finalize_features
    from tpumcia.features.stats import SuffStats, sufficient_stats
    from tpumcia.features.pallas_glcm import sufficient_stats_pallas
    from tpumcia.importance.channels import channel_importance
    from tpumcia.io.synthetic import synthetic_mednist
    from tpumcia.models.heads import fit_head
    from tpumcia.preprocess.synth import add_noise_channels
    from tpumcia.utils.split import train_test_split_indices
    from tpumcia.features.extract import FeatureMatrix

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    stats_fn = sufficient_stats_pallas if on_tpu else sufficient_stats

    # ---- data (host-side synthetic MedNIST stand-in; not timed, mirrors the
    # reference's already-on-disk PNGs) ------------------------------------
    gray, labels, _ = synthetic_mednist(N_IMAGES // 6, num_classes=6, seed=0)
    gray = gray[:N_IMAGES]
    labels = labels[: len(gray)]

    # ---- warm-up/compile on a small slice (excluded, like the reference's
    # excluded import/startup time) ----------------------------------------
    key = jax.random.key(0)

    def features_for(gray_batches):
        """synth -> device stats -> device scalar-reduction ('hybrid'
        finalize) -> tiny D2H fetch -> host f64 scalar assembly. All device
        work is dispatched up front; each batch's fetch overlaps the next
        batches' compute. Every batch has the same shape, so exactly one
        kernel is ever compiled."""
        from tpumcia.features.hybrid import _device_reduce, assemble_reduced

        reduced = []
        for i, g in enumerate(gray_batches):
            imgs = add_noise_channels(g, jax.random.fold_in(key, i))
            reduced.append(_device_reduce(stats_fn(imgs)))
        return np.concatenate(
            [assemble_reduced(r).values for r in reduced]
        )

    # pad to a whole number of fixed-size batches (extraction of the padding
    # rows is real work; the padded rows are dropped before the head)
    n_pad = (-len(gray)) % BATCH
    gray_padded = np.concatenate([gray, gray[:n_pad]]) if n_pad else gray
    gray_dev = jax.device_put(gray_padded)
    batches = [gray_dev[s : s + BATCH] for s in range(0, len(gray_padded), BATCH)]

    names = registry.feature_names(3)

    def full_pipeline():
        X = np.nan_to_num(features_for(batches).astype(np.float32))[: len(gray)]
        split = train_test_split_indices(
            len(X), test_size=0.25, seed=0, stratify=labels
        )
        head = fit_head(
            X[split.train_idx],
            labels[split.train_idx],
            config=HeadConfig(kind="logistic", num_steps=300),
        )
        fm_test = FeatureMatrix(
            values=X[split.test_idx], names=names, num_channels=3
        )
        res = channel_importance(
            head,
            fm_test,
            labels[split.test_idx],
            method="permutation",
            config=ImportanceConfig(n_repeats=10, seed=42),
        )
        feat_res = channel_importance(
            head,
            fm_test,
            labels[split.test_idx],
            method="permutation_features",
            config=ImportanceConfig(n_repeats=10, seed=42),
        )
        return X, split, head, res, feat_res

    full_pipeline()  # warm-up: compiles every stage at the real shapes

    # ---- timed pipeline ---------------------------------------------------
    t0 = time.perf_counter()
    X, split, head, res, feat_res = full_pipeline()
    elapsed = time.perf_counter() - t0

    test_acc = head.score(X[split.test_idx], labels[split.test_idx])
    rate = len(gray) / elapsed
    ok_ranking = bool(res.top_channel() == 0 and feat_res.top_channel() == 0)

    print(
        json.dumps(
            {
                "metric": "feature_extraction_plus_channel_importance_throughput",
                "value": round(rate, 2),
                "unit": "images/sec",
                "vs_baseline": round(rate / BASELINE_IMAGES_PER_SEC, 2),
                "detail": {
                    "backend": backend,
                    "n_images": len(gray),
                    "elapsed_s": round(elapsed, 3),
                    "test_accuracy": round(test_acc, 4),
                    "signal_channel_ranked_first": ok_ranking,
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
