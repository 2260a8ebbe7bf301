"""The reference notebook's workflow, end to end.

Mirrors `channel_importance_hand_crafted_features.ipynb` cell-for-cell on the
synthetic MedNIST stand-in: sample grid -> noise-channel synthesis -> 69
features -> split/scale -> RandomForest -> classification report -> MDI
feature/channel importance -> permutation importance, saving the notebook's
three figures.

    python examples/notebook_workflow.py [out_dir]
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # repo root

import sys
from pathlib import Path

import jax
import numpy as np

from tpumcia.config import FeatureConfig, HeadConfig, ImportanceConfig
from tpumcia.features.extract import FeatureMatrix, extract_features
from tpumcia.importance.channels import channel_importance
from tpumcia.io.synthetic import synthetic_mednist
from tpumcia.models.heads import fit_head
from tpumcia.preprocess.synth import add_noise_channels
from tpumcia.reports import plots
from tpumcia.utils.metrics import classification_report
from tpumcia.utils.split import train_test_split_indices


def main(out_dir="examples_out"):
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    # cells 5-7: dataset + sample grid
    gray, labels, class_names = synthetic_mednist(200, seed=0)
    plots.plot_sample_grid(gray, labels, class_names).savefig(out / "samples.png")

    # cell 9: synthesized noise channels (seeded here, unlike the reference)
    images = np.asarray(add_noise_channels(gray, jax.random.key(0)))

    # cells 13-17: 23 features x 3 channels, batched on device
    fm = extract_features(images, config=FeatureConfig())
    print(f"feature matrix: {fm.shape}")

    # cells 19-21: split / scale / RandomForest / report
    X = np.nan_to_num(np.asarray(fm.values, np.float32))
    split = train_test_split_indices(len(X), test_size=0.25, seed=0,
                                     stratify=labels)
    head = fit_head(X[split.train_idx], labels[split.train_idx],
                    config=HeadConfig(kind="random_forest"))
    pred = head.predict(X[split.test_idx])
    print(classification_report(labels[split.test_idx], pred,
                                target_names=class_names))

    fm_test = FeatureMatrix(values=X[split.test_idx], names=fm.names,
                            num_channels=3)

    # cells 23-26: MDI feature importance + channel aggregation
    mdi = channel_importance(head, fm_test, method="mdi")
    plots.plot_top_features(mdi.feature_importances, fm.names).savefig(
        out / "top_features_mdi.png")
    plots.plot_channel_importance(mdi).savefig(out / "channel_mdi.png")
    print(mdi.summary())

    # cell 28: permutation importance on the test set (device sweep)
    perm = channel_importance(
        head, fm_test, labels[split.test_idx], method="permutation_features",
        config=ImportanceConfig(n_repeats=10, seed=42),
    )
    plots.plot_permutation_importance(
        perm.extras["permutation"], fm.names).savefig(out / "permutation.png")
    print(perm.summary())
    print(f"figures in {out}/")


if __name__ == "__main__":
    main(*sys.argv[1:])
