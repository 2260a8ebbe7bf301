"""Device-resident random-forest inference.

Tree *fitting* stays on host (sklearn, Cython — building trees does not map
to the MXU), but a fitted forest compiles into dense arrays so *inference*
runs on TPU: every (sample, tree) pair descends the tree in lock-step inside
one jitted ``fori_loop`` of gathers. This is what lets the permutation
importance sweep over a RandomForest head run as a single batched device
computation instead of the reference's per-feature joblib fan-out
(ipynb:495-496).

Layout: trees padded to the forest's max node count; leaves carry their class
distribution and self-loop (left == right == node), so after ``max_depth``
steps every lane sits on its leaf.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpumcia.models.scaler import MinMaxScaler


def _forest_proba_impl(X, feature, threshold, left, right, leaf_proba, depth):
    """X: (S, F); tree arrays: (T, N); leaf_proba: (T, N, K) -> (S, K).
    ``depth`` may be a traced scalar (dynamic fori bound) — leaves self-loop,
    so any bound >= true depth is correct."""
    S = X.shape[0]
    T = feature.shape[0]

    def descend_tree(feat_t, thr_t, left_t, right_t):
        # one tree, all samples
        def step(_, node):
            f = jnp.take(feat_t, node)  # (S,)
            thr = jnp.take(thr_t, node)
            x = jnp.take_along_axis(X, jnp.clip(f, 0, X.shape[1] - 1)[:, None], axis=1)[
                :, 0
            ]
            go_left = x <= thr
            return jnp.where(
                f < 0, node, jnp.where(go_left, jnp.take(left_t, node), jnp.take(right_t, node))
            )

        return jax.lax.fori_loop(0, depth, step, jnp.zeros((S,), jnp.int32))

    nodes = jax.vmap(descend_tree)(feature, threshold, left, right)  # (T, S)
    probas = jax.vmap(lambda lp, nd: jnp.take(lp, nd, axis=0))(leaf_proba, nodes)
    return jnp.mean(probas, axis=0)  # (S, K)


@functools.partial(jax.jit, static_argnames=("depth",))
def _forest_proba(X, feature, threshold, left, right, leaf_proba, *, depth: int):
    return _forest_proba_impl(X, feature, threshold, left, right, leaf_proba, depth)


@dataclass
class DeviceForest:
    feature: jax.Array  # (T, N) i32, -1 at leaves
    threshold: jax.Array  # (T, N) f32
    left: jax.Array  # (T, N) i32 (self at leaves)
    right: jax.Array  # (T, N) i32
    leaf_proba: jax.Array  # (T, N, K) f32
    depth: int
    classes: np.ndarray
    scaler: MinMaxScaler | None = None

    is_device: bool = True

    @classmethod
    def from_sklearn(cls, model, classes=None, scaler=None) -> "DeviceForest":
        trees = [est.tree_ for est in model.estimators_]
        T = len(trees)
        N = max(t.node_count for t in trees)
        K = model.n_classes_
        feature = np.full((T, N), -1, np.int32)
        threshold = np.zeros((T, N), np.float32)
        left = np.zeros((T, N), np.int32)
        right = np.zeros((T, N), np.int32)
        proba = np.zeros((T, N, K), np.float32)
        depth = 0
        for t, tree in enumerate(trees):
            n = tree.node_count
            f = tree.feature.astype(np.int32)  # -2 at leaves in sklearn
            leaf = f < 0
            feature[t, :n] = np.where(leaf, -1, f)
            threshold[t, :n] = tree.threshold.astype(np.float32)
            idx = np.arange(n, dtype=np.int32)
            left[t, :n] = np.where(leaf, idx, tree.children_left.astype(np.int32))
            right[t, :n] = np.where(leaf, idx, tree.children_right.astype(np.int32))
            vals = tree.value[:, 0, :]  # (n, K); sklearn >=1.4 stores fractions
            sums = vals.sum(axis=1, keepdims=True)
            sums[sums == 0] = 1
            proba[t, :n] = (vals / sums).astype(np.float32)
            depth = max(depth, int(tree.max_depth))
        return cls(
            feature=jnp.asarray(feature),
            threshold=jnp.asarray(threshold),
            left=jnp.asarray(left),
            right=jnp.asarray(right),
            leaf_proba=jnp.asarray(proba),
            depth=depth,
            classes=np.asarray(classes if classes is not None else model.classes_),
            scaler=scaler,
        )

    # -- pure scoring parts (for vmapped importance sweeps) -----------------
    def apply_fn(self):
        """Returns a pure ``f(X_scaled) -> (S, K) proba`` closure over the
        packed arrays (jit/vmap-compatible)."""
        arrs = (self.feature, self.threshold, self.left, self.right, self.leaf_proba)
        depth = self.depth

        def f(X):
            return _forest_proba(X, *arrs, depth=depth)

        return f

    def _prep(self, X):
        X = jnp.asarray(X, jnp.float32)
        return self.scaler.transform(X) if self.scaler is not None else X

    def predict_proba(self, X) -> jax.Array:
        return self.apply_fn()(self._prep(X))

    def predict(self, X) -> np.ndarray:
        idx = np.asarray(jnp.argmax(self.predict_proba(X), axis=-1))
        return self.classes[idx]

    def score(self, X, y) -> float:
        return float(np.mean(self.predict(X) == np.asarray(y)))
