"""Device-resident MinMax feature scaling (the reference's sklearn
``MinMaxScaler``, ipynb:389-394: fit on train, transform train and test).

``fit`` reduces per-feature min/max on device; under a sharded feature matrix
the reduction runs per shard and is combined with a global min/max (see
``parallel.sharding.global_minmax`` for the psum'd multi-device variant).
Zero-range features get scale 1, matching sklearn's ``_handle_zeros_in_scale``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class MinMaxScaler:
    data_min: jax.Array  # (F,)
    data_max: jax.Array  # (F,)

    @classmethod
    def fit(cls, X) -> "MinMaxScaler":
        # nanmin/nanmax: sklearn's MinMaxScaler ignores NaNs during fit
        # (a single degenerate NaN feature value would otherwise NaN the
        # whole column's scale for every sample)
        X = jnp.asarray(X)
        return cls(
            data_min=jnp.nanmin(X, axis=0), data_max=jnp.nanmax(X, axis=0)
        )

    @classmethod
    def from_stats(cls, data_min, data_max) -> "MinMaxScaler":
        return cls(jnp.asarray(data_min), jnp.asarray(data_max))

    @property
    def scale(self) -> jax.Array:
        rng = self.data_max - self.data_min
        return jnp.where(rng != 0, 1.0 / jnp.where(rng != 0, rng, 1.0), 1.0)

    def transform(self, X) -> jax.Array:
        return (jnp.asarray(X) - self.data_min) * self.scale

    def inverse_transform(self, X) -> jax.Array:
        rng = self.data_max - self.data_min
        return jnp.asarray(X) * jnp.where(rng != 0, rng, 1.0) + self.data_min

    def to_numpy(self) -> dict[str, np.ndarray]:
        return {
            "data_min": np.asarray(self.data_min),
            "data_max": np.asarray(self.data_max),
        }
