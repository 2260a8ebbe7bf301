from tpumcia.parallel.mesh import make_mesh, data_sharding, replicated
from tpumcia.parallel.distributed import (
    init_distributed,
    shard_across_processes,
    process_summary,
)
from tpumcia.parallel.sharding import (
    extract_features_sharded,
    sufficient_stats_sharded,
    fit_scaler_sharded,
    permutation_importance_sharded,
)

__all__ = [
    "make_mesh",
    "init_distributed",
    "shard_across_processes",
    "process_summary",
    "data_sharding",
    "replicated",
    "extract_features_sharded",
    "sufficient_stats_sharded",
    "fit_scaler_sharded",
    "permutation_importance_sharded",
]
