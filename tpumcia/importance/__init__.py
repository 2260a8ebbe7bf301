from tpumcia.importance.permutation import (
    permutation_importance,
    PermutationResult,
)
from tpumcia.importance.channels import (
    aggregate_channel_importance,
    channel_importance,
    ChannelImportanceResult,
)
from tpumcia.importance.ablation import channel_ablation_importance

__all__ = [
    "permutation_importance",
    "PermutationResult",
    "aggregate_channel_importance",
    "channel_importance",
    "ChannelImportanceResult",
    "channel_ablation_importance",
]
