from tpumcia.preprocess.synth import add_noise_channels
from tpumcia.preprocess.normalize import (
    quantize_to_levels,
    normalize_uint16,
    percentile_normalize,
    apply_mask,
    center_crop_or_pad,
)

__all__ = [
    "add_noise_channels",
    "quantize_to_levels",
    "normalize_uint16",
    "percentile_normalize",
    "apply_mask",
    "center_crop_or_pad",
]
