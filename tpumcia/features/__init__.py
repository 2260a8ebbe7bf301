from tpumcia.features.extract import (
    extract_features,
    extract_features_batched,
    FeatureMatrix,
)
from tpumcia.features.registry import feature_names, num_features
from tpumcia.features.morphology import morphology_features
from tpumcia.features.props import glcm_properties
from tpumcia.features.stats import glcm_matrix

__all__ = [
    "extract_features",
    "extract_features_batched",
    "FeatureMatrix",
    "feature_names",
    "num_features",
    "morphology_features",
    "glcm_properties",
    "glcm_matrix",
]
