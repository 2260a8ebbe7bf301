from tpumcia.features.extract import extract_features, FeatureMatrix
from tpumcia.features.registry import feature_names, num_features

__all__ = ["extract_features", "FeatureMatrix", "feature_names", "num_features"]
