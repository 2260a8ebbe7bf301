from tpumcia.models.heads import fit_head, LogisticHead, MLPHead, RandomForestHead
from tpumcia.models.scaler import MinMaxScaler
from tpumcia.models.forest_device import DeviceForest

__all__ = [
    "fit_head",
    "LogisticHead",
    "MLPHead",
    "RandomForestHead",
    "MinMaxScaler",
    "DeviceForest",
]
