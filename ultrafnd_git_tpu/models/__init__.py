from ultrafnd_git_tpu.models.classifier import DeepTruthClassifier, NODEEnsemble
from ultrafnd_git_tpu.models.fusion import CrossModalTransformer, ForensicCoAttention
from ultrafnd_git_tpu.models.gnn import (
    GNNModel,
    GNNSimple,
    SimpleGCN,
    normalize_adjacency,
)
from ultrafnd_git_tpu.models.temporal import TemporalSyncNet

__all__ = [
    "CrossModalTransformer",
    "ForensicCoAttention",
    "DeepTruthClassifier",
    "NODEEnsemble",
    "SimpleGCN",
    "GNNModel",
    "GNNSimple",
    "normalize_adjacency",
    "TemporalSyncNet",
]
