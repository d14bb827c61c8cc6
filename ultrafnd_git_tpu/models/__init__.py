from ultrafnd_git_tpu.models.affective import AffectiveForensics
from ultrafnd_git_tpu.models.chronos import ChronosGuard
from ultrafnd_git_tpu.models.classifier import DeepTruthClassifier, NODEEnsemble
from ultrafnd_git_tpu.models.fusion import CrossModalTransformer, ForensicCoAttention
from ultrafnd_git_tpu.models.gnn import (
    GNNModel,
    GNNSimple,
    SimpleGCN,
    normalize_adjacency,
)
from ultrafnd_git_tpu.models.semantic import (
    SemanticConfig,
    SemanticForgeryAnalyzer,
    SemanticProjector,
)
from ultrafnd_git_tpu.models.temporal import TemporalSyncNet

__all__ = [
    "AffectiveForensics",
    "ChronosGuard",
    "SemanticConfig",
    "SemanticForgeryAnalyzer",
    "SemanticProjector",
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
