from ultrafnd_git_tpu.training.metrics import (
    aggregate_epoch_metrics,
    compute_classification_metrics,
    compute_cmcs,
    compute_dfdr,
    pretty_print,
)

__all__ = [
    "aggregate_epoch_metrics",
    "compute_classification_metrics",
    "compute_cmcs",
    "compute_dfdr",
    "pretty_print",
]
