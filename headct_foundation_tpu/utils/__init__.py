from headct_foundation_tpu.utils.checkpoint import (
    load_checkpoint,
    restore_state,
    save_checkpoint,
)
from headct_foundation_tpu.utils.metrics import (
    MetricLogger,
    SmoothedValue,
    binary_auroc,
    multiclass_metrics,
)

__all__ = [
    "MetricLogger",
    "SmoothedValue",
    "binary_auroc",
    "load_checkpoint",
    "multiclass_metrics",
    "restore_state",
    "save_checkpoint",
]
