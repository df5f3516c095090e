"""Training metrics: smoothed meters and downstream classification metrics.

* ``SmoothedValue`` / ``MetricLogger`` mirror the reference utilities
  (reference: src/utils/misc.py:140-284) minus torch: windowed median/avg
  plus global averages. Cross-process sync is unnecessary in SPMD JAX —
  logged losses are already global means over the sharded batch.
* ``binary_auroc`` / ``multiclass_metrics`` replace torchmetrics
  (reference: engine_downstream.py:299-311) with sklearn on host — metrics
  are eval-only and tiny.
"""

from __future__ import annotations

import time
from collections import defaultdict, deque
from typing import Dict, Iterable, Iterator, Optional

import numpy as np
from sklearn.metrics import roc_auc_score


class SmoothedValue:
    def __init__(self, window_size: int = 20, fmt: Optional[str] = None):
        self.deque: deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt or "{median:.4f} ({global_avg:.4f})"

    def update(self, value: float, n: int = 1):
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self) -> float:
        return float(np.median(list(self.deque))) if self.deque else 0.0

    @property
    def avg(self) -> float:
        return float(np.mean(list(self.deque))) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def max(self) -> float:
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self) -> str:
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg,
            max=self.max, value=self.value,
        )


class MetricLogger:
    def __init__(self, delimiter: str = "  ", logger=None):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter
        self.logger = logger

    def update(self, **kwargs):
        for k, v in kwargs.items():
            if v is None:
                continue
            self.meters[k].update(float(v))

    def averages(self) -> Dict[str, float]:
        return {k: m.global_avg for k, m in self.meters.items()}

    def __str__(self) -> str:
        return self.delimiter.join(f"{k}: {m}" for k, m in self.meters.items())

    def log_every(
        self, iterable: Iterable, print_freq: int = 0, header: str = ""
    ) -> Iterator:
        """Yield items while tracking per-iteration data/step wall time in the
        ``data_time`` / ``iter_time`` meters (reference:
        MetricLogger.log_every, src/utils/misc.py:240-284). ``data_time`` is
        the wait on the loader — if it approaches ``iter_time`` the input
        pipeline is the bottleneck. ``print_freq=0`` collects silently (the
        engines emit their own per-step lines)."""
        end = time.time()
        for i, obj in enumerate(iterable):
            self.meters["data_time"].update(time.time() - end)
            yield obj
            self.meters["iter_time"].update(time.time() - end)
            end = time.time()
            if self.logger and print_freq and (i + 1) % print_freq == 0:
                self.logger.info(f"{header} [{i + 1}]  {self}")


def binary_auroc(targets: np.ndarray, probs: np.ndarray) -> float:
    """AUROC for binary problems; NaN if only one class present."""
    targets = np.asarray(targets)
    if len(np.unique(targets)) < 2:
        return float("nan")
    return float(roc_auc_score(targets, probs))


def multiclass_metrics(
    targets: np.ndarray, probs: np.ndarray, num_classes: int
) -> Dict[str, float]:
    """Per-class accuracy + AUROC, macro-averaged like torchmetrics'
    MulticlassAccuracy/MulticlassAUROC with average=None then mean."""
    targets = np.asarray(targets)
    probs = np.asarray(probs)
    preds = probs.argmax(axis=-1)
    out: Dict[str, float] = {}
    aurocs = []
    accs = []
    for c in range(num_classes):
        mask = targets == c
        acc = float((preds[mask] == c).mean()) if mask.any() else float("nan")
        onevs = (targets == c).astype(np.int32)
        auroc = binary_auroc(onevs, probs[:, c])
        out[f"acc_{c}"] = acc
        out[f"auroc_{c}"] = auroc
        accs.append(acc)
        aurocs.append(auroc)
    out["mean_acc"] = float(np.nanmean(accs))
    out["mean_auroc"] = float(np.nanmean(aurocs))
    return out
