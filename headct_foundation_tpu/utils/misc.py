"""Miscellaneous utilities mirroring the reference's misc surface
(reference: src/utils/misc.py) where they still make sense in JAX.

Omitted on purpose (subsumed by SPMD JAX): init_distributed_mode /
all_reduce_mean / concat_all_gather / AllGatherFunction — collectives are
inserted by XLA under sharded jit; clip_gradients / cosine schedules /
_update_momentum_encoder live in optim/ and the engines.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple


def create_dataset(
    images: Sequence[str], labels: Optional[Sequence[Any]]
) -> List[Dict[str, Any]]:
    """List-of-dicts manifest builder (reference: misc.py:17-32)."""
    if labels is None:
        return [{"image": img} for img in images]
    return [
        {"image": img, "pred_label": label} for img, label in zip(images, labels)
    ]


def datafold_read(
    datalist: str, basedir: str, fold: int = 0, key: str = "training"
) -> Tuple[List[Dict], List[Dict]]:
    """K-fold JSON datalist split (reference: misc.py:99-120)."""
    with open(datalist) as f:
        json_data = json.load(f)[key]

    for d in json_data:
        for k in d:
            if isinstance(d[k], list):
                d[k] = [os.path.join(basedir, iv) for iv in d[k]]
            elif isinstance(d[k], str):
                d[k] = os.path.join(basedir, d[k]) if len(d[k]) > 0 else d[k]

    tr, val = [], []
    for d in json_data:
        if "fold" in d and d["fold"] == fold:
            val.append(d)
        else:
            tr.append(d)
    return tr, val


class AverageMeter:
    """Running average meter (reference: misc.py:123-137)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count if self.count > 0 else self.sum


def profile_trace(log_dir: Optional[str] = None):
    """Context manager starting a jax.profiler trace when log_dir (or
    HEADCT_PROFILE_DIR) is set — the TPU-native replacement for the
    reference's coarse per-epoch timing (SURVEY.md §5 tracing row)."""
    import contextlib

    log_dir = log_dir or os.environ.get("HEADCT_PROFILE_DIR")
    if not log_dir:
        return contextlib.nullcontext()
    import jax

    return jax.profiler.trace(log_dir, create_perfetto_link=False)
