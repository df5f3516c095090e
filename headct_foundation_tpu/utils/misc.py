"""Profiling hook — the TPU-native replacement for the reference's coarse
per-epoch timing (SURVEY.md §5 tracing row; reference: src/utils/misc.py's
MetricLogger.log_every iter timing lives in utils/metrics.py here).

The reference surface's other misc helpers are subsumed elsewhere:
init_distributed_mode / all_reduce_mean / concat_all_gather /
AllGatherFunction — collectives are inserted by XLA under sharded jit;
clip_gradients / cosine schedules / _update_momentum_encoder live in optim/
and the engines; MetricLogger / SmoothedValue in utils/metrics.py.
"""

from __future__ import annotations

import json
import os
from typing import Optional


def datafold_read(datalist, basedir, fold: int = 0, key: str = "training"):
    """Split a MONAI-style datalist JSON into (train, val) by fold index.

    Parity with the reference utility (src/utils/misc.py:99-120): every
    string/list-of-string value in each record is joined onto ``basedir``
    (empty strings left as-is), records whose ``fold`` equals the requested
    fold become validation, everything else training.
    """
    with open(datalist) as f:
        records = json.load(f)[key]
    for d in records:
        for k, v in d.items():
            if isinstance(v, list):
                d[k] = [os.path.join(basedir, item) for item in v]
            elif isinstance(v, str):
                d[k] = os.path.join(basedir, v) if v else v
    tr = [d for d in records if d.get("fold") != fold]
    val = [d for d in records if d.get("fold") == fold]
    return tr, val


def profile_trace(log_dir: Optional[str] = None):
    """Context manager starting a jax.profiler trace when log_dir (or
    HEADCT_PROFILE_DIR) is set. The engines wrap their first training epoch
    in this, so `HEADCT_PROFILE_DIR=/tmp/trace python main_pretrain_mae.py ...`
    captures a device trace with zero code changes."""
    import contextlib

    log_dir = log_dir or os.environ.get("HEADCT_PROFILE_DIR")
    if not log_dir:
        return contextlib.nullcontext()
    import jax

    return jax.profiler.trace(log_dir, create_perfetto_link=False)
