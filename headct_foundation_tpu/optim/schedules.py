"""Array-valued cosine schedules for weight decay and teacher momentum.

Parity with the reference ``cosine_scheduler`` (reference:
src/utils/misc.py:414-425) and ``wd_cosine_scheduler`` (reference:
src/utils/wd_sched.py:3-23): linear warmup then half-cosine from base to
final, one value per global iteration.
"""

from __future__ import annotations

import numpy as np


def cosine_scheduler(
    base_value: float,
    final_value: float,
    epochs: int,
    niter_per_ep: int,
    warmup_epochs: int = 0,
    start_warmup_value: float = 0.0,
) -> np.ndarray:
    warmup_iters = warmup_epochs * niter_per_ep
    warmup_schedule = np.array([])
    if warmup_epochs > 0:
        warmup_schedule = np.linspace(start_warmup_value, base_value, warmup_iters)

    iters = np.arange(epochs * niter_per_ep - warmup_iters)
    schedule = final_value + 0.5 * (base_value - final_value) * (
        1 + np.cos(np.pi * iters / len(iters))
    )
    schedule = np.concatenate((warmup_schedule, schedule))
    assert len(schedule) == epochs * niter_per_ep
    return schedule


def get_wd_schedule(config, niter_per_ep: int) -> np.ndarray:
    """Weight-decay schedule (reference: src/utils/wd_sched.py:17-23)."""
    return cosine_scheduler(
        config.TRAIN.WEIGHT_DECAY,
        config.TRAIN.WEIGHT_DECAY_END,
        config.TRAIN.MAX_EPOCHS,
        niter_per_ep,
    )


def get_momentum_schedule(config, niter_per_ep: int) -> np.ndarray:
    """Teacher EMA momentum schedule (reference: main_pretrain_dino.py:226-230)."""
    return cosine_scheduler(
        config.DINO.MOMENTUM_TEACHER,
        config.DINO.MOMENTUM_TEACHER_END,
        config.TRAIN.MAX_EPOCHS,
        niter_per_ep,
    )
