"""Step-wise learning-rate schedules.

Formula parity with the reference schedules (reference:
src/utils/lr_sched.py:18-140): cosine-with-warmup decaying to an ``lr_end``
floor, polynomial decay (power 2.0), and constant-with-warmup. All are
per-iteration schedules. Implemented as pure ``step -> lr`` callables usable
both by optax (as ``learning_rate`` schedules) and inside jitted train steps.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def cosine_schedule_with_warmup(
    base_lr: float,
    num_warmup_steps: int,
    num_training_steps: int,
    lr_end: float = 1e-6,
    num_cycles: float = 0.5,
) -> Schedule:
    if not base_lr > lr_end:
        raise ValueError(f"lr_end ({lr_end}) must be smaller than initial lr ({base_lr})")

    def schedule(step: jnp.ndarray) -> jnp.ndarray:
        step = jnp.asarray(step, dtype=jnp.float32)
        warmup = step / jnp.maximum(1.0, num_warmup_steps) * base_lr
        progress = (step - num_warmup_steps) / jnp.maximum(
            1.0, num_training_steps - num_warmup_steps
        )
        cosine = lr_end + (base_lr - lr_end) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * num_cycles * 2.0 * progress)
        )
        cosine = jnp.maximum(0.0, cosine)
        return jnp.where(step < num_warmup_steps, warmup, cosine)

    return schedule


def polynomial_schedule_with_warmup(
    base_lr: float,
    num_warmup_steps: int,
    num_training_steps: int,
    lr_end: float = 1e-7,
    power: float = 1.0,
) -> Schedule:
    if not base_lr > lr_end:
        raise ValueError(f"lr_end ({lr_end}) must be smaller than initial lr ({base_lr})")

    def schedule(step: jnp.ndarray) -> jnp.ndarray:
        step = jnp.asarray(step, dtype=jnp.float32)
        warmup = step / jnp.maximum(1.0, num_warmup_steps) * base_lr
        # max(1, .) guard like the cosine sibling: warmup == total steps
        # would divide by zero and NaN the LR (jnp.where runs both branches)
        decay_steps = jnp.maximum(1.0, num_training_steps - num_warmup_steps)
        pct_remaining = 1.0 - (step - num_warmup_steps) / decay_steps
        decay = (base_lr - lr_end) * pct_remaining**power + lr_end
        out = jnp.where(step > num_training_steps, lr_end, decay)
        return jnp.where(step < num_warmup_steps, warmup, out)

    return schedule


def constant_schedule_with_warmup(base_lr: float, num_warmup_steps: int) -> Schedule:
    def schedule(step: jnp.ndarray) -> jnp.ndarray:
        step = jnp.asarray(step, dtype=jnp.float32)
        warmup = step / jnp.maximum(1.0, num_warmup_steps) * base_lr
        return jnp.where(step < num_warmup_steps, warmup, base_lr)

    return schedule


def get_lr_schedule(
    config, base_lr: float, num_warmup_steps: int, total_steps: int, min_lr: float
) -> Schedule:
    """Resolve TRAIN.SCHEDULER (reference: src/utils/lr_sched.py:127-140)."""
    name = config.TRAIN.SCHEDULER
    if name == "cosine":
        return cosine_schedule_with_warmup(base_lr, num_warmup_steps, total_steps, lr_end=min_lr)
    if name == "poly":
        return polynomial_schedule_with_warmup(
            base_lr, num_warmup_steps, total_steps, lr_end=min_lr, power=2.0
        )
    if name == "constant":
        return constant_schedule_with_warmup(base_lr, num_warmup_steps)
    raise ValueError(f"Scheduler {name} not supported")
