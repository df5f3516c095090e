from headct_foundation_tpu.optim.lr_sched import (
    constant_schedule_with_warmup,
    cosine_schedule_with_warmup,
    get_lr_schedule,
    polynomial_schedule_with_warmup,
)
from headct_foundation_tpu.optim.optimizers import (
    clip_by_per_param_norm,
    get_optimizer,
    scale_by_lamb,
    scale_by_lion_with_wd,
    scheduled_weight_decay,
)
from headct_foundation_tpu.optim.schedules import (
    cosine_scheduler,
    get_momentum_schedule,
    get_wd_schedule,
)

__all__ = [
    "clip_by_per_param_norm",
    "constant_schedule_with_warmup",
    "cosine_schedule_with_warmup",
    "cosine_scheduler",
    "get_lr_schedule",
    "get_momentum_schedule",
    "get_optimizer",
    "get_wd_schedule",
    "polynomial_schedule_with_warmup",
    "scale_by_lamb",
    "scale_by_lion_with_wd",
    "scheduled_weight_decay",
]
