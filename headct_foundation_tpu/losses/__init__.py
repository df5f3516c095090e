from headct_foundation_tpu.losses.basic import kl_divergence, l1_loss, l2_loss
from headct_foundation_tpu.losses.dino_loss import (
    dino_loss,
    teacher_temp_schedule,
    update_center,
)

__all__ = [
    "dino_loss",
    "kl_divergence",
    "l1_loss",
    "l2_loss",
    "teacher_temp_schedule",
    "update_center",
]
