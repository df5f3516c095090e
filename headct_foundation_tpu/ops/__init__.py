from headct_foundation_tpu.ops.attention import (
    dot_product_attention,
    get_attention_backend,
    set_attention_backend,
)
from headct_foundation_tpu.ops.masking import random_masking

__all__ = [
    "dot_product_attention",
    "get_attention_backend",
    "random_masking",
    "set_attention_backend",
]
