"""Attention compute op.

Single entry point for scaled-dot-product attention so the model code is
independent of the kernel backend. The reference routes all attention through
``torch.nn.functional.scaled_dot_product_attention`` (reference:
src/models/attentionblock.py:61); here the default is XLA's fused attention
(``jax.nn.dot_product_attention``), with a Pallas flash-attention kernel
selectable for long sequences (see ops/flash_attention.py).

Sequence lengths in this workload are short (512 patch tokens + CLS +
registers), so XLA's fusion of QK^T -> softmax -> PV into MXU-friendly blocks
is already near roofline; the Pallas path exists for the high-resolution
(e.g. 192^3 -> 4096 tokens) stretch configs.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

# Flip by tests/benchmarks; "xla" | "pallas"
_BACKEND = "xla"


def set_attention_backend(name: str) -> None:
    global _BACKEND
    assert name in ("xla", "pallas"), name
    _BACKEND = name


def get_attention_backend() -> str:
    return _BACKEND


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
) -> jax.Array:
    """Multi-head attention over [B, T, H, D] tensors (BTHD layout).

    Args:
      q: queries [B, Tq, H, D].
      k: keys    [B, Tk, H, D].
      v: values  [B, Tk, H, D].
      scale: softmax scale; defaults to 1/sqrt(D).

    Returns:
      [B, Tq, H, D] attention output in q.dtype.
    """
    if _BACKEND == "pallas":
        from headct_foundation_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)
    return jax.nn.dot_product_attention(q, k, v, scale=scale)
