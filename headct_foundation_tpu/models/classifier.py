"""Downstream classification heads.

* ``LinearClassifier`` — affine-free BatchNorm1d then Linear (reference:
  src/models/classifier.py:7-33).
* ``AttentionClassifier`` — learned query token(s) cross-attending over all
  patch tokens with BatchNorm before/after, mean over queries, Linear
  (reference: src/models/classifier.py:35-100).

Batch statistics are synchronized across the data-parallel mesh axis when
training (flax BatchNorm ``axis_name``), which is the TPU-native equivalent of
the reference's SyncBatchNorm conversion (reference: main_pretrain_mae.py:137).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from headct_foundation_tpu.models.layers import TorchBatchNorm, trunc_normal_init
from headct_foundation_tpu.ops.attention import dot_product_attention


class LinearClassifier(nn.Module):
    dim: int
    num_classes: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = True) -> jnp.ndarray:
        x = TorchBatchNorm(
            use_running_average=use_running_average,
            momentum=0.9,
            epsilon=1e-6,
            use_bias=False,
            use_scale=False,
            dtype=jnp.float32,
            axis_name=None if use_running_average else self.axis_name,
            name="bn",
        )(x)
        return nn.Dense(
            self.num_classes, dtype=self.dtype, param_dtype=self.param_dtype, name="linear"
        )(x)


class AttentionClassifier(nn.Module):
    dim: int
    num_classes: int
    num_heads: int = 12
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    num_queries: int = 1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = True) -> jnp.ndarray:
        B, N, C = x.shape
        H = self.num_heads
        D = C // H
        scale = self.qk_scale or D**-0.5

        cls_token = self.param(
            "cls_token", trunc_normal_init(0.02), (1, self.num_queries, C), self.param_dtype
        )
        q = jnp.broadcast_to(cls_token.astype(self.dtype), (B, self.num_queries, C))
        q = q.reshape(B, self.num_queries, H, D)

        # BatchNorm over the channel axis with stats over (batch, tokens)
        # — equivalent to the reference's BatchNorm1d on [B, C, N].
        x = TorchBatchNorm(
            use_running_average=use_running_average,
            momentum=0.9,
            epsilon=1e-6,
            use_bias=False,
            use_scale=False,
            dtype=jnp.float32,
            axis_name=None if use_running_average else self.axis_name,
            name="bn1",
        )(x)

        kv = nn.Dense(
            2 * C,
            use_bias=self.qkv_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="wkv",
        )(x.astype(self.dtype))
        kv = kv.reshape(B, N, 2, H, D)
        k, v = kv[:, :, 0], kv[:, :, 1]

        # The reference pre-scales q and calls SDPA (which applies its own
        # 1/sqrt(D)), so the effective scale is `scale / sqrt(D)`.
        attn_out = dot_product_attention(q * scale, k, v)  # default scale 1/sqrt(D)
        x_cls = attn_out.reshape(B, self.num_queries, C)

        x_cls = TorchBatchNorm(
            use_running_average=use_running_average,
            momentum=0.9,
            epsilon=1e-6,
            use_bias=False,
            use_scale=False,
            dtype=jnp.float32,
            axis_name=None if use_running_average else self.axis_name,
            name="bn2",
        )(x_cls)
        x_cls = x_cls.mean(axis=1)

        return nn.Dense(
            self.num_classes, dtype=self.dtype, param_dtype=self.param_dtype, name="linear"
        )(x_cls.astype(self.dtype))
