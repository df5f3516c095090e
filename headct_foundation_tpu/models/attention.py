"""Transformer blocks: fused-QKV self-attention, LoRA, pre-norm block, MLP.

Functional parity targets (formulas, not code) in the reference:
* ``LoraLinear`` — low-rank delta B@A with B zero-init
  (reference: src/models/attentionblock.py:6-22, rank 128 on q and v :45-47).
* ``SelfAttention`` — fused qkv projection, SDPA, output projection
  (reference: src/models/attentionblock.py:24-66).
* ``AttentionBlock`` — pre-norm residual x + attn(norm1(x)); x + mlp(norm2(x))
  (reference: src/models/attentionblock.py:96-99).
* MLP — Linear/GELU/Dropout/Linear/Dropout as MONAI ``MLPBlock`` (biases on).

TPU notes: the qkv projection is a single [T, C] x [C, 3C] matmul feeding the
MXU; attention runs through ops.attention (XLA fused attention by default,
Pallas flash attention optional). All dense compute can run in bfloat16 with
fp32 params (``dtype`` vs ``param_dtype``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

import os

from headct_foundation_tpu.models.layers import make_norm
from headct_foundation_tpu.ops.attention import dot_product_attention

def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    """GELU flavor: the reference uses torch's exact (erf) GELU via MONAI
    MLPBlock. On TPU the erf transcendental nearly doubles the elementwise
    cost of the MLP (measured: 1.6 ms vs 0.9 ms per ViT-B block at batch 32);
    the tanh approximation deviates by <3e-3 absolute on unit-scale
    activations — negligible against the 0.999-cosine feature-parity budget —
    so it is the default. Set HEADCT_EXACT_GELU=1 for bit-faithful erf GELU
    (read at trace time)."""
    approx = os.environ.get("HEADCT_EXACT_GELU", "0") != "1"
    return nn.gelu(x, approximate=approx)


class LoraLinear(nn.Module):
    """Low-rank adapter producing ``x @ (B @ A)^T`` with B zero-initialized."""

    in_features: int
    out_features: int
    r: int = 8
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # Names mirror the reference parameters lora_matrix_B [out, r] and
        # lora_matrix_A [r, in] so torch checkpoints map 1:1.
        b = self.param(
            "lora_matrix_B", nn.initializers.zeros, (self.out_features, self.r), self.param_dtype
        )
        a = self.param(
            "lora_matrix_A",
            nn.initializers.normal(stddev=1.0),
            (self.r, self.in_features),
            self.param_dtype,
        )
        x = x.astype(self.dtype)
        # (x @ A^T) @ B^T — two skinny matmuls instead of materializing B@A.
        return (x @ a.astype(self.dtype).T) @ b.astype(self.dtype).T


class SelfAttention(nn.Module):
    """``save_attn=True`` materializes the post-softmax attention matrix and
    sows it into the 'intermediates' collection as ``att_mat`` — the
    counterpart of the reference's ``save_attn`` buffer (reference:
    src/models/attentionblock.py:36,62-64), used for attention-map
    visualization. It forces the unfused XLA path (the fused kernel never
    materializes probabilities), so leave it off for training."""

    hidden_size: int
    num_heads: int = 12
    dropout: float = 0.0
    qkv_bias: bool = False
    lora: bool = False
    save_attn: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        B, N, C = x.shape
        H = self.num_heads
        D = C // H

        qkv = nn.Dense(
            3 * C,
            use_bias=self.qkv_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="qkv",
        )(x)
        qkv = qkv.reshape(B, N, 3, H, D)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, H, D]

        if self.lora:
            lq = LoraLinear(C, C, r=128, dtype=self.dtype, param_dtype=self.param_dtype,
                            name="lora_q")(x)
            lv = LoraLinear(C, C, r=128, dtype=self.dtype, param_dtype=self.param_dtype,
                            name="lora_v")(x)
            # Reference adds the LoRA delta after the head split
            # (src/models/attentionblock.py:57-59).
            q = q + lq.reshape(B, N, H, D)
            v = v + lv.reshape(B, N, H, D)

        if self.save_attn:
            scale = 1.0 / float(D) ** 0.5
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            self.sow("intermediates", "att_mat", probs)
            y = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v)
        else:
            y = dot_product_attention(q, k, v)  # [B, N, H, D]
        y = y.reshape(B, N, C)

        y = nn.Dense(
            C,
            use_bias=True,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="proj",
        )(y)
        y = nn.Dropout(rate=self.dropout)(y, deterministic=deterministic)
        return y


class MLPBlock(nn.Module):
    """Linear -> GELU -> Dropout -> Linear -> Dropout (MONAI MLPBlock, 'vit' mode)."""

    hidden_size: int
    mlp_dim: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Dense(
            self.mlp_dim,
            use_bias=True,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="linear1",
        )(x)
        x = _gelu(x)
        x = nn.Dropout(rate=self.dropout_rate)(x, deterministic=deterministic)
        x = nn.Dense(
            self.hidden_size,
            use_bias=True,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="linear2",
        )(x)
        x = nn.Dropout(rate=self.dropout_rate)(x, deterministic=deterministic)
        return x


class AttentionBlock(nn.Module):
    """Pre-norm transformer block: x + attn(norm(x)); x + mlp(norm(x)).

    ``remat_mlp=True`` rematerializes the MLP half in the backward pass —
    the block's largest activations (the [B, T, mlp_dim] GELU tensors) are
    recomputed instead of stored. The attention half is deliberately NOT
    rematerialized: recomputing it would re-trace the Pallas flash-attention
    kernel inside the remat backward, which XLA fails to compile in
    reasonable time (measured: >20 min for ViT-B whole-block remat). MLP-only
    remat captures most of the memory win at a tiny recompute cost and keeps
    the custom-VJP attention path intact.
    """

    hidden_size: int
    mlp_dim: int
    num_heads: int
    dropout_rate: float = 0.0
    qkv_bias: bool = False
    lora: bool = False
    save_attn: bool = False
    norm_layer: str = "layernorm"
    remat_mlp: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        attn_in = make_norm(self.norm_layer, self.hidden_size, name="att_norm")(x)
        x = x + SelfAttention(
            hidden_size=self.hidden_size,
            num_heads=self.num_heads,
            dropout=self.dropout_rate,
            qkv_bias=self.qkv_bias,
            lora=self.lora,
            save_attn=self.save_attn,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="attn",
        )(attn_in, deterministic=deterministic)
        mlp_cls = MLPBlock
        if self.remat_mlp:
            # static_argnums indexes the bound method's positional args
            # (0=self/scope, 1=x, 2=deterministic); deterministic MUST be
            # passed positionally below so the static marking applies —
            # as a keyword it would be traced and nn.Dropout's python
            # branch on it would crash whenever dropout_rate > 0.
            mlp_cls = nn.remat(MLPBlock, static_argnums=(2,))
        mlp_in = make_norm(self.norm_layer, self.hidden_size, name="ffn_norm")(x)
        x = x + mlp_cls(
            hidden_size=self.hidden_size,
            mlp_dim=self.mlp_dim,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="mlp",
        )(mlp_in, deterministic)
        return x
