"""3D Vision Transformer backbone.

Behavioral parity with the reference ViT (reference: src/models/vit.py:25-173):
patch embed -> prepend CLS -> insert register tokens after CLS (arXiv
2309.16588) -> N pre-norm blocks collecting per-layer hidden states -> final
norm (eps 1e-6) -> optional Tanh classification head. ``__call__`` returns
``(x, hidden_states_out)`` exactly like the reference forward.

TPU-first details: config PARALLEL.REMAT rematerializes the MLP half of each
block to trade FLOPs for HBM (MLP-only — see AttentionBlock docstring);
compute dtype is configurable (bfloat16 for training) with fp32 parameters.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from headct_foundation_tpu.models.attention import AttentionBlock
from headct_foundation_tpu.models.layers import make_norm
from headct_foundation_tpu.models.patch_embed import PatchEmbeddingBlock
from headct_foundation_tpu.models.pos_embed import _to_tuple


def _to3(x: Union[int, Sequence[int]]) -> Tuple[int, int, int]:
    return _to_tuple(x, 3)  # single impl (length-checked) in pos_embed


class ViT(nn.Module):
    in_chans: int
    img_size: Union[int, Sequence[int]]
    patch_size: Union[int, Sequence[int]]
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    pos_embed: str = "learnable"
    classification: bool = False
    num_classes: int = 2
    dropout_rate: float = 0.0
    spatial_dims: int = 3
    num_register_tokens: int = 0
    post_activation: str = "Tanh"
    qkv_bias: bool = False
    lora: bool = False
    save_attn: bool = False  # sow per-block att_mat into 'intermediates'
    norm_layer: str = "layernorm"
    remat: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        if not (0.0 <= self.dropout_rate <= 1.0):
            raise ValueError("dropout_rate should be between 0 and 1.")
        if self.hidden_size % self.num_heads != 0:
            raise ValueError("hidden_size should be divisible by num_heads.")
        assert self.num_register_tokens >= 0

        x = PatchEmbeddingBlock(
            img_size=_to3(self.img_size),
            patch_size=_to3(self.patch_size),
            in_channels=self.in_chans,
            hidden_size=self.hidden_size,
            pos_embed=self.pos_embed,
            dropout_rate=self.dropout_rate,
            spatial_dims=self.spatial_dims,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="patch_embedding",
        )(x, deterministic=deterministic)

        B = x.shape[0]
        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.hidden_size), self.param_dtype
        )
        tokens = [jnp.broadcast_to(cls_token.astype(self.dtype), (B, 1, self.hidden_size))]
        if self.num_register_tokens:
            register_tokens = self.param(
                "register_tokens",
                nn.initializers.zeros,
                (1, self.num_register_tokens, self.hidden_size),
                self.param_dtype,
            )
            tokens.append(
                jnp.broadcast_to(
                    register_tokens.astype(self.dtype),
                    (B, self.num_register_tokens, self.hidden_size),
                )
            )
        tokens.append(x)
        x = jnp.concatenate(tokens, axis=1)

        hidden_states_out: List[jnp.ndarray] = []
        for i in range(self.num_layers):
            x = AttentionBlock(
                hidden_size=self.hidden_size,
                mlp_dim=self.mlp_dim,
                num_heads=self.num_heads,
                dropout_rate=self.dropout_rate,
                qkv_bias=self.qkv_bias,
                lora=self.lora,
                save_attn=self.save_attn,
                norm_layer=self.norm_layer,
                # MLP-only remat: whole-block remat would re-trace the Pallas
                # attention in backward (see AttentionBlock docstring).
                remat_mlp=self.remat,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"blocks_{i}",
            )(x, deterministic)
            hidden_states_out.append(x)

        x = make_norm(self.norm_layer, self.hidden_size, eps=1e-6, name="norm")(x)

        if self.classification:
            logits = nn.Dense(
                self.num_classes,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="classification_head",
            )(x[:, 0])
            if self.post_activation == "Tanh":
                logits = jnp.tanh(logits)
            return logits, hidden_states_out

        return x, hidden_states_out
