"""3D patch embedding as a fused reshape + matmul.

The reference embeds patches with a Conv3d whose kernel equals its stride
(reference: src/utils/patch_embedding.py:102-105). On TPU that convolution is
exactly a block-reshape followed by one [B*L, patch_dim] x [patch_dim, C]
matmul — a single large MXU op with no halo exchange — so we implement it that
way directly. ``patchify3d``/``unpatchify3d`` reproduce the reference token
and feature ordering (grid-major tokens; (ph, pw, pd, channel) features;
reference: src/models/mae.py:150-192) so embeddings and MAE targets match the
reference bit-for-bit given the same weights.

Dynamic-resolution inputs get their position embedding trilinearly
interpolated inside the forward pass (reference:
src/utils/patch_embedding.py:135-146).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from headct_foundation_tpu.models.layers import trunc_normal_init
from headct_foundation_tpu.models.pos_embed import (
    build_sincos_position_embedding,
    interpolate_pos_embed,
)


def patchify3d(x: jnp.ndarray, patch_size: Sequence[int]) -> jnp.ndarray:
    """[B, C, H, W, D] -> [B, gh*gw*gd, ph*pw*pd*C] in reference order."""
    B, C, H, W, D = x.shape
    ph, pw, pd = patch_size
    gh, gw, gd = H // ph, W // pw, D // pd
    x = x.reshape(B, C, gh, ph, gw, pw, gd, pd)
    # (B, gh, gw, gd, ph, pw, pd, C) — matches reference permute(0,2,4,6,3,5,7,1)
    x = x.transpose(0, 2, 4, 6, 3, 5, 7, 1)
    return x.reshape(B, gh * gw * gd, ph * pw * pd * C)


def unpatchify3d(
    x: jnp.ndarray, patch_size: Sequence[int], out_shape: Sequence[int]
) -> jnp.ndarray:
    """[B, L, ph*pw*pd*C] -> [B, C, H, W, D] (reference: mae.py:172-192)."""
    B = x.shape[0]
    C, H, W, D = out_shape
    ph, pw, pd = patch_size
    gh, gw, gd = H // ph, W // pw, D // pd
    x = x.reshape(B, gh, gw, gd, ph, pw, pd, C)
    x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)
    return x.reshape(B, C, gh * ph, gw * pw, gd * pd)


class PatchEmbeddingBlock(nn.Module):
    """Patch embedding + position embedding for 3D volumes.

    Parameters are stored in matmul layout: ``kernel`` is
    [ph*pw*pd*in_channels, hidden_size] with (ph, pw, pd, c) feature order.
    ``utils/torch_interop.py`` converts reference Conv3d weights
    [O, C, ph, pw, pd] into this layout.
    """

    img_size: Tuple[int, int, int]
    patch_size: Tuple[int, int, int]
    in_channels: int
    hidden_size: int
    pos_embed: str = "learnable"  # none | learnable | sincos
    dropout_rate: float = 0.0
    spatial_dims: int = 3
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        if not (0.0 <= self.dropout_rate <= 1.0):
            raise ValueError(f"dropout_rate {self.dropout_rate} should be in [0, 1]")
        assert self.spatial_dims == 3, "TPU build targets 3D volumes"
        for m, p in zip(self.img_size, self.patch_size):
            if m < p:
                raise ValueError("patch_size should be smaller than img_size")
            if m % p != 0:
                raise ValueError("img_size must be divisible by patch_size")
        self.grid_size = tuple(m // p for m, p in zip(self.img_size, self.patch_size))
        self.n_patches = int(np.prod(self.grid_size))
        patch_dim = int(self.in_channels * np.prod(self.patch_size))

        self.kernel = self.param(
            "kernel", trunc_normal_init(0.02), (patch_dim, self.hidden_size), self.param_dtype
        )
        self.bias = self.param("bias", nn.initializers.zeros, (self.hidden_size,), self.param_dtype)

        if self.pos_embed == "none":
            self.position_embeddings = None
        elif self.pos_embed == "learnable":
            self.position_embeddings = self.param(
                "position_embeddings",
                trunc_normal_init(0.02),
                (1, self.n_patches, self.hidden_size),
                self.param_dtype,
            )
        elif self.pos_embed == "sincos":
            init = build_sincos_position_embedding(
                self.grid_size, self.hidden_size, self.spatial_dims
            )
            # Stored as a parameter for checkpoint parity with the reference
            # (which keeps it as a frozen nn.Parameter); excluded from weight
            # decay / updates via the optimizer mask.
            self.position_embeddings = self.param(
                "position_embeddings", lambda rng: jnp.asarray(init),
            )
        else:
            raise ValueError(f"pos_embed type {self.pos_embed} not supported")

        self.dropout = nn.Dropout(rate=self.dropout_rate)

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """[B, C, H, W, D] -> [B, L, hidden]."""
        spatial = tuple(x.shape[2:])
        patches = patchify3d(x, self.patch_size).astype(self.dtype)
        tokens = patches @ self.kernel.astype(self.dtype) + self.bias.astype(self.dtype)

        if self.position_embeddings is not None:
            pe = self.position_embeddings
            if spatial != tuple(self.img_size):
                # pass the ACTUAL grid: a non-cubic input whose patch count
                # is a perfect cube would otherwise be mis-assigned
                new_grid = tuple(
                    s // p for s, p in zip(spatial, self.patch_size)
                )
                pe = interpolate_pos_embed(
                    pe, num_extra_tokens=0, spatial_dims=self.spatial_dims,
                    new_grid=new_grid,
                )
            tokens = tokens + pe.astype(self.dtype)

        return self.dropout(tokens, deterministic=deterministic)
