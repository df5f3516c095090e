"""3D Masked Autoencoder with a ViT backbone.

Behavioral parity with the reference MAE (reference: src/models/mae.py:20-316):
* encoder: patch embed (+sincos pos embed) -> device-side random masking
  (keep 25%) -> CLS -> 12 blocks -> norm,
* decoder: linear projection -> re-insert learned mask tokens via
  ids_restore gather -> add fixed sincos decoder pos embed with decoder CLS ->
  8 blocks -> norm -> voxel prediction head -> drop CLS,
* loss: per-patch MSE on masked patches only, optional per-patch pixel
  normalization (NORM_PIX_LOSS).

``__call__`` returns ``(loss, None, None)`` like the reference forward
(reference: src/models/mae.py:303-316). Masking randomness comes from the
'mask' RNG collection, so a jitted train step controls it with an explicit
key — reproducible and decorrelated across devices.

TPU-first: the encoder only ever sees the 25% kept tokens (129 tokens for the
96^3/p12 config), so its 12 ViT-B blocks run on a [B, 129, 768] activation;
bfloat16 compute with fp32 params replaces the reference's fp16 AMP+GradScaler.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from headct_foundation_tpu.models.attention import AttentionBlock
from headct_foundation_tpu.models.layers import make_norm, trunc_normal_init
from headct_foundation_tpu.models.patch_embed import PatchEmbeddingBlock, patchify3d
from headct_foundation_tpu.models.pos_embed import _to_tuple, build_sincos_position_embedding
from headct_foundation_tpu.ops.masking import random_masking


def _to3(x: Union[int, Sequence[int]]) -> Tuple[int, int, int]:
    return _to_tuple(x, 3)  # single impl (length-checked) in pos_embed


def mae_encoder_block(m: "MaskedAutoencoderViT", name=None) -> AttentionBlock:
    """The exact encoder AttentionBlock the model's setup() builds — the
    single source of truth shared with the pipelined trunk apply
    (engines/mae_engine._make_pipelined_loss), so block hyperparameters can
    never drift between the two forwards."""
    return AttentionBlock(
        hidden_size=m.encoder_embed_dim,
        mlp_dim=m.encoder_mlp_dim,
        num_heads=m.encoder_num_heads,
        dropout_rate=m.dropout_rate,
        qkv_bias=m.use_bias,
        norm_layer=m.norm_layer,
        remat_mlp=m.remat,
        dtype=m.dtype,
        param_dtype=m.param_dtype,
        name=name,
    )


def mae_decoder_block(m: "MaskedAutoencoderViT", name=None) -> AttentionBlock:
    """Decoder twin of :func:`mae_encoder_block`."""
    return AttentionBlock(
        hidden_size=m.decoder_embed_dim,
        mlp_dim=m.decoder_mlp_dim,
        num_heads=m.decoder_num_heads,
        dropout_rate=m.dropout_rate,
        qkv_bias=m.use_bias,
        norm_layer=m.norm_layer,
        remat_mlp=m.remat,
        dtype=m.dtype,
        param_dtype=m.param_dtype,
        name=name,
    )


class MaskedAutoencoderViT(nn.Module):
    input_size: Union[int, Sequence[int]]
    patch_size: Union[int, Sequence[int]]
    mask_ratio: float
    in_chans: int = 1
    dropout_rate: float = 0.0
    spatial_dims: int = 3
    pos_embed: str = "learnable"
    encoder_depth: int = 12
    encoder_embed_dim: int = 768
    encoder_mlp_dim: int = 3072
    encoder_num_heads: int = 12
    decoder_depth: int = 8
    decoder_embed_dim: int = 768
    decoder_mlp_dim: int = 3072
    decoder_num_heads: int = 16
    norm_pix_loss: bool = False
    loss_dtype: str = "float32"  # "bfloat16": bandwidth-lean loss path
    use_bias: bool = False
    norm_layer: str = "layernorm"
    remat: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        input_size = _to3(self.input_size)
        patch_size = _to3(self.patch_size)
        self._input_size = input_size
        self._patch_size = patch_size
        self.grid_size = tuple(i // p for i, p in zip(input_size, patch_size))
        num_patches = int(np.prod(self.grid_size))
        patch_dim = int(np.prod(patch_size))

        self.cls_token = self.param(
            "cls_token", trunc_normal_init(0.02), (1, 1, self.encoder_embed_dim), self.param_dtype
        )
        self.decoder_cls_token = self.param(
            "decoder_cls_token",
            trunc_normal_init(0.02),
            (1, 1, self.decoder_embed_dim),
            self.param_dtype,
        )
        if self.pos_embed == "sincos":
            dec_pe = build_sincos_position_embedding(
                self.grid_size, self.decoder_embed_dim, self.spatial_dims
            )
            self.decoder_pos_embed = self.param(
                "decoder_pos_embed", lambda rng: jnp.asarray(dec_pe)
            )
        else:
            self.decoder_pos_embed = self.param(
                "decoder_pos_embed",
                trunc_normal_init(0.02),
                (1, num_patches, self.decoder_embed_dim),
                self.param_dtype,
            )
        self.mask_token = self.param(
            "mask_token", trunc_normal_init(0.02), (1, 1, self.decoder_embed_dim), self.param_dtype
        )

        self.patch_embedding = PatchEmbeddingBlock(
            img_size=input_size,
            patch_size=patch_size,
            in_channels=self.in_chans,
            hidden_size=self.encoder_embed_dim,
            pos_embed=self.pos_embed,
            dropout_rate=self.dropout_rate,
            spatial_dims=self.spatial_dims,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )

        # MLP-only remat: whole-block remat would re-trace the Pallas
        # attention in backward (see AttentionBlock docstring).
        self.blocks = [
            mae_encoder_block(self, name=f"blocks_{i}")
            for i in range(self.encoder_depth)
        ]
        self.decoder_blocks = [
            mae_decoder_block(self, name=f"decoder_blocks_{i}")
            for i in range(self.decoder_depth)
        ]

        self.norm = make_norm(self.norm_layer, self.encoder_embed_dim, name="norm")
        self.decoder_norm = make_norm(self.norm_layer, self.decoder_embed_dim, name="decoder_norm")
        self.decoder_embed = nn.Dense(
            self.decoder_embed_dim,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="decoder_embed",
        )
        self.decoder_pred = nn.Dense(
            patch_dim * self.in_chans,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="decoder_pred",
        )

    def patchify(self, x: jnp.ndarray) -> jnp.ndarray:
        return patchify3d(x, self._patch_size)

    # The encoder/decoder each split into prefix -> trunk -> suffix so the
    # pipeline-parallel train step (parallel/pipeline.py) can run the trunk
    # (the homogeneous block stack) under its own shard_map schedule while
    # everything else stays ordinary GSPMD. forward_encoder/forward_decoder
    # compose the pieces — behavior is identical to the reference layout.

    def encode_prefix(
        self, x: jnp.ndarray, mask_rng: jax.Array, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """patch embed -> random masking -> prepend CLS (everything before
        the encoder block trunk)."""
        x = self.patch_embedding(x, deterministic=deterministic)
        x, mask, ids_restore, _ = random_masking(mask_rng, x, self.mask_ratio)

        cls = jnp.broadcast_to(
            self.cls_token.astype(self.dtype), (x.shape[0], 1, self.encoder_embed_dim)
        )
        x = jnp.concatenate([cls, x], axis=1)
        return x, mask, ids_restore

    def encode_suffix(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.norm(x)

    def forward_encoder(
        self, x: jnp.ndarray, mask_rng: jax.Array, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        x, mask, ids_restore = self.encode_prefix(x, mask_rng, deterministic)
        for blk in self.blocks:
            x = blk(x, deterministic)
        return self.encode_suffix(x), mask, ids_restore

    def decode_prefix(self, x: jnp.ndarray, ids_restore: jnp.ndarray) -> jnp.ndarray:
        """decoder embed -> mask-token unshuffle -> +decoder pos embed
        (everything before the decoder block trunk)."""
        x = self.decoder_embed(x)
        B = x.shape[0]
        L = ids_restore.shape[1]

        n_mask = L + 1 - x.shape[1]
        mask_tokens = jnp.broadcast_to(
            self.mask_token.astype(x.dtype), (B, n_mask, self.decoder_embed_dim)
        )
        x_ = jnp.concatenate([x[:, 1:, :], mask_tokens], axis=1)
        x_ = jnp.take_along_axis(x_, ids_restore[:, :, None], axis=1)
        x = jnp.concatenate([x[:, :1, :], x_], axis=1)

        dec_pe = jnp.concatenate(
            [
                jnp.broadcast_to(self.decoder_cls_token, (1, 1, self.decoder_embed_dim)),
                self.decoder_pos_embed,
            ],
            axis=1,
        )
        return x + dec_pe.astype(x.dtype)

    def decode_suffix(self, x: jnp.ndarray) -> jnp.ndarray:
        x = self.decoder_norm(x)
        x = self.decoder_pred(x)
        return x[:, 1:, :]

    def forward_decoder(self, x: jnp.ndarray, ids_restore: jnp.ndarray,
                        deterministic: bool = True) -> jnp.ndarray:
        x = self.decode_prefix(x, ids_restore)
        for blk in self.decoder_blocks:
            x = blk(x, deterministic)
        return self.decode_suffix(x)

    def forward_loss(
        self, imgs: jnp.ndarray, pred: jnp.ndarray, mask: jnp.ndarray
    ) -> jnp.ndarray:
        # loss_dtype="bfloat16" keeps the [B, L, p^3*C] target/diff tensors
        # in 2-byte form (the loss path is bandwidth-bound); the per-patch
        # mean and the final masked reduction still accumulate in f32.
        ldt = jnp.dtype(self.loss_dtype)
        target = self.patchify(imgs).astype(ldt)
        if self.norm_pix_loss:
            mean = target.mean(axis=-1, keepdims=True, dtype=jnp.float32)
            # UNBIASED per-patch variance: the reference's target.var(dim=-1)
            # uses torch's default Bessel correction (src/models/mae.py:292)
            n = target.shape[-1]
            var = jnp.square(target.astype(jnp.float32) - mean).sum(
                axis=-1, keepdims=True
            ) / max(n - 1, 1)
            target = ((target - mean) / jnp.sqrt(var + 1.0e-6)).astype(ldt)

        loss = jnp.square(pred.astype(ldt) - target).mean(
            axis=-1, dtype=jnp.float32
        )
        mask = mask.astype(jnp.float32)
        return (loss * mask).sum() / mask.sum()

    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True,
        mask_rng: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, None, None]:
        if mask_rng is None:
            mask_rng = self.make_rng("mask")
        latent, mask, ids_restore = self.forward_encoder(x, mask_rng, deterministic)
        pred = self.forward_decoder(latent, ids_restore, deterministic)
        loss = self.forward_loss(x, pred, mask)
        return loss, None, None
