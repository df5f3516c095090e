from headct_foundation_tpu.models.attention import (
    AttentionBlock,
    LoraLinear,
    MLPBlock,
    SelfAttention,
)
from headct_foundation_tpu.models.classifier import AttentionClassifier, LinearClassifier
from headct_foundation_tpu.models.dino_head import DINOHead, WeightNormDense
from headct_foundation_tpu.models.layers import LayerNorm, RMSNorm, make_norm
from headct_foundation_tpu.models.mae import MaskedAutoencoderViT
from headct_foundation_tpu.models.multicrop import multicrop_forward
from headct_foundation_tpu.models.patch_embed import (
    PatchEmbeddingBlock,
    patchify3d,
    unpatchify3d,
)
from headct_foundation_tpu.models.pos_embed import (
    build_sincos_position_embedding,
    interpolate_pos_embed,
    nth_root,
)
from headct_foundation_tpu.models.vit import ViT

__all__ = [
    "AttentionBlock",
    "AttentionClassifier",
    "DINOHead",
    "LayerNorm",
    "LinearClassifier",
    "LoraLinear",
    "MLPBlock",
    "MaskedAutoencoderViT",
    "PatchEmbeddingBlock",
    "RMSNorm",
    "SelfAttention",
    "ViT",
    "WeightNormDense",
    "build_sincos_position_embedding",
    "interpolate_pos_embed",
    "make_norm",
    "multicrop_forward",
    "nth_root",
    "patchify3d",
    "unpatchify3d",
]
