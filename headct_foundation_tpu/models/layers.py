"""Normalization layers and shared building blocks.

* ``RMSNorm`` matches the Llama-style reference (reference:
  src/models/layers.py:11-54): normalize in fp32, cast back, then scale.
* ``make_norm`` resolves the ``NORM_LAYER`` config string
  (reference: main_downstream.py:111-116 selects layernorm vs rmsnorm).
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp


class RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        weight = self.param("weight", nn.initializers.ones, (self.dim,), self.param_dtype)
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        norm = xf * jnp.reciprocal(jnp.sqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps))
        return norm.astype(orig_dtype) * weight.astype(orig_dtype)


class LayerNorm(nn.Module):
    """LayerNorm with torch-default epsilon (1e-5) and fp32 statistics."""

    dim: int
    eps: float = 1e-5
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.dim,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), self.param_dtype)
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + self.eps))
        return y.astype(orig_dtype) * scale.astype(orig_dtype) + bias.astype(orig_dtype)


def make_norm(norm_layer: str, dim: int, eps: float = 1e-5, name: str | None = None) -> nn.Module:
    """Build a norm module from a config string ('layernorm' | 'rmsnorm')."""
    norm_layer = norm_layer.lower()
    if norm_layer == "layernorm":
        return LayerNorm(dim=dim, eps=eps, name=name)
    if norm_layer == "rmsnorm":
        return RMSNorm(dim=dim, eps=1e-6, name=name)
    raise ValueError(f"Unknown norm layer: {norm_layer}")


# torch-style trunc_normal(std=0.02, clip +-2 std) used across the reference
# (e.g. src/utils/patch_embedding.py:116, src/models/mae.py:134-136).
def trunc_normal_init(std: float = 0.02) -> Callable:
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)
