"""Normalization layers and shared building blocks.

* ``RMSNorm`` matches the Llama-style reference (reference:
  src/models/layers.py:11-54): normalize in fp32, cast back, then scale.
* ``make_norm`` resolves the ``NORM_LAYER`` config string
  (reference: main_downstream.py:111-116 selects layernorm vs rmsnorm).
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
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


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch running-statistics semantics.

    ``flax.linen.BatchNorm`` stores the BIASED batch variance into the
    running ``var``; torch's ``BatchNorm*d`` normalizes with the biased
    variance but stores the UNBIASED (Bessel-corrected, n/(n-1)) one. The
    reference's BN layers are torch modules (reference:
    src/models/classifier.py:18, src/models/dino_head.py:17-22), so eval-time
    parity of self-trained classifiers requires the torch update rule.
    Interface and variable layout (``batch_stats`` {mean, var}; params
    {scale, bias}) match the ``nn.BatchNorm`` subset this repo uses, so
    torch_interop mappings are unchanged.
    """

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    use_bias: bool = True
    use_scale: bool = True
    dtype: jnp.dtype | None = None
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        features = x.shape[-1]
        reduce_axes = tuple(range(x.ndim - 1))
        ra_mean = self.variable(
            "batch_stats", "mean", nn.initializers.zeros, None, (features,), jnp.float32
        )
        ra_var = self.variable(
            "batch_stats", "var", nn.initializers.ones, None, (features,), jnp.float32
        )
        xf = x.astype(jnp.float32)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean = jnp.mean(xf, axis=reduce_axes)
            mean2 = jnp.mean(jnp.square(xf), axis=reduce_axes)
            n = 1
            for a in reduce_axes:
                n *= x.shape[a]
            # flax's nn.BatchNorm also skips the cross-replica sync while
            # initializing (no named axis is bound during init).
            if self.axis_name is not None and not self.is_initializing():
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
                n = n * jax.lax.psum(1, self.axis_name)
            elif n <= 1 and not self.is_initializing():
                # torch raises "Expected more than 1 value per channel when
                # training" here; a silent n=1 step would zero the variance
                # and decay running_var toward 0.
                raise ValueError(
                    "TorchBatchNorm in train mode needs >1 value per channel; "
                    f"got reduce count {n} for input shape {x.shape}"
                )
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                # torch F.batch_norm: running_var gets the unbiased estimate
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * unbiased
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale:
            scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
            y = y * scale
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
            y = y + bias
        return y.astype(self.dtype or x.dtype)


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
