"""DINO projection head.

Parity with the reference (reference: src/models/dino_head.py:7-41): an
nlayers MLP (GELU, optional BatchNorm) -> L2 normalize -> weight-normalized
final linear onto 65,536 prototypes. torch's ``weight_norm`` split into
``weight_g``/``weight_v`` is reproduced explicitly as two parameters so that
(a) reference checkpoints map 1:1 and (b) freezing the gain when
``norm_last_layer=True`` (reference: dino_head.py:27-29) is a simple optimizer
mask on ``last_layer/weight_g``.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from headct_foundation_tpu.models.attention import _gelu
from headct_foundation_tpu.models.layers import TorchBatchNorm, trunc_normal_init


class WeightNormDense(nn.Module):
    """Linear layer with torch-style weight normalization (dim=0), no bias."""

    in_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # weight_v: [out, in] like torch's Linear.weight; weight_g: [out, 1].
        v = self.param(
            "weight_v", trunc_normal_init(0.02), (self.out_dim, self.in_dim), self.param_dtype
        )
        g = self.param("weight_g", nn.initializers.ones, (self.out_dim, 1), self.param_dtype)
        # fp32 norm for stability, then cast for the MXU matmul.
        v32 = v.astype(jnp.float32)
        w = (g.astype(jnp.float32) * v32 / jnp.linalg.norm(v32, axis=1, keepdims=True))
        return x.astype(self.dtype) @ w.astype(self.dtype).T


class DINOHead(nn.Module):
    in_dim: int
    out_dim: int
    use_bn: bool = False
    norm_last_layer: bool = True  # consumed by the optimizer mask, kept for parity
    nlayers: int = 3
    hidden_dim: int = 2048
    bottleneck_dim: int = 256
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 use_running_average: bool = True) -> jnp.ndarray:
        nlayers = max(self.nlayers, 1)
        dense_kwargs = dict(
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=trunc_normal_init(0.02),
        )
        if nlayers == 1:
            x = nn.Dense(self.bottleneck_dim, name="mlp_0", **dense_kwargs)(x)
        else:
            x = nn.Dense(self.hidden_dim, name="mlp_0", **dense_kwargs)(x)
            if self.use_bn:
                x = TorchBatchNorm(
                    use_running_average=use_running_average,
                    momentum=0.9,
                    epsilon=1e-5,
                    dtype=self.dtype,
                    name="mlp_bn_0",
                )(x)
            x = _gelu(x)
            for i in range(nlayers - 2):
                x = nn.Dense(self.hidden_dim, name=f"mlp_{i + 1}", **dense_kwargs)(x)
                if self.use_bn:
                    x = TorchBatchNorm(
                        use_running_average=use_running_average,
                        momentum=0.9,
                        epsilon=1e-5,
                        dtype=self.dtype,
                        name=f"mlp_bn_{i + 1}",
                    )(x)
                x = _gelu(x)
            x = nn.Dense(self.bottleneck_dim, name=f"mlp_{nlayers - 1}", **dense_kwargs)(x)

        # L2-normalize in fp32 (reference: dino_head.py:39).
        x32 = x.astype(jnp.float32)
        x = (x32 / jnp.maximum(jnp.linalg.norm(x32, axis=-1, keepdims=True), 1e-12)).astype(
            self.dtype
        )
        return WeightNormDense(
            in_dim=self.bottleneck_dim,
            out_dim=self.out_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="last_layer",
        )(x)
