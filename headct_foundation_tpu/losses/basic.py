"""Elementary reconstruction losses (reference: src/losses/losses.py:14-43).

Defined for API parity; the three CLI mains do not use them (MAE's loss lives
in the model), matching the reference.
"""

from __future__ import annotations

import jax.numpy as jnp


def l2_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(jnp.square(x - y)) / y.size


def l1_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(jnp.abs(x - y)) / y.size


def kl_divergence(z_mean: jnp.ndarray, z_log_sigma: jnp.ndarray) -> jnp.ndarray:
    z_log_var = z_log_sigma * 2.0
    return 0.5 * jnp.sum(jnp.square(z_mean) + jnp.exp(z_log_var) - z_log_var - 1.0)
