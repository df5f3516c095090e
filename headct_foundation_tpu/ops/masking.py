"""Device-side uniform random token masking for MAE.

Matches the reference algorithm (reference: src/models/mae.py:194-218):
sample iid uniform noise per token, argsort to get a shuffle, keep the first
``len_keep`` tokens, and derive the binary mask + restore indices. Runs
entirely on-device inside the jitted train step (the reference does the same
on GPU); ``argsort`` over [B, 512] lowers to an efficient XLA sort.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def random_masking(
    rng: jax.Array, x: jnp.ndarray, mask_ratio: float
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Randomly mask tokens.

    Args:
      rng: PRNG key.
      x: token embeddings [N, L, D].
      mask_ratio: fraction of tokens to drop.

    Returns:
      x_masked: [N, len_keep, D] kept tokens.
      mask: [N, L] binary, 1 = masked (removed), in original token order.
      ids_restore: [N, L] indices that unshuffle a shuffled sequence.
      ids_keep: [N, len_keep] indices of kept tokens.
    """
    N, L, D = x.shape
    len_keep = int(L * (1 - mask_ratio))

    noise = jax.random.uniform(rng, (N, L))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)

    ids_keep = ids_shuffle[:, :len_keep]
    x_masked = jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)

    mask = jnp.ones((N, L), dtype=x.dtype)
    mask = mask.at[:, :len_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)

    return x_masked, mask, ids_restore, ids_keep
