"""Multi-crop forward helper for DINO.

The reference wraps backbone+head in ``MultiCropWrapper`` which groups crops
by equal spatial size and runs one backbone pass per group (reference:
src/utils/misc.py:447-484). In this pipeline all crops are resized to the same
final size (reference: src/data/transforms.py:75,84,97 — everything lands on
96^3), so grouping collapses to a single batched forward of shape
[ncrops * B, C, R, R, R]: better for the TPU (one big MXU-saturating batch,
one compile) than the reference's size-grouped loop.

This is a pure function over (apply_fn, params) rather than a module: the DINO
engine calls it for the student (all crops) and the teacher (2 global crops)
with different parameter trees.
"""

from __future__ import annotations

from typing import Any, Callable, List, Sequence

import jax.numpy as jnp


def multicrop_forward(
    backbone_apply: Callable[..., Any],
    head_apply: Callable[..., Any],
    crops: Sequence[jnp.ndarray],
) -> jnp.ndarray:
    """Run backbone+head over a list of crops, grouped by spatial size.

    Args:
      backbone_apply: fn(batch) -> (tokens [N, T, C], hidden_states).
      head_apply: fn(cls_features [N, C]) -> head output.
      crops: list of [B, C, H, W, D] crop batches.

    Returns:
      head output over all crops concatenated along batch:
      [len(crops) * B, out_dim]. Crop order is preserved.
    """
    # Group consecutive crops of equal spatial size (static python control
    # flow — crop shapes are known at trace time).
    outputs: List[jnp.ndarray] = []
    start = 0
    n = len(crops)
    while start < n:
        end = start
        shape = crops[start].shape[2:]  # FULL spatial shape, not just depth
        while end < n and crops[end].shape[2:] == shape:
            end += 1
        batch = jnp.concatenate(list(crops[start:end]), axis=0)
        tokens, _ = backbone_apply(batch)
        outputs.append(tokens[:, 0, :])  # CLS feature per crop
        start = end
    features = jnp.concatenate(outputs, axis=0)
    return head_apply(features)
