"""DINO loss: teacher centering + sharpening cross-entropy over crops.

Functional parity with the reference ``DINOLoss`` (reference:
src/losses/losses.py:46-102):
* teacher temperature schedule — linear warmup then constant,
* teacher softmax((t - center)/temp) over 2 global crops, student
  log-softmax over all crops, CE skipping same-view pairs,
* center EMA (momentum 0.9) over the cross-replica batch mean.

The reference's explicit ``dist.all_reduce`` of the center (losses.py:97)
disappears: under ``jit`` with the batch sharded over the data mesh axis,
``jnp.mean`` over the batch axis IS the global mean — XLA inserts the
collective over ICI. The center is threaded through the train step as
explicit state (no buffers in functional JAX).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def teacher_temp_schedule(
    warmup_teacher_temp: float,
    teacher_temp: float,
    warmup_teacher_temp_epochs: int,
    nepochs: int,
) -> np.ndarray:
    """Per-epoch teacher temperature (reference: losses.py:57-61)."""
    return np.concatenate(
        [
            np.linspace(warmup_teacher_temp, teacher_temp, warmup_teacher_temp_epochs),
            np.ones(max(nepochs - warmup_teacher_temp_epochs, 0)) * teacher_temp,
        ]
    )


def dino_loss(
    student_output: jnp.ndarray,
    teacher_output: jnp.ndarray,
    center: jnp.ndarray,
    temp: jnp.ndarray,
    ncrops: int,
    student_temp: float = 0.1,
) -> jnp.ndarray:
    """Cross-entropy between teacher and student crop distributions.

    Args:
      student_output: [ncrops * B, K] head logits for all student crops.
      teacher_output: [2 * B, K] head logits for the 2 global teacher crops.
      center: [1, K] running center.
      temp: scalar teacher temperature for this epoch.
      ncrops: number of student crops (2 global + N local).

    Returns:
      scalar loss (mean over valid teacher/student view pairs).
    """
    student_out = (student_output.astype(jnp.float32) / student_temp)
    student_chunks = jnp.split(student_out, ncrops, axis=0)

    teacher_logits = (teacher_output.astype(jnp.float32) - center) / temp
    teacher_probs = jax.nn.softmax(teacher_logits, axis=-1)
    teacher_chunks = jnp.split(jax.lax.stop_gradient(teacher_probs), 2, axis=0)

    total_loss = 0.0
    n_terms = 0
    for iq, q in enumerate(teacher_chunks):
        for v in range(ncrops):
            if v == iq:
                continue  # skip same-view pairs (reference: losses.py:80-82)
            logp = jax.nn.log_softmax(student_chunks[v], axis=-1)
            loss = jnp.sum(-q * logp, axis=-1)
            total_loss = total_loss + loss.mean()
            n_terms += 1
    return total_loss / n_terms


def update_center(
    center: jnp.ndarray,
    teacher_output: jnp.ndarray,
    center_momentum: float = 0.9,
) -> jnp.ndarray:
    """EMA update of the prototype center (reference: losses.py:91-102).

    ``teacher_output`` is the per-device shard under jit; the mean below is
    the global batch mean once the input is sharded over the data axis.
    """
    batch_center = jnp.mean(
        jax.lax.stop_gradient(teacher_output).astype(jnp.float32), axis=0, keepdims=True
    )
    return center * center_momentum + batch_center * (1.0 - center_momentum)
