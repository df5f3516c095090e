"""Optimizers as optax transformations.

Covers the reference's optimizer zoo (reference: src/utils/optimizers.py:344-379):
SGD, AdamW, Lamb, Lion — plus the per-parameter gradient clipping the engines
apply before every step (reference: src/utils/misc.py:374-383 clips each
parameter's grad norm independently, not the global norm).

TPU notes: all updates are elementwise pytree ops that XLA fuses into a
handful of kernels; the Lion update additionally has a hand-written Pallas
kernel (ops/lion_kernel.py) mirroring the reference's Triton kernel
(reference: src/utils/triton.py:26-107), selectable with ``use_pallas=True``.

Weight decay follows torch.optim.AdamW semantics (decoupled, applied to every
parameter in the group — the reference passes a single param group). For DINO
the weight decay is a per-step schedule; ``scheduled_weight_decay`` threads it
through an optax transform keyed on the step count.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import optax

ScalarOrSchedule = Union[float, Callable[[jnp.ndarray], jnp.ndarray]]


def _call(s: ScalarOrSchedule, step: jnp.ndarray) -> jnp.ndarray:
    return s(step) if callable(s) else jnp.asarray(s, jnp.float32)


# ---------------------------------------------------------------------------
# Per-parameter gradient clipping (reference clip_gradients semantics)
# ---------------------------------------------------------------------------

def clip_by_per_param_norm(clip: float, eps: float = 1e-6) -> optax.GradientTransformation:
    """Clip every parameter's gradient to L2 norm <= clip, independently."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def _clip(g):
            norm = jnp.linalg.norm(g.astype(jnp.float32))
            coef = jnp.minimum(clip / (norm + eps), 1.0)
            return (g.astype(jnp.float32) * coef).astype(g.dtype)

        return jax.tree.map(_clip, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


# ---------------------------------------------------------------------------
# Scheduled decoupled weight decay
# ---------------------------------------------------------------------------

class ScheduledWDState(NamedTuple):
    count: jnp.ndarray


def scheduled_weight_decay(wd: ScalarOrSchedule) -> optax.GradientTransformation:
    """Adds wd(step) * param to the update (decoupled weight decay)."""

    def init_fn(params):
        del params
        return ScheduledWDState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("scheduled_weight_decay requires params")
        w = _call(wd, state.count)
        updates = jax.tree.map(
            lambda u, p: u + w * p.astype(u.dtype), updates, params
        )
        return updates, ScheduledWDState(count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


# ---------------------------------------------------------------------------
# Lamb (trust-ratio) — with optional reference-quirk compatibility
# ---------------------------------------------------------------------------

class LambState(NamedTuple):
    count: jnp.ndarray
    exp_avg: Any
    exp_avg_sq: Any


def scale_by_lamb(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
    weight_decay: ScalarOrSchedule = 0.0,
    exp_avg_quirk: bool = False,
) -> optax.GradientTransformation:
    """Lamb update (arXiv 1904.00962, no bias correction, trust ratio).

    ``exp_avg_quirk=True`` reproduces the reference's first-moment update
    ``m = b1*m + (1-b1)*g*g`` (reference: src/utils/optimizers.py:120 uses
    addcmul_(grad, grad)); the default is the correct ``m = b1*m + (1-b1)*g``
    as in the paper and the reference's own JITLamb (optimizers.py:157).
    """

    def init_fn(params):
        zeros = jax.tree.map(lambda p: jnp.zeros_like(p, dtype=jnp.float32), params)
        return LambState(
            count=jnp.zeros([], jnp.int32),
            exp_avg=zeros,
            exp_avg_sq=jax.tree.map(jnp.copy, zeros),
        )

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("lamb requires params")
        wd = _call(weight_decay, state.count)

        def _moments(g, m, v):
            g = g.astype(jnp.float32)
            m_new = m * b1 + (1 - b1) * (g * g if exp_avg_quirk else g)
            v_new = v * b2 + (1 - b2) * g * g
            return m_new, v_new

        new = jax.tree.map(
            lambda g, m, v: _moments(g, m, v), updates, state.exp_avg, state.exp_avg_sq,
            is_leaf=lambda x: isinstance(x, jnp.ndarray),
        )
        exp_avg = jax.tree.map(lambda t: t[0], new, is_leaf=lambda x: type(x) is tuple)
        exp_avg_sq = jax.tree.map(lambda t: t[1], new, is_leaf=lambda x: type(x) is tuple)

        def _update(p, m, v):
            adam_step = m / (jnp.sqrt(v) + eps)
            adam_step = adam_step + wd * p.astype(jnp.float32)
            w_norm = jnp.clip(jnp.linalg.norm(p.astype(jnp.float32)), 0.0, 10.0)
            a_norm = jnp.linalg.norm(adam_step)
            trust = jnp.where(
                (w_norm == 0.0) | (a_norm == 0.0), 1.0, w_norm / (a_norm + eps)
            )
            return (trust * adam_step).astype(p.dtype)

        updates = jax.tree.map(_update, params, exp_avg, exp_avg_sq)
        return updates, LambState(state.count + 1, exp_avg, exp_avg_sq)

    return optax.GradientTransformation(init_fn, update_fn)


# ---------------------------------------------------------------------------
# Lion — sign-momentum update (reference: optimizers.py:267-342)
# ---------------------------------------------------------------------------

class LionState(NamedTuple):
    count: jnp.ndarray
    exp_avg: Any


def scale_by_lion_with_wd(
    lr: ScalarOrSchedule,
    b1: float = 0.9,
    b2: float = 0.99,
    weight_decay: ScalarOrSchedule = 0.0,
    use_pallas: bool = False,
) -> optax.GradientTransformation:
    """Full Lion update including stepweight decay, emitting the final delta.

    Matches the reference ``update_fn`` (optimizers.py:267-279):
      p <- p * (1 - lr*wd) - lr * sign(b1*m + (1-b1)*g)
      m <- b2*m + (1-b2)*g
    Returned updates are the total delta (p_new - p), so apply with
    ``optax.apply_updates`` directly (no extra scale_by_learning_rate).
    """

    def init_fn(params):
        return LionState(
            count=jnp.zeros([], jnp.int32),
            exp_avg=jax.tree.map(lambda p: jnp.zeros_like(p, dtype=jnp.float32), params),
        )

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("lion requires params")
        lr_t = _call(lr, state.count)
        wd_t = _call(weight_decay, state.count)

        if use_pallas:
            from headct_foundation_tpu.ops.lion_kernel import lion_update_leaf

            def _leaf(p, g, m):
                return lion_update_leaf(p, g, m, lr_t, wd_t, b1, b2)
        else:
            def _leaf(p, g, m):
                p32 = p.astype(jnp.float32)
                g32 = g.astype(jnp.float32)
                update = jnp.sign(m * b1 + (1 - b1) * g32)
                delta = -lr_t * wd_t * p32 - lr_t * update
                m_new = m * b2 + (1 - b2) * g32
                return delta.astype(p.dtype), m_new

        out = jax.tree.map(_leaf, params, updates, state.exp_avg)
        deltas = jax.tree.map(lambda t: t[0], out, is_leaf=lambda x: type(x) is tuple)
        exp_avg = jax.tree.map(lambda t: t[1], out, is_leaf=lambda x: type(x) is tuple)
        return deltas, LionState(state.count + 1, exp_avg)

    return optax.GradientTransformation(init_fn, update_fn)


# ---------------------------------------------------------------------------
# Factory (reference: get_optimizer, optimizers.py:344-379)
# ---------------------------------------------------------------------------

def get_optimizer(
    config,
    lr: ScalarOrSchedule,
    weight_decay: Optional[ScalarOrSchedule] = None,
    grad_clip: Optional[float] = None,
    trainable_mask: Optional[Any] = None,
) -> optax.GradientTransformation:
    """Build the configured optimizer chain.

    Args:
      config: merged CfgNode (TRAIN.OPTIMIZER etc.).
      lr: scalar or step schedule.
      weight_decay: scalar or step schedule; defaults to TRAIN.WEIGHT_DECAY.
      grad_clip: per-param clip threshold (reference clip_gradients); the
        engines pass TRAIN.GRAD_CLIP when nonzero.
      trainable_mask: pytree of bools (True = trainable). Frozen leaves
        (sincos position embeddings, DINO weight_g, locked backbones) get
        zero updates, mirroring requires_grad=False in the reference.
    """
    name = config.TRAIN.OPTIMIZER
    if weight_decay is None:
        weight_decay = config.TRAIN.WEIGHT_DECAY

    parts = []
    if grad_clip:
        parts.append(clip_by_per_param_norm(grad_clip))

    if name == "SGD":
        # Reference SGD has weight decay commented out (optimizers.py:352).
        parts += [
            optax.trace(decay=config.TRAIN.MOMENTUM, nesterov=False),
            optax.scale_by_learning_rate(lr),
        ]
    elif name == "AdamW":
        parts += [
            optax.scale_by_adam(b1=config.TRAIN.BETA1, b2=config.TRAIN.BETA2, eps=1e-8),
            scheduled_weight_decay(weight_decay),
            optax.scale_by_learning_rate(lr),
        ]
    elif name == "Lamb":
        parts += [
            scale_by_lamb(
                b1=config.TRAIN.BETA1,
                b2=config.TRAIN.BETA2,
                weight_decay=weight_decay,
            ),
            optax.scale_by_learning_rate(lr),
        ]
    elif name == "Lion":
        parts += [
            scale_by_lion_with_wd(
                lr=lr,
                b1=config.TRAIN.BETA1,
                b2=config.TRAIN.BETA2,
                weight_decay=weight_decay,
                # Fused Pallas kernel, the reference's Lion(use_triton=True)
                # (reference: src/utils/optimizers.py:305-307).
                use_pallas=bool(getattr(config.TRAIN, "LION_FUSED", False)),
            ),
            # scale_by_lion_with_wd already emits the final signed delta —
            # no scale_by_learning_rate here (the LR lives inside the
            # transform's schedule).
        ]
    else:
        raise NotImplementedError(f"Unknown optimizer: {name}")

    tx = optax.chain(*parts)
    if trainable_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            jax.tree.map(lambda t: "train" if t else "freeze", trainable_mask),
        )
    return tx
