"""Optimizer and schedule parity tests against the reference formulas."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from headct_foundation_tpu.config import default_config
from headct_foundation_tpu.optim.lr_sched import (
    constant_schedule_with_warmup,
    cosine_schedule_with_warmup,
    polynomial_schedule_with_warmup,
)
from headct_foundation_tpu.optim.optimizers import (
    clip_by_per_param_norm,
    get_optimizer,
    scale_by_lamb,
    scheduled_weight_decay,
)
from headct_foundation_tpu.optim.schedules import cosine_scheduler


def _ref_cosine(step, base_lr, warmup, total, lr_end, num_cycles=0.5):
    """Reference formula (lr_sched.py:46-53)."""
    if step < warmup:
        return step / max(1, warmup) * base_lr
    progress = (step - warmup) / max(1, total - warmup)
    lr_new = lr_end + (base_lr - lr_end) * 0.5 * (
        1.0 + math.cos(math.pi * num_cycles * 2.0 * progress)
    )
    return max(0.0, lr_new)


def test_cosine_schedule_matches_reference_formula():
    sched = cosine_schedule_with_warmup(1e-3, 10, 100, lr_end=1e-6)
    for step in [0, 1, 5, 10, 11, 50, 99, 100]:
        np.testing.assert_allclose(
            float(sched(step)), _ref_cosine(step, 1e-3, 10, 100, 1e-6),
            rtol=1e-5, atol=1e-10,
            err_msg=f"step {step}",
        )


def test_polynomial_schedule():
    sched = polynomial_schedule_with_warmup(1e-3, 10, 100, lr_end=1e-7, power=2.0)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(10)), 1e-3, rtol=1e-6)
    # beyond total steps -> lr_end
    np.testing.assert_allclose(float(sched(150)), 1e-7, rtol=1e-5)
    # reference formula at mid-point
    pct = 1 - (55 - 10) / 90
    ref = (1e-3 - 1e-7) * pct**2 + 1e-7
    np.testing.assert_allclose(float(sched(55)), ref, rtol=1e-6)


def test_constant_schedule():
    sched = constant_schedule_with_warmup(2e-4, 4)
    np.testing.assert_allclose(float(sched(2)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(100)), 2e-4, rtol=1e-6)


def test_cosine_scheduler_array():
    """Reference misc.py:414-425 semantics: warmup then half cosine."""
    s = cosine_scheduler(0.9, 1.0, epochs=10, niter_per_ep=5, warmup_epochs=2,
                         start_warmup_value=0.0)
    assert len(s) == 50
    np.testing.assert_allclose(s[0], 0.0)
    np.testing.assert_allclose(s[9], 0.9, rtol=1e-6)  # end of warmup
    np.testing.assert_allclose(s[10], 1.0 + 0.5 * (0.9 - 1.0) * 2, rtol=1e-6)  # cos(0)
    np.testing.assert_allclose(s[-1], 1.0, atol=1e-3)


def test_clip_by_per_param_norm():
    tx = clip_by_per_param_norm(1.0)
    grads = {"a": jnp.full((4,), 10.0), "b": jnp.full((4,), 0.01)}
    updates, _ = tx.update(grads, tx.init(grads))
    # 'a' clipped to norm ~1, 'b' untouched
    np.testing.assert_allclose(float(jnp.linalg.norm(updates["a"])), 1.0, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(updates["b"]), 0.01, rtol=1e-5)


def test_scheduled_weight_decay():
    wd = scheduled_weight_decay(lambda step: 0.1 * (step + 1))
    params = {"w": jnp.ones((2,))}
    state = wd.init(params)
    up, state = wd.update({"w": jnp.zeros((2,))}, state, params)
    np.testing.assert_allclose(np.asarray(up["w"]), 0.1)
    up, state = wd.update({"w": jnp.zeros((2,))}, state, params)
    np.testing.assert_allclose(np.asarray(up["w"]), 0.2)


@pytest.mark.parametrize("quirk", [False, True])
def test_lamb_update(quirk):
    tx = scale_by_lamb(b1=0.9, b2=0.999, eps=1e-6, weight_decay=0.01,
                       exp_avg_quirk=quirk)
    params = {"w": jnp.asarray([1.0, -2.0, 3.0])}
    grads = {"w": jnp.asarray([0.1, 0.2, -0.3])}
    state = tx.init(params)
    updates, state = tx.update(grads, state, params)
    g = np.asarray([0.1, 0.2, -0.3])
    p = np.asarray([1.0, -2.0, 3.0])
    m = 0.1 * (g * g) if quirk else 0.1 * g
    v = 0.001 * g * g
    adam = m / (np.sqrt(v) + 1e-6) + 0.01 * p
    w_norm = min(np.linalg.norm(p), 10.0)
    trust = w_norm / (np.linalg.norm(adam) + 1e-6)
    np.testing.assert_allclose(np.asarray(updates["w"]), trust * adam, rtol=1e-5)


def test_get_optimizer_sgd_adamw_lion_run():
    cfg = default_config()
    params = {"w": jnp.ones((8, 8)), "b": jnp.zeros((8,))}
    grads = jax.tree.map(lambda p: jnp.ones_like(p) * 0.1, params)
    for name in ["SGD", "AdamW", "Lamb", "Lion"]:
        cfg.defrost()
        cfg.TRAIN.OPTIMIZER = name
        tx = get_optimizer(cfg, 1e-3, grad_clip=1.0)
        state = tx.init(params)
        updates, _ = tx.update(grads, state, params)
        new = optax.apply_updates(params, updates)
        assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(new)), name
        moved = any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(new))
        )
        assert moved, name


def test_unknown_optimizer_raises():
    cfg = default_config()
    cfg.TRAIN.OPTIMIZER = "Adafactor"
    with pytest.raises(NotImplementedError):
        get_optimizer(cfg, 1e-3)
