"""End-to-end MAE engine smoke test on an 8-device CPU mesh."""

import argparse

import jax
import numpy as np
import pytest

from headct_foundation_tpu.config import default_config
from headct_foundation_tpu.engines import mae_engine
from headct_foundation_tpu.parallel.mesh import make_mesh


def _tiny_config(tmp_path):
    cfg = default_config()
    cfg.MAE.INPUT_SIZE = 24
    cfg.MAE.PATCH_SIZE = 12
    cfg.MAE.IN_CHANS = 1
    cfg.MAE.ENCODER_DEPTH = 2
    cfg.MAE.ENCODER_EMBED_DIM = 48
    cfg.MAE.ENCODER_MLP_DIM = 96
    cfg.MAE.ENCODER_NUM_HEADS = 4
    cfg.MAE.DECODER_DEPTH = 1
    cfg.MAE.DECODER_EMBED_DIM = 36
    cfg.MAE.DECODER_MLP_DIM = 72
    cfg.MAE.DECODER_NUM_HEADS = 4
    cfg.MAE.MASK_RATIO = 0.75
    cfg.MAE.USE_BIAS = True
    cfg.MODEL.ROI = [24, 24, 24]
    cfg.MODEL.DIR = str(tmp_path)
    cfg.MODEL.SAVE_NAME = "tiny.ckpt"
    cfg.TRAIN.GRAD_CLIP = 1.0
    cfg.TRAIN.BASE_LR = 1e-3
    cfg.TRAIN.MIN_LR = 1e-6
    return cfg


def test_mae_train_step_decreases_loss(tmp_path):
    cfg = _tiny_config(tmp_path)
    mesh = make_mesh(data=8)
    rng = jax.random.PRNGKey(0)
    state, shardings, lr_schedule = mae_engine.create_train_state(
        cfg, mesh, rng, total_steps=50, num_warmup_steps=0
    )
    train_step = mae_engine.make_train_step(mesh)

    batch = np.random.RandomState(0).randn(16, 1, 24, 24, 24).astype(np.float32)
    losses = []
    data = mae_engine._to_device_batch(batch, mesh)
    for i in range(10):
        state, metrics = train_step(state, data, rng)
        losses.append(float(jax.device_get(metrics["loss"])))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert int(jax.device_get(state.step)) == 10


def test_grad_accumulation_matches_mean_of_micro_grads(tmp_path):
    """TRAIN.ACCUM_STEPS=2 must apply exactly the mean of the two
    micro-batch gradients (same per-micro rng derivation) in one update."""
    import jax.numpy as jnp

    cfg = _tiny_config(tmp_path)
    cfg.TRAIN.GRAD_CLIP = 0.0   # clip is nonlinear across grads; keep it off
    cfg.TRAIN.OPTIMIZER = "SGD"  # linear in grads -> tight comparison
    cfg.TRAIN.MOMENTUM = 0.0     # (Adam's sign-like step amplifies bf16
    cfg.TRAIN.WEIGHT_DECAY = 0.0  # reduction noise on near-zero grads)
    mesh = make_mesh(data=8)
    rng = jax.random.PRNGKey(3)
    state, _, _ = mae_engine.create_train_state(
        cfg, mesh, rng, total_steps=50, num_warmup_steps=0
    )
    step = mae_engine.make_train_step(mesh, accum_steps=2)

    batch = np.random.RandomState(1).randn(16, 1, 24, 24, 24).astype(np.float32)
    data = mae_engine._to_device_batch(batch, mesh)

    # replicate the step's rng derivation to compute the micro grads manually
    params0 = jax.device_get(state.params)
    step_rng = jax.random.fold_in(rng, state.step)
    micros = np.asarray(jax.device_get(data), np.float32).reshape(
        2, 8, 1, 24, 24, 24
    )
    grads = []
    losses = []
    for i in range(2):
        micro_rng = jax.random.fold_in(step_rng, i)
        mask_rng, drop_rng = jax.random.split(micro_rng)

        def loss_fn(p, mb=micros[i], mr=mask_rng, dr=drop_rng):
            loss, _, _ = state.apply_fn(
                {"params": p}, jnp.asarray(mb, jnp.bfloat16),
                deterministic=False, rngs={"mask": mr, "dropout": dr},
            )
            return loss

        l, g = jax.value_and_grad(loss_fn)(state.params)
        losses.append(float(l))
        grads.append(jax.device_get(g))
    mean_grads = jax.tree.map(lambda a, b: (a + b) / 2, *grads)
    expected = jax.device_get(
        state.apply_gradients(grads=jax.tree.map(jnp.asarray, mean_grads)).params
    )

    new_state, metrics = step(state, data, rng)
    np.testing.assert_allclose(
        float(jax.device_get(metrics["loss"])), np.mean(losses), rtol=1e-5
    )
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(expected)[0],
        jax.tree_util.tree_flatten_with_path(jax.device_get(new_state.params))[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, err_msg=str(pa)
        )


def test_mae_sincos_params_frozen(tmp_path):
    cfg = _tiny_config(tmp_path)
    mesh = make_mesh(data=8)
    rng = jax.random.PRNGKey(0)
    state, _, _ = mae_engine.create_train_state(
        cfg, mesh, rng, total_steps=10, num_warmup_steps=0
    )
    train_step = mae_engine.make_train_step(mesh)
    pe_before = np.asarray(
        jax.device_get(state.params["patch_embedding"]["position_embeddings"])
    )
    dec_before = np.asarray(jax.device_get(state.params["decoder_pos_embed"]))
    batch = mae_engine._to_device_batch(
        np.random.RandomState(1).randn(8, 1, 24, 24, 24).astype(np.float32), mesh
    )
    state, _ = train_step(state, batch, rng)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(state.params["patch_embedding"]["position_embeddings"])),
        pe_before,
    )
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(state.params["decoder_pos_embed"])), dec_before
    )


def test_checkpoint_roundtrip(tmp_path):
    from headct_foundation_tpu.utils.checkpoint import (
        load_checkpoint,
        restore_state,
        save_checkpoint,
    )

    cfg = _tiny_config(tmp_path)
    mesh = make_mesh(data=8)
    rng = jax.random.PRNGKey(0)
    state, _, _ = mae_engine.create_train_state(
        cfg, mesh, rng, total_steps=10, num_warmup_steps=0
    )
    train_step = mae_engine.make_train_step(mesh)
    batch = mae_engine._to_device_batch(
        np.random.RandomState(1).randn(8, 1, 24, 24, 24).astype(np.float32), mesh
    )
    state, _ = train_step(state, batch, rng)
    path = save_checkpoint(state, epoch=3, best_loss=0.5, dir_add=str(tmp_path),
                           filename="ckpt.pkl")

    # fresh state, then restore
    state2, _, _ = mae_engine.create_train_state(
        cfg, mesh, jax.random.PRNGKey(7), total_steps=10, num_warmup_steps=0
    )
    payload = load_checkpoint(path)
    state2, epoch, best = restore_state(state2, payload)
    assert epoch == 3 and best == 0.5
    a = jax.device_get(state.params["cls_token"])
    b = jax.device_get(state2.params["cls_token"])
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored state still steps
    state2, m = train_step(state2, batch, rng)
    assert np.isfinite(float(jax.device_get(m["loss"])))
