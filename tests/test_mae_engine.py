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
