"""Downstream engine smoke tests on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from headct_foundation_tpu.config import default_config
from headct_foundation_tpu.engines import downstream_engine
from headct_foundation_tpu.parallel.mesh import make_mesh


def _tiny_config(tmp_path, classifier="linear", lock=False, lora=False):
    cfg = default_config()
    cfg.MODEL.ROI = [24, 24, 24]
    cfg.MODEL.IN_CHANS = 1
    cfg.MODEL.DIR = str(tmp_path)
    cfg.MODEL.SAVE_NAME = "ds_tiny.ckpt"
    cfg.VIT.INPUT_SIZE = 24
    cfg.VIT.PATCH_SIZE = 12
    cfg.VIT.IN_CHANS = 1
    cfg.VIT.HIDDEN_SIZE = 48
    cfg.VIT.MLP_DIM = 96
    cfg.VIT.NUM_LAYERS = 2
    cfg.VIT.NUM_HEADS = 4
    cfg.VIT.USE_BIAS = True
    cfg.DATA.NUM_CLASSES = 2
    cfg.TRAIN.CLASSIFIER = classifier
    cfg.TRAIN.LOCK = lock
    cfg.TRAIN.LORA = lora
    cfg.TRAIN.GRAD_CLIP = 1.0
    cfg.TRAIN.BASE_LR = 1e-3
    return cfg


def _data(b=8):
    rng = np.random.RandomState(0)
    return (
        rng.rand(b, 1, 24, 24, 24).astype(np.float32),
        rng.randint(0, 2, size=b).astype(np.int32),
    )


@pytest.mark.parametrize("classifier", ["linear", "attentive"])
def test_train_step(tmp_path, classifier):
    cfg = _tiny_config(tmp_path, classifier=classifier)
    mesh = make_mesh(data=8)
    rng = jax.random.PRNGKey(0)
    state, _, _ = downstream_engine.create_train_state(cfg, mesh, rng, 10, 0)
    step = downstream_engine.make_train_step(cfg, mesh)
    vols, targets = _data()
    data = downstream_engine._to_device(vols, mesh, np.float32)
    tgt = downstream_engine._to_device(targets, mesh, np.int32)
    losses = []
    for _ in range(3):
        state, m = step(state, data, tgt, rng)
        losses.append(float(jax.device_get(m["loss"])))
    assert all(np.isfinite(losses)), losses
    probs = np.asarray(jax.device_get(m["probs"]))
    assert probs.shape == (8, 2)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)


def test_lock_freezes_backbone(tmp_path):
    cfg = _tiny_config(tmp_path, lock=True)
    mesh = make_mesh(data=8)
    rng = jax.random.PRNGKey(0)
    state, _, _ = downstream_engine.create_train_state(cfg, mesh, rng, 10, 0)
    step = downstream_engine.make_train_step(cfg, mesh)
    vols, targets = _data()
    data = downstream_engine._to_device(vols, mesh, np.float32)
    tgt = downstream_engine._to_device(targets, mesh, np.int32)
    before = jax.device_get(state.params["model"])
    clf_before = jax.device_get(state.params["classifier"])
    state, _ = step(state, data, tgt, rng)
    after = jax.device_get(state.params["model"])
    clf_after = jax.device_get(state.params["classifier"])
    # backbone untouched
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # classifier moved
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(clf_before), jax.tree.leaves(clf_after))
    )
    assert moved


def test_lora_mask_restricts_updates(tmp_path):
    cfg = _tiny_config(tmp_path, lora=True)
    mesh = make_mesh(data=8)
    rng = jax.random.PRNGKey(0)
    state, _, _ = downstream_engine.create_train_state(cfg, mesh, rng, 10, 0)
    step = downstream_engine.make_train_step(cfg, mesh)
    vols, targets = _data()
    data = downstream_engine._to_device(vols, mesh, np.float32)
    tgt = downstream_engine._to_device(targets, mesh, np.int32)
    before = jax.device_get(state.params["model"])
    state, _ = step(state, data, tgt, rng)
    after = jax.device_get(state.params["model"])

    import jax.tree_util as jtu

    flat_b = jtu.tree_flatten_with_path(before)[0]
    flat_a = jtu.tree_flatten_with_path(after)[0]
    for (path, b), (_, a) in zip(flat_b, flat_a):
        joined = "/".join(str(getattr(k, "key", k)) for k in path).lower()
        trainable = any(s in joined for s in ("lora", "bias", "embeddings", "norm"))
        if not trainable:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=joined)
    # lora matrices must have moved (lora_matrix_A fixed-random, B zero-init ->
    # gradient flows to B at least after first step... check any lora leaf moved)
    lora_moved = any(
        "lora" in "/".join(str(getattr(k, "key", k)) for k in path).lower()
        and not np.array_equal(np.asarray(a), np.asarray(b))
        for ((path, b), (_, a)) in zip(flat_b, flat_a)
    )
    assert lora_moved


def test_trainer_and_tester(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = _tiny_config(tmp_path)
    cfg.PREDS_SAVE_NAME = "testrun"
    mesh = make_mesh(data=8)
    rng = jax.random.PRNGKey(0)
    state, _, _ = downstream_engine.create_train_state(cfg, mesh, rng, 4, 1)
    train_step = downstream_engine.make_train_step(cfg, mesh)
    eval_step = downstream_engine.make_eval_step(cfg, mesh)

    vols, targets = _data()

    class Loader:
        def __len__(self):
            return 2

        def __iter__(self):
            for i in range(2):
                yield vols, targets, [f"f{i}_{j}" for j in range(len(targets))]

    state, best, best_auroc = downstream_engine.trainer(
        cfg, state, train_step, eval_step, Loader(), Loader(), mesh, rng,
        max_epochs=2, val_every=1,
    )
    assert np.isfinite(best_auroc)
    stats = downstream_engine.tester(cfg, state, eval_step, Loader(), mesh)
    assert "mean_auroc" in stats
    import os

    assert os.path.exists(tmp_path / "preds_pkl" / "testrun_preds.pkl")
    assert os.path.exists(tmp_path / "plots" / "roc_pr_curve_plot_testrun.png")


def test_local_rows_dedupes_replicated_shards():
    """Under a tensor-parallel mesh, per-sample outputs are REPLICATED over
    the 'tensor' axis; _local_rows must reassemble by global index (not
    concatenate replicas) or metrics silently misalign."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from headct_foundation_tpu.engines.downstream_engine import _local_rows
    from headct_foundation_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=4, tensor=2)
    probs = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    garr = jax.device_put(
        jnp.asarray(probs), NamedSharding(mesh, P(("data", "fsdp")))
    )
    # each row appears once per tensor replica in addressable_shards
    assert len(garr.addressable_shards) == 8
    out = _local_rows(garr, 7)
    np.testing.assert_array_equal(out, probs[:7])


def test_backbone_dropout_active_in_training_only(tmp_path):
    """With VIT.DROPOUT_RATE > 0 the TRAIN step must run backbone dropout
    (the reference trains in .train() mode, engine_downstream.py:65) while
    eval stays deterministic (.eval() parity). Regression for a bug where
    the downstream/DINO forwards never passed deterministic=False, silently
    disabling configured dropout."""
    cfg = _tiny_config(tmp_path)
    cfg.VIT.DROPOUT_RATE = 0.5
    mesh = make_mesh(data=8)
    state, _, _ = downstream_engine.create_train_state(
        cfg, mesh, jax.random.PRNGKey(0), 10, 0
    )
    step = downstream_engine.make_train_step(cfg, mesh)
    eval_step = downstream_engine.make_eval_step(cfg, mesh)
    vols, targets = _data()
    data = downstream_engine._to_device(vols, mesh, np.float32)
    tgt = downstream_engine._to_device(targets, mesh, np.int32)

    # two different rngs from the SAME state/batch: dropout must change loss
    # (the jitted step donates the state, so give each call its own copy)
    _, m1 = step(jax.tree.map(jnp.copy, state), data, tgt, jax.random.PRNGKey(1))
    _, m2 = step(jax.tree.map(jnp.copy, state), data, tgt, jax.random.PRNGKey(2))
    l1, l2 = float(jax.device_get(m1["loss"])), float(jax.device_get(m2["loss"]))
    assert np.isfinite([l1, l2]).all()
    assert l1 != l2, "dropout inactive: identical losses under different rngs"

    # eval: no rng, deterministic regardless of dropout rate
    e1 = float(jax.device_get(eval_step(state, data, tgt)["loss"]))
    e2 = float(jax.device_get(eval_step(state, data, tgt)["loss"]))
    assert e1 == e2
