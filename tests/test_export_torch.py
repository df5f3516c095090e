"""tools/export_torch: framework checkpoints -> reference-loadable .pt.

Verifies the exported state_dicts follow the reference's torch conventions
(Linear.weight [out, in] = our kernel.T, Conv3d patch embed, blocks.<i>.*,
BN running stats) and that the torch_interop import path reads its own
export back bit-exact — the contract that lets reference tooling consume
checkpoints trained here (reference: src/utils/misc.py:72-96).
"""

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")

from headct_foundation_tpu.config import default_config
from headct_foundation_tpu.parallel.mesh import make_mesh
from headct_foundation_tpu.utils.checkpoint import (
    load_checkpoint,
    restore_state,
    save_checkpoint,
)

from tools.export_torch import detect_part, export


def _leaf(tree, dotted):
    node = tree
    for part in dotted.split("/"):
        node = node[part]
    return np.asarray(node)


def _ds_config(tmp_path):
    cfg = default_config()
    cfg.MODEL.ROI = [24, 24, 24]
    cfg.MODEL.IN_CHANS = 1
    cfg.MODEL.DIR = str(tmp_path)
    cfg.VIT.INPUT_SIZE = 24
    cfg.VIT.PATCH_SIZE = 12
    cfg.VIT.IN_CHANS = 1
    cfg.VIT.HIDDEN_SIZE = 48
    cfg.VIT.MLP_DIM = 96
    cfg.VIT.NUM_LAYERS = 2
    cfg.VIT.NUM_HEADS = 4
    cfg.VIT.USE_BIAS = True
    cfg.DATA.NUM_CLASSES = 2
    cfg.TRAIN.CLASSIFIER = "linear"
    cfg.TRAIN.GRAD_CLIP = 1.0
    cfg.TRAIN.BASE_LR = 1e-3
    return cfg


def test_downstream_ckpt_roundtrip_and_export(tmp_path):
    """Downstream: BN running stats survive save -> restore_state, and the
    export writes backbone + classifier .pt files in reference layout."""
    from headct_foundation_tpu.engines import downstream_engine

    cfg = _ds_config(tmp_path)
    mesh = make_mesh(data=jax.device_count())
    rng = jax.random.PRNGKey(0)
    state, _, _ = downstream_engine.create_train_state(cfg, mesh, rng, 10, 0)
    step = downstream_engine.make_train_step(cfg, mesh)
    vols = np.random.RandomState(0).rand(8, 1, 24, 24, 24).astype(np.float16)
    tgt = np.arange(8, dtype=np.int32) % 2
    data = downstream_engine._to_device(vols, mesh, np.float16)
    t = downstream_engine._to_device(tgt, mesh, np.int32)
    state, _ = step(state, data, t, rng)  # BN stats move off init values

    path = save_checkpoint(
        state, epoch=3, best_loss=0.9, dir_add=str(tmp_path),
        filename="best_ds.ckpt", extra={"batch_stats": state.batch_stats},
    )
    payload = load_checkpoint(path)
    assert "batch_stats" in payload

    # restore into a DIFFERENTLY-initialized state: stats + params come back
    state2, _, _ = downstream_engine.create_train_state(
        cfg, mesh, jax.random.PRNGKey(1), 10, 0
    )
    state2, epoch, best = restore_state(state2, payload)
    assert epoch == 3 and best == 0.9
    jax.tree.map(
        np.testing.assert_array_equal,
        jax.device_get(state.batch_stats), jax.device_get(state2.batch_stats),
    )
    jax.tree.map(
        np.testing.assert_array_equal,
        jax.device_get(state.params), jax.device_get(state2.params),
    )

    assert detect_part(payload["params"]) == "downstream"
    out = str(tmp_path / "ds.pt")
    written = export(path, out)
    assert written == [out, str(tmp_path / "ds_classifier.pt")]

    sd = torch.load(out, weights_only=False)["state_dict"]
    params = jax.device_get(state.params)
    # Linear.weight is [out, in] = our kernel.T (reference torch convention)
    k = _leaf(params, "model/blocks_0/attn/qkv/kernel")
    np.testing.assert_allclose(sd["blocks.0.attn.qkv.weight"].numpy(), k.T)
    # patch embed folds back to a Conv3d weight [O, C, p, p, p]
    assert sd["patch_embedding.patch_embeddings.weight"].shape == (48, 1, 12, 12, 12)

    csd = torch.load(written[1], weights_only=False)["state_dict"]
    stats = jax.device_get(state.batch_stats)["classifier"]
    bn_key = [k for k in csd if k.endswith("running_mean")]
    assert bn_key, list(csd)
    want = _leaf(stats, "bn/mean")
    np.testing.assert_allclose(csd[bn_key[0]].numpy(), want)


def test_mae_export(tmp_path):
    from headct_foundation_tpu.engines import mae_engine

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
    cfg.MODEL.ROI = [24, 24, 24]
    mesh = make_mesh(data=jax.device_count())
    state, _, _ = mae_engine.create_train_state(
        cfg, mesh, jax.random.PRNGKey(0), total_steps=10, num_warmup_steps=0
    )
    path = save_checkpoint(state, 0, 1.0, str(tmp_path), "mae.ckpt")
    payload = load_checkpoint(path)
    assert detect_part(payload["params"]) == "mae"

    out = str(tmp_path / "mae.pt")
    export(path, out)
    sd = torch.load(out, weights_only=False)["state_dict"]
    assert any(k.startswith("decoder_blocks.0.") for k in sd)
    k = _leaf(jax.device_get(state.params), "blocks_1/mlp/linear1/kernel")
    np.testing.assert_allclose(sd["blocks.1.mlp.linear1.weight"].numpy(), k.T)


def test_dino_export_student_and_teacher(tmp_path):
    from headct_foundation_tpu.engines import dino_engine

    cfg = default_config()
    cfg.MODEL.ROI = [24, 24, 24]
    cfg.MODEL.IN_CHANS = 1
    cfg.VIT.INPUT_SIZE = 24
    cfg.VIT.PATCH_SIZE = 12
    cfg.VIT.IN_CHANS = 1
    cfg.VIT.HIDDEN_SIZE = 48
    cfg.VIT.MLP_DIM = 96
    cfg.VIT.NUM_LAYERS = 2
    cfg.VIT.NUM_HEADS = 4
    cfg.VIT.NUM_REGISTER_TOKENS = 2
    cfg.DINO.HEAD_N_PROTOTYPES = 128
    cfg.DINO.HEAD_HIDDEN_DIM = 64
    cfg.DINO.BOTTLENECK_DIM = 16
    cfg.DINO.LOCAL_CROP_NUM = 2
    cfg.DINO.USE_BN = False
    mesh = make_mesh(data=jax.device_count())
    state, *_ = dino_engine.create_train_state(
        cfg, mesh, jax.random.PRNGKey(0), 10, 0, niter_per_ep=5
    )
    path = save_checkpoint(
        dino_engine._ckpt_view(state), 0, 11.0, str(tmp_path), "dino.ckpt",
        extra={
            "momentum_model_state_dict": state.teacher_params,
            "center": state.center,
            "head_stats": state.head_stats,
            "teacher_head_stats": state.teacher_head_stats,
        },
    )
    payload = load_checkpoint(path)
    assert detect_part(payload["params"]) == "dino-student"

    out = str(tmp_path / "dino.pt")
    export(path, out)
    blob = torch.load(out, weights_only=False)
    sd, tsd = blob["state_dict"], blob["momentum_model_state_dict"]
    for d in (sd, tsd):
        assert any(k.startswith("backbone.blocks.0.") for k in d)
        assert any(k.startswith("head.") for k in d)
    # teacher-only export picks the momentum tree
    out_t = str(tmp_path / "dino_teacher.pt")
    export(path, out_t, part="dino-teacher")
    sd_t = torch.load(out_t, weights_only=False)["state_dict"]
    teacher = jax.device_get(state.teacher_params)
    k = _leaf(teacher, "backbone/blocks_0/attn/qkv/kernel")
    np.testing.assert_allclose(sd_t["backbone.blocks.0.attn.qkv.weight"].numpy(), k.T)
