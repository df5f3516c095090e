"""Round-2 wiring tests: full DINO resume, checkpoint-time pos-embed
interpolation, config-wired fused Lion, and the save_attn surface."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from headct_foundation_tpu.config import default_config
from headct_foundation_tpu.engines import dino_engine, mae_engine
from headct_foundation_tpu.models.pos_embed import (
    build_sincos_position_embedding,
    interpolate_pos_embed,
)
from headct_foundation_tpu.models.vit import ViT
from headct_foundation_tpu.parallel.mesh import make_mesh
from headct_foundation_tpu.utils.checkpoint import (
    load_checkpoint,
    restore_dino_state,
    save_checkpoint,
    wait_for_saves,
)
from headct_foundation_tpu.utils.torch_interop import merge_params


def _tiny_dino_config(tmp_path):
    cfg = default_config()
    cfg.MODEL.ROI = [24, 24, 24]
    cfg.MODEL.IN_CHANS = 1
    cfg.MODEL.DIR = str(tmp_path)
    cfg.MODEL.SAVE_NAME = "dino_tiny.ckpt"
    cfg.VIT.INPUT_SIZE = 24
    cfg.VIT.PATCH_SIZE = 12
    cfg.VIT.IN_CHANS = 1
    cfg.VIT.HIDDEN_SIZE = 48
    cfg.VIT.MLP_DIM = 96
    cfg.VIT.NUM_LAYERS = 2
    cfg.VIT.NUM_HEADS = 4
    cfg.VIT.NUM_REGISTER_TOKENS = 2
    cfg.VIT.USE_BIAS = True
    cfg.DINO.HEAD_N_PROTOTYPES = 128
    cfg.DINO.HEAD_HIDDEN_DIM = 64
    cfg.DINO.BOTTLENECK_DIM = 16
    cfg.DINO.LOCAL_CROP_NUM = 2
    cfg.DINO.USE_BN = True  # exercise head-stats restore too
    cfg.TRAIN.MAX_EPOCHS = 4
    cfg.TRAIN.GRAD_CLIP = 1.0
    cfg.TRAIN.BASE_LR = 1e-3
    cfg.TRAIN.MIN_LR = 1e-6
    return cfg


@pytest.mark.parametrize("fmt", ["pickle", "orbax"])
def test_dino_full_resume_identical_losses(tmp_path, fmt):
    """Continuous 4-step run == 2 steps + full checkpoint resume + 2 steps.

    The reference restores model + optimizer + epoch (src/utils/misc.py:55-69);
    a lossy resume (fresh Adam moments / zero center) diverges immediately.
    Parametrized over TRAIN.CKPT_FORMAT backends; orbax runs the
    AsyncCheckpointer path (async_save=True + wait_for_saves).
    """
    cfg = _tiny_dino_config(tmp_path)
    mesh = make_mesh(data=8)
    rng = jax.random.PRNGKey(0)

    def fresh_state():
        state, *_ = dino_engine.create_train_state(
            cfg, mesh, jax.random.PRNGKey(0), total_steps=8,
            num_warmup_steps=1, niter_per_ep=2,
        )
        return state

    train_step = dino_engine.make_train_step(cfg, mesh)
    batch_np = np.random.RandomState(0).rand(8, 1, 24, 24, 24).astype(np.float32)
    batch = dino_engine._to_device_batch(batch_np, mesh)
    args = (jnp.asarray(0.99), jnp.asarray(0.04), jnp.asarray(0.0))

    # continuous run
    state = fresh_state()
    losses_cont = []
    for _ in range(4):
        state, m = train_step(state, batch, rng, *args)
        losses_cont.append(float(jax.device_get(m["loss"])))

    # interrupted run: 2 steps -> checkpoint -> fresh state -> restore -> 2 steps
    state = fresh_state()
    for _ in range(2):
        state, _ = train_step(state, batch, rng, *args)
    path = save_checkpoint(
        dino_engine._ckpt_view(state), epoch=0, best_loss=float("inf"),
        dir_add=str(tmp_path), filename="resume_test.ckpt",
        extra={"momentum_model_state_dict": state.teacher_params,
               "center": state.center,
               "head_stats": state.head_stats,
               "teacher_head_stats": state.teacher_head_stats},
        fmt=fmt, async_save=(fmt == "orbax"),
    )
    wait_for_saves()
    state2 = fresh_state()
    state2, epoch, _ = restore_dino_state(state2, load_checkpoint(path))
    assert int(jax.device_get(state2.step)) == 2
    losses_resumed = []
    for _ in range(2):
        state2, m = train_step(state2, batch, rng, *args)
        losses_resumed.append(float(jax.device_get(m["loss"])))

    np.testing.assert_allclose(losses_resumed, losses_cont[2:], rtol=1e-5)


def test_merge_params_interpolates_pos_embed():
    """Loading a 24^3-grid checkpoint into a 48^3 model interpolates the
    position embeddings instead of dropping them (reference:
    main_pretrain_mae.py:132 + src/utils/pos_embed.py:102-153)."""
    dim = 48
    src_pe = np.asarray(
        build_sincos_position_embedding((2, 2, 2), dim)
    )  # 24^3 / patch 12 -> 2^3 = 8 patches
    target = {
        "patch_embedding": {
            "position_embeddings": np.zeros((1, 64, dim), np.float32)  # 4^3 grid
        }
    }
    source = {"patch_embedding": {"position_embeddings": src_pe}}
    merged, missing, unexpected = merge_params(target, source)
    assert not missing and not unexpected, (missing, unexpected)
    got = merged["patch_embedding"]["position_embeddings"]
    expect = np.asarray(
        interpolate_pos_embed(jnp.asarray(src_pe), 0, 64)
    )
    np.testing.assert_allclose(got, expect, rtol=1e-6)
    # sanity: not the random/zero target values
    assert np.abs(got).max() > 0


def test_merge_params_still_reports_real_mismatches():
    target = {"blocks_0": {"attn": {"qkv": {"kernel": np.zeros((4, 12))}}}}
    source = {"blocks_0": {"attn": {"qkv": {"kernel": np.zeros((8, 24))}}}}
    merged, _, unexpected = merge_params(target, source)
    assert any("shape" in u for u in unexpected)
    assert merged["blocks_0"]["attn"]["qkv"]["kernel"].shape == (4, 12)


def _tiny_mae_config(tmp_path):
    cfg = default_config()
    cfg.MODEL.ROI = [24, 24, 24]
    cfg.MODEL.DIR = str(tmp_path)
    cfg.MAE.INPUT_SIZE = 24
    cfg.MAE.PATCH_SIZE = 12
    cfg.MAE.IN_CHANS = 1
    cfg.MAE.ENCODER_EMBED_DIM = 48
    cfg.MAE.ENCODER_MLP_DIM = 96
    cfg.MAE.ENCODER_DEPTH = 2
    cfg.MAE.ENCODER_NUM_HEADS = 4
    cfg.MAE.DECODER_EMBED_DIM = 48
    cfg.MAE.DECODER_MLP_DIM = 96
    cfg.MAE.DECODER_DEPTH = 1
    cfg.MAE.DECODER_NUM_HEADS = 4
    cfg.TRAIN.GRAD_CLIP = 1.0
    return cfg


def test_lion_fused_config_end_to_end(tmp_path):
    """TRAIN.OPTIMIZER=Lion + TRAIN.LION_FUSED=True trains through the Pallas
    kernel and matches the unfused Lion step (reference Lion(use_triton=True),
    src/utils/optimizers.py:305-307)."""
    mesh = make_mesh(data=8)
    rng = jax.random.PRNGKey(0)
    batch = mae_engine._to_device_batch(
        np.random.RandomState(0).rand(8, 1, 24, 24, 24).astype(np.float32), mesh
    )

    def run(fused: bool):
        cfg = _tiny_mae_config(tmp_path)
        cfg.TRAIN.OPTIMIZER = "Lion"
        cfg.TRAIN.LION_FUSED = fused
        cfg.TRAIN.BASE_LR = 1e-3
        state, _, _ = mae_engine.create_train_state(
            cfg, mesh, rng, total_steps=4, num_warmup_steps=0
        )
        step = mae_engine.make_train_step(mesh)
        losses = []
        for _ in range(2):
            state, m = step(state, batch, rng)
            losses.append(float(jax.device_get(m["loss"])))
        return losses, jax.device_get(state.params)

    losses_fused, params_fused = run(True)
    losses_ref, params_ref = run(False)
    assert all(np.isfinite(losses_fused))
    np.testing.assert_allclose(losses_fused, losses_ref, rtol=1e-5)
    # sign() is discontinuous: at near-zero momenta fp ordering can flip a
    # sign between the fused and unfused formulations (delta 2*lr). Allow a
    # vanishing fraction of such flips; everything else must match.
    total = mismatched = 0
    for a, b in zip(jax.tree.leaves(params_fused), jax.tree.leaves(params_ref)):
        a, b = np.asarray(a), np.asarray(b)
        mismatched += int((np.abs(a - b) > 1e-5).sum())
        total += a.size
    assert mismatched / total < 1e-3, (mismatched, total)


def test_save_attn_surface():
    """save_attn=True sows per-block post-softmax attention matrices
    (reference: src/models/attentionblock.py:36,62-64)."""
    model = ViT(
        in_chans=1, img_size=24, patch_size=12, hidden_size=48, mlp_dim=96,
        num_layers=2, num_heads=4, pos_embed="sincos", qkv_bias=True,
        save_attn=True,
    )
    x = jnp.asarray(np.random.RandomState(0).rand(2, 1, 24, 24, 24), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    (_, _), inter = model.apply(
        {"params": variables["params"]}, x, mutable=["intermediates"]
    )
    T = 8 + 1  # 2^3 patches + CLS
    for i in range(2):
        att = np.asarray(inter["intermediates"][f"blocks_{i}"]["attn"]["att_mat"][0])
        assert att.shape == (2, 4, T, T)
        np.testing.assert_allclose(att.sum(-1), 1.0, rtol=1e-5)


def test_async_checkpoint_roundtrip(tmp_path):
    """async_save=True: device-side snapshot + background write produces a
    byte-identical payload to the synchronous path, survives immediate state
    mutation (donation stand-in), and wait_for_saves() joins the writer."""
    import jax
    import jax.numpy as jnp

    from headct_foundation_tpu.utils.checkpoint import (
        load_checkpoint, save_checkpoint, wait_for_saves,
    )

    class S:
        step = jnp.asarray(7, jnp.int32)
        params = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)}
        opt_state = {"mu": jnp.ones((2, 3), jnp.float32)}

    state = S()
    save_checkpoint(state, 3, 0.5, str(tmp_path), "sync.ckpt")
    save_checkpoint(
        state, 3, 0.5, str(tmp_path), "async.ckpt",
        extra={"center": jnp.full((1, 4), 2.0)}, async_save=True,
    )
    # mutate the live arrays' contents conceptually: rebind to new values —
    # the snapshot must be independent of the current state object
    state.params = {"w": jnp.zeros((2, 3), jnp.float32)}
    wait_for_saves()

    sync = load_checkpoint(str(tmp_path / "sync.ckpt"))
    asyn = load_checkpoint(str(tmp_path / "async.ckpt"))
    assert asyn["epoch"] == 3 and asyn["step"] == 7
    np.testing.assert_array_equal(
        np.asarray(sync["params"]["w"]), np.asarray(asyn["params"]["w"])
    )
    np.testing.assert_array_equal(
        np.asarray(asyn["params"]["w"]),
        np.arange(6, dtype=np.float32).reshape(2, 3),
    )
    np.testing.assert_array_equal(
        np.asarray(asyn["center"]), np.full((1, 4), 2.0, np.float32)
    )


def test_async_checkpoint_error_surfaces(tmp_path):
    """A failed background write raises on the next wait_for_saves()."""
    import jax.numpy as jnp
    import pytest as _pytest

    from headct_foundation_tpu.utils.checkpoint import (
        save_checkpoint, wait_for_saves,
    )

    class S:
        step = jnp.asarray(0, jnp.int32)
        params = {"w": jnp.zeros((2,))}
        opt_state = {}

    # The failure must happen INSIDE the writer thread (the open() of the
    # tmp file — filename points into a subdir that doesn't exist), not
    # synchronously in save_checkpoint: submission succeeds, and the error
    # surfaces on the next wait_for_saves().
    save_checkpoint(S(), 0, 0.0, str(tmp_path / "ok"),
                    "missing_subdir/a.ckpt", async_save=True)
    with _pytest.raises(Exception):
        wait_for_saves()
    wait_for_saves()  # error is cleared after being raised once


def test_pickle_save_replaces_stale_orbax_dir(tmp_path):
    """Switching TRAIN.CKPT_FORMAT from orbax back to pickle in the same
    MODEL.DIR must not crash on the leftover checkpoint DIRECTORY of the
    same name (os.replace onto a directory raises; under async_save the
    error would surface one epoch late from the writer thread)."""
    import jax.numpy as jnp

    from headct_foundation_tpu.utils.checkpoint import wait_for_saves

    class S:
        step = jnp.int32(1)
        params = {"w": jnp.ones((2, 2))}
        opt_state = {"m": jnp.zeros((2, 2))}

    save_checkpoint(S(), 0, 1.0, str(tmp_path), "ck.pt", fmt="orbax")
    assert (tmp_path / "ck.pt").is_dir()
    save_checkpoint(S(), 1, 0.5, str(tmp_path), "ck.pt", fmt="pickle",
                    async_save=True)
    wait_for_saves()
    assert (tmp_path / "ck.pt").is_file()
    payload = load_checkpoint(str(tmp_path / "ck.pt"))
    assert payload["epoch"] == 1


def test_async_saver_surfaces_write_errors():
    """A failed background checkpoint write must raise at the next
    wait_for_saves/submit, not vanish (the engines call wait_for_saves at
    the end of training; a silent failure would mean no checkpoint and no
    error)."""
    from headct_foundation_tpu.utils import checkpoint as ckpt

    def _boom():
        raise OSError("disk full")

    ckpt._SAVER.submit(_boom)
    with pytest.raises(OSError, match="disk full"):
        wait_for_saves()
    # the error is consumed; the saver is reusable afterwards
    ckpt._SAVER.submit(lambda: None)
    wait_for_saves()
