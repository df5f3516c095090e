"""Pipeline parallelism ('pipe' mesh axis, parallel/pipeline.py).

The reference has no pipeline parallelism (DDP only — reference:
src/utils/misc.py:325-344); these tests pin the TPU-native GPipe extension on
the 8-device CPU mesh: (a) the fill-drain schedule is semantically a plain
sequential fold — values AND grads — for several stage/microbatch shapes,
(b) stack/unstack round-trips the flax param layout, (c) the pipelined MAE
loss equals the unpipelined model forward bit-for-bit given the same mask
key, with matching parameter gradients, and (d) the pipelined engine train
step runs and descends.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from headct_foundation_tpu.parallel.mesh import make_mesh
from headct_foundation_tpu.parallel.pipeline import (
    pipeline_apply,
    stack_layer_params,
    unstack_layer_params,
)


def _toy_layers(rng, n_layers, d):
    ws = rng.randn(n_layers, d, d).astype(np.float32) * 0.3
    bs = rng.randn(n_layers, d).astype(np.float32) * 0.1
    return {"w": jnp.asarray(ws), "b": jnp.asarray(bs)}


def _toy_apply(p, x):
    return jnp.tanh(x @ p["w"] + p["b"])


def _sequential(layers, x):
    n = layers["w"].shape[0]
    for i in range(n):
        x = _toy_apply(jax.tree.map(lambda a: a[i], layers), x)
    return x


@pytest.mark.parametrize("pipe,n_micro", [(2, 2), (2, 4), (4, 2), (4, 4)])
def test_pipeline_apply_matches_sequential(pipe, n_micro):
    """Values and grads (x AND stacked params) vs the plain fold."""
    mesh = make_mesh(data=8 // pipe, pipe=pipe)
    rng = np.random.RandomState(0)
    L, B, T, D = 4, 16, 6, 16
    layers = _toy_layers(rng, L, D)
    x = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    w = jnp.asarray(rng.randn(B, T, D), jnp.float32)

    out = pipeline_apply(mesh, layers, x, _toy_apply, n_micro)
    ref = _sequential(layers, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)

    def loss_pipe(layers, x):
        return jnp.sum(pipeline_apply(mesh, layers, x, _toy_apply, n_micro) * w)

    def loss_ref(layers, x):
        return jnp.sum(_sequential(layers, x) * w)

    (gl1, gx1) = jax.grad(loss_pipe, argnums=(0, 1))(layers, x)
    (gl2, gx2) = jax.grad(loss_ref, argnums=(0, 1))(layers, x)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               atol=1e-5, rtol=1e-5)
    for k in ("w", "b"):
        np.testing.assert_allclose(np.asarray(gl1[k]), np.asarray(gl2[k]),
                                   atol=1e-5, rtol=1e-5, err_msg=k)


def test_pipeline_apply_pads_partial_tail_batch():
    """drop_last=False loaders produce tail batches whose per-datashard size
    doesn't divide the microbatch count — the schedule must pad and slice,
    not crash, and values/grads must still match the sequential fold."""
    mesh = make_mesh(data=2, pipe=4)
    rng = np.random.RandomState(4)
    layers = _toy_layers(rng, 4, 8)
    x = jnp.asarray(rng.randn(6, 5, 8), jnp.float32)  # 3 per shard, M=4
    w = jnp.asarray(rng.randn(6, 5, 8), jnp.float32)
    out = pipeline_apply(mesh, layers, x, _toy_apply, 4)
    ref = _sequential(layers, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)
    g1 = jax.grad(lambda x: jnp.sum(
        pipeline_apply(mesh, layers, x, _toy_apply, 4) * w))(x)
    g2 = jax.grad(lambda x: jnp.sum(_sequential(layers, x) * w))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_apply_no_pipe_axis_is_plain_fold():
    mesh = make_mesh(data=8)  # pipe axis size 1
    rng = np.random.RandomState(1)
    layers = _toy_layers(rng, 3, 8)
    x = jnp.asarray(rng.randn(4, 5, 8), jnp.float32)
    out = pipeline_apply(mesh, layers, x, _toy_apply, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_sequential(layers, x)),
                               atol=1e-6, rtol=1e-6)


def test_stack_unstack_roundtrip():
    rng = np.random.RandomState(2)
    params = {
        f"blocks_{i}": {"attn": {"kernel": jnp.asarray(rng.randn(4, 4), jnp.float32)},
                        "bias": jnp.asarray(rng.randn(4), jnp.float32)}
        for i in range(3)
    }
    params["norm"] = {"scale": jnp.ones((4,))}
    stacked = stack_layer_params(dict(params), "blocks", 3)
    assert set(stacked) == {"blocks", "norm"}
    assert stacked["blocks"]["attn"]["kernel"].shape == (3, 4, 4)
    back = unstack_layer_params(stacked, "blocks")
    assert set(back) == set(params)
    for k in params:
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            params[k], back[k],
        )


def _tiny_pipe_config(tmp_path, pipe=2):
    from headct_foundation_tpu.config import default_config

    cfg = default_config()
    cfg.MAE.INPUT_SIZE = 24
    cfg.MAE.PATCH_SIZE = 12
    cfg.MAE.IN_CHANS = 1
    cfg.MAE.ENCODER_DEPTH = 2
    cfg.MAE.ENCODER_EMBED_DIM = 48
    cfg.MAE.ENCODER_MLP_DIM = 96
    cfg.MAE.ENCODER_NUM_HEADS = 4
    cfg.MAE.DECODER_DEPTH = 2
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
    cfg.PARALLEL.PIPE = pipe
    return cfg


def test_pipelined_mae_loss_matches_unpipelined(tmp_path):
    """Same init, same mask key: the pipelined loss (and its parameter
    gradients, compared block-by-block after unstacking) equals the plain
    model forward. f32 end-to-end on CPU -> tight tolerances."""
    from headct_foundation_tpu.engines import mae_engine
    from headct_foundation_tpu.engines.mae_engine import _make_pipelined_loss

    cfg = _tiny_pipe_config(tmp_path)
    mesh = make_mesh(data=2, pipe=2)
    rng = jax.random.PRNGKey(7)
    model = mae_engine.build_mae_model(cfg, dtype=jnp.float32)
    sample = jnp.zeros((1, 1, 24, 24, 24), jnp.float32)
    params = model.init({"params": rng, "mask": jax.random.fold_in(rng, 1)},
                        sample)["params"]
    stacked = stack_layer_params(dict(params), "blocks", 2)
    stacked = stack_layer_params(stacked, "decoder_blocks", 2)

    batch = jnp.asarray(
        np.random.RandomState(3).randn(8, 1, 24, 24, 24), jnp.float32
    )
    mask_rng = jax.random.PRNGKey(11)
    loss_fn = _make_pipelined_loss(cfg, mesh, dtype=jnp.float32)

    def ref_loss(p):
        loss, _, _ = model.apply({"params": p}, batch, True, mask_rng)
        return loss

    def pipe_loss(p):
        return loss_fn(model.apply, p, batch, mask_rng)

    l_ref, g_ref = jax.value_and_grad(ref_loss)(params)
    l_pipe, g_pipe = jax.value_and_grad(pipe_loss)(stacked)
    np.testing.assert_allclose(float(l_pipe), float(l_ref), rtol=1e-6)

    g_pipe = unstack_layer_params(dict(g_pipe), "blocks")
    g_pipe = unstack_layer_params(g_pipe, "decoder_blocks")
    flat_ref = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    flat_pipe = dict(jax.tree_util.tree_flatten_with_path(g_pipe)[0])
    assert len(flat_ref) == len(flat_pipe)
    for path, leaf in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat_pipe[path]), np.asarray(leaf),
            atol=2e-5, rtol=2e-4, err_msg=str(path),
        )


def test_pipelined_engine_train_step_descends(tmp_path):
    """Full engine path: create_train_state with PIPE=2 (stacked+'pipe'-
    sharded blocks), jitted train/eval steps run and the loss descends."""
    from headct_foundation_tpu.engines import mae_engine

    cfg = _tiny_pipe_config(tmp_path)
    mesh = make_mesh(data=2, pipe=2)
    rng = jax.random.PRNGKey(0)
    state, shardings, _ = mae_engine.create_train_state(
        cfg, mesh, rng, total_steps=50, num_warmup_steps=0
    )
    assert "blocks" in state.params and "blocks_0" not in state.params
    # stacked trunk params are sharded over 'pipe' on the layer axis
    spec = state.params["blocks"]["attn"]["qkv"]["kernel"].sharding.spec
    assert len(spec) >= 1 and spec[0] == "pipe", spec

    train_step = mae_engine.make_train_step(mesh, config=cfg)
    eval_step = mae_engine.make_eval_step(mesh, config=cfg)
    batch = np.random.RandomState(0).randn(8, 1, 24, 24, 24).astype(np.float32)
    data = mae_engine._to_device_batch(batch, mesh)
    losses = []
    for _ in range(8):
        state, metrics = train_step(state, data, rng)
        losses.append(float(jax.device_get(metrics["loss"])))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses
    ev = eval_step(state, data, jax.random.PRNGKey(1))
    assert np.isfinite(float(jax.device_get(ev["loss"])))


def test_export_torch_unstacks_pipelined_checkpoint(tmp_path):
    """Pipelined checkpoints (stacked trunk params) must export to the
    reference's per-block torch naming (blocks.<i>.*) — reference tooling
    never sees the stacked layout (reference: src/utils/misc.py:72-96)."""
    torch = pytest.importorskip("torch")
    from headct_foundation_tpu.engines import mae_engine
    from headct_foundation_tpu.utils.checkpoint import save_checkpoint
    from tools.export_torch import export

    cfg = _tiny_pipe_config(tmp_path)
    mesh = make_mesh(data=2, pipe=2)
    state, _, _ = mae_engine.create_train_state(
        cfg, mesh, jax.random.PRNGKey(0), total_steps=10, num_warmup_steps=0
    )
    assert "blocks" in state.params  # stacked layout in the checkpoint
    save_checkpoint(state, 0, 0.0, str(tmp_path), "pipe.ckpt")
    files = export(str(tmp_path / "pipe.ckpt"), str(tmp_path / "out.pt"))
    sd = torch.load(files[0], map_location="cpu", weights_only=False)["state_dict"]
    enc = [k for k in sd if k.startswith("blocks.")]
    assert any(k.startswith("blocks.0.") for k in enc), sorted(sd)[:10]
    assert any(k.startswith("blocks.1.") for k in enc)
    assert any(k.startswith("decoder_blocks.1.") for k in sd)
    # each exported block weight is a single layer's [out, in], not stacked
    w = sd["blocks.0.attn.qkv.weight"]
    assert w.ndim == 2, w.shape


def test_load_pretrained_adapts_trunk_layout_both_ways(tmp_path):
    """A pipelined (stacked) checkpoint must warm-start an unpipelined model
    with ALL trunk weights (and vice versa) — without the layout adapter the
    strict=False merge silently leaves every block at random init."""
    from headct_foundation_tpu.engines import mae_engine
    from headct_foundation_tpu.utils.checkpoint import save_checkpoint
    from headct_foundation_tpu.utils.torch_interop import load_pretrained_into

    cfg = _tiny_pipe_config(tmp_path)
    mesh = make_mesh(data=2, pipe=2)
    state, _, _ = mae_engine.create_train_state(
        cfg, mesh, jax.random.PRNGKey(5), total_steps=10, num_warmup_steps=0
    )
    save_checkpoint(state, 0, 0.0, str(tmp_path), "pipe.ckpt")

    cfg_flat = _tiny_pipe_config(tmp_path, pipe=1)
    mesh_flat = make_mesh(data=8)
    flat_state, _, _ = mae_engine.create_train_state(
        cfg_flat, mesh_flat, jax.random.PRNGKey(9), total_steps=10,
        num_warmup_steps=0,
    )
    merged = load_pretrained_into(
        flat_state.params, str(tmp_path / "pipe.ckpt")
    )
    want = np.asarray(state.params["blocks"]["attn"]["qkv"]["kernel"])[1]
    got = np.asarray(merged["blocks_1"]["attn"]["qkv"]["kernel"])
    np.testing.assert_array_equal(got, want)

    # reverse: per-block checkpoint into a pipelined (stacked) target
    save_checkpoint(flat_state, 0, 0.0, str(tmp_path), "flat.ckpt")
    merged2 = load_pretrained_into(
        state.params, str(tmp_path / "flat.ckpt")
    )
    want2 = np.asarray(flat_state.params["blocks_0"]["attn"]["qkv"]["kernel"])
    got2 = np.asarray(merged2["blocks"]["attn"]["qkv"]["kernel"])[0]
    np.testing.assert_array_equal(got2, want2)


def test_pipe_requires_divisible_depth_and_no_dropout(tmp_path):
    from headct_foundation_tpu.engines import mae_engine

    cfg = _tiny_pipe_config(tmp_path)
    cfg.MAE.DECODER_DEPTH = 3  # not divisible by PIPE=2
    mesh = make_mesh(data=2, pipe=2)
    with pytest.raises(ValueError, match="divide"):
        mae_engine.create_train_state(cfg, mesh, jax.random.PRNGKey(0),
                                      total_steps=10, num_warmup_steps=0)
    cfg2 = _tiny_pipe_config(tmp_path)
    cfg2.MAE.DROPOUT_RATE = 0.1
    with pytest.raises(ValueError, match="DROPOUT"):
        mae_engine.create_train_state(cfg2, mesh, jax.random.PRNGKey(0),
                                      total_steps=10, num_warmup_steps=0)
