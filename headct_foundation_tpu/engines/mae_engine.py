"""MAE pretraining engine: jitted SPMD train step + epoch loops.

Mirrors the reference engine's surface — ``train_one_epoch`` /
``val_one_epoch`` / ``trainer`` / ``tester`` (reference:
engine_pretrain_mae.py:14-314) — re-designed TPU-first:

* ONE jitted train step holds forward, loss, backward, per-param grad clip,
  optimizer update, and (under a sharded batch) the gradient all-reduce — the
  reference's DDP hooks, GradScaler, and per-step ``torch.cuda.synchronize``
  all disappear. bfloat16 compute replaces fp16 AMP (no loss scaling needed).
* The per-step loss all-reduce (reference: engine_pretrain_mae.py:73-74) is
  free: the loss is already a global mean over the sharded batch.
* Non-finite-loss hard abort is kept (reference: engine_pretrain_mae.py:76-78),
  checked on host against the async-fetched loss.
* rank-0-style checkpointing: ``latest_`` every epoch, ``best_`` on min val
  loss (reference: engine_pretrain_mae.py:210-261).
"""

from __future__ import annotations

import math
import sys
import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax.training import train_state
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from headct_foundation_tpu.models.mae import MaskedAutoencoderViT
from headct_foundation_tpu.optim.lr_sched import get_lr_schedule
from headct_foundation_tpu.optim.optimizers import get_optimizer
from headct_foundation_tpu.parallel.mesh import batch_sharding, param_shardings
from headct_foundation_tpu.utils.checkpoint import save_checkpoint, wait_for_saves
from headct_foundation_tpu.utils.metrics import MetricLogger


class TrainState(train_state.TrainState):
    """flax TrainState; `tx` carries the optax chain built by get_optimizer."""


def build_mae_model(config, dtype=jnp.bfloat16) -> MaskedAutoencoderViT:
    """Construct the MAE from config keys (reference: main_pretrain_mae.py:103-126)."""
    return MaskedAutoencoderViT(
        input_size=config.MAE.INPUT_SIZE,
        patch_size=config.MAE.PATCH_SIZE,
        mask_ratio=config.MAE.MASK_RATIO,
        in_chans=config.MAE.IN_CHANS,
        dropout_rate=config.MAE.DROPOUT_RATE,
        spatial_dims=config.MAE.SPATIAL_DIMS,
        pos_embed=config.MAE.POS_EMBED,
        encoder_depth=config.MAE.ENCODER_DEPTH,
        encoder_embed_dim=config.MAE.ENCODER_EMBED_DIM,
        encoder_mlp_dim=config.MAE.ENCODER_MLP_DIM,
        encoder_num_heads=config.MAE.ENCODER_NUM_HEADS,
        decoder_depth=config.MAE.DECODER_DEPTH,
        decoder_embed_dim=config.MAE.DECODER_EMBED_DIM,
        decoder_mlp_dim=config.MAE.DECODER_MLP_DIM,
        decoder_num_heads=config.MAE.DECODER_NUM_HEADS,
        norm_pix_loss=config.MAE.NORM_PIX_LOSS,
        loss_dtype=getattr(config.MAE, "LOSS_DTYPE", "float32"),
        use_bias=config.MAE.USE_BIAS,
        norm_layer=config.MAE.NORM_LAYER,
        remat=config.PARALLEL.REMAT,
        dtype=dtype,
    )


def mae_trainable_mask(params: Any, pos_embed: str) -> Any:
    """False for frozen leaves: sincos position embeddings are fixed buffers
    in the reference (requires_grad=False, src/utils/pos_embed.py:82-83)."""

    def _mask(path, leaf):
        if pos_embed != "sincos":
            return True
        names = {str(getattr(k, "key", k)) for k in path}
        return not ({"position_embeddings", "decoder_pos_embed"} & names)

    return jax.tree_util.tree_map_with_path(_mask, params)


def create_train_state(
    config,
    mesh: Mesh,
    rng: jax.Array,
    total_steps: int,
    num_warmup_steps: int,
    dtype=jnp.bfloat16,
) -> Tuple[TrainState, Any, Callable]:
    """Initialize model + optimizer with parameters sharded per mesh rules.

    Returns (state, state_shardings, lr_schedule).
    """
    from headct_foundation_tpu.ops.attention import (
        attention_mesh,
        set_pallas_min_t,
    )

    set_pallas_min_t(config.PARALLEL.PALLAS_MIN_T)
    model = build_mae_model(config, dtype=dtype)
    roi = config.MODEL.ROI
    sample = jnp.zeros((1, config.MAE.IN_CHANS, roi[0], roi[1], roi[2]), dtype)

    lr_schedule = get_lr_schedule(
        config, config.TRAIN.BASE_LR, num_warmup_steps, total_steps, config.TRAIN.MIN_LR
    )

    pipe = int(getattr(config.PARALLEL, "PIPE", 1))
    if pipe > 1:
        # v1 pipeline boundary checks (see parallel/pipeline.py docstring).
        if config.MAE.DROPOUT_RATE > 0:
            raise ValueError("PARALLEL.PIPE > 1 requires MAE.DROPOUT_RATE=0")
        if (config.MAE.ENCODER_DEPTH % pipe or config.MAE.DECODER_DEPTH % pipe):
            raise ValueError(
                f"PIPE={pipe} must divide encoder depth "
                f"{config.MAE.ENCODER_DEPTH} and decoder depth "
                f"{config.MAE.DECODER_DEPTH}"
            )

    def _init(rng):
        # init traces use batch-1 samples; no shard_map around attention
        with attention_mesh(None):
            variables = model.init(
                {"params": rng, "mask": jax.random.fold_in(rng, 1)}, sample
            )
        params = variables["params"]
        if pipe > 1:
            from headct_foundation_tpu.parallel.pipeline import stack_layer_params

            params = stack_layer_params(params, "blocks", config.MAE.ENCODER_DEPTH)
            params = stack_layer_params(
                params, "decoder_blocks", config.MAE.DECODER_DEPTH
            )
        return params

    params_shape = jax.eval_shape(_init, rng)
    if pipe > 1:
        from headct_foundation_tpu.parallel.pipeline import pipeline_rules

        p_shardings = param_shardings(params_shape, mesh, pipeline_rules())
    else:
        p_shardings = param_shardings(params_shape, mesh)
    params = jax.jit(_init, out_shardings=p_shardings)(rng)

    mask = mae_trainable_mask(params, config.MAE.POS_EMBED)
    tx = get_optimizer(
        config,
        lr_schedule,
        grad_clip=config.TRAIN.GRAD_CLIP or None,
        trainable_mask=mask,
    )

    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    state_shardings = jax.tree.map(lambda x: NamedSharding(mesh, P()), state)
    state_shardings = state_shardings.replace(
        params=p_shardings,
        opt_state=_opt_state_shardings(tx, params_shape, p_shardings, mesh),
    )
    # Re-place state according to shardings (opt_state moments follow params).
    state = jax.device_put(state, state_shardings)
    return state, state_shardings, lr_schedule


def _opt_state_shardings(tx, params_shape, p_shardings, mesh):
    """Shard optimizer moments like their parameters; scalars replicated.

    optax states embed parameter-shaped pytrees (e.g. Adam's mu/nu), so a
    moment leaf's path ends with the full path of its parameter; we match on
    that suffix to reuse the parameter's sharding.
    """
    opt_shape = jax.eval_shape(tx.init, params_shape)
    flat_params = jax.tree_util.tree_flatten_with_path(p_shardings)[0]

    def _assign(path, leaf):
        del leaf
        for p_path, sharding in flat_params:
            if len(path) >= len(p_path) and tuple(path[-len(p_path):]) == tuple(p_path):
                return sharding
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(_assign, opt_shape)


def _make_pipelined_loss(config, mesh: Mesh, dtype=jnp.bfloat16):
    """MAE loss with the encoder/decoder trunks run as 'pipe'-axis pipelines.

    The stacked block params live in the state as params['blocks'] /
    params['decoder_blocks'] (see create_train_state); everything around the
    trunks reuses the model's own prefix/suffix methods under GSPMD, and the
    blocks themselves come from the model's own block factories, so the math
    is identical to the unpipelined forward (pinned by tests)."""
    from headct_foundation_tpu.models.mae import mae_decoder_block, mae_encoder_block
    from headct_foundation_tpu.parallel.pipeline import pipeline_apply

    n_micro = int(getattr(config.PARALLEL, "PIPE_MICROBATCH", 0) or 0)
    model = build_mae_model(config, dtype=dtype)
    enc_block = mae_encoder_block(model)
    dec_block = mae_decoder_block(model)

    def enc_apply(p, x):
        return enc_block.apply({"params": p}, x, True)

    def dec_apply(p, x):
        return dec_block.apply({"params": p}, x, True)

    def loss_fn(apply_fn, params, batch, mask_rng):
        xe, mask, ids = apply_fn(
            {"params": params}, batch, mask_rng, True, method="encode_prefix"
        )
        xt = pipeline_apply(mesh, params["blocks"], xe, enc_apply, n_micro)
        latent = apply_fn({"params": params}, xt, method="encode_suffix")
        dec_in = apply_fn({"params": params}, latent, ids, method="decode_prefix")
        dec_t = pipeline_apply(
            mesh, params["decoder_blocks"], dec_in, dec_apply, n_micro
        )
        pred = apply_fn({"params": params}, dec_t, method="decode_suffix")
        return apply_fn(
            {"params": params}, batch, pred, mask, method="forward_loss"
        )

    return loss_fn


def make_train_step(mesh: Mesh, augment: bool = False, accum_steps: int = 1,
                    config=None, jit: bool = True):
    """Build the jitted MAE train step.

    step(state, batch, rng) -> (state, metrics). ``batch`` is [B, C, R, R, R]
    sharded over the data axis; rng is a per-host replicated key folded with
    the global step for reproducible, decorrelated masking. With
    ``augment=True`` the per-step random augmentation (flips + intensity
    shift, reference mae3d_transforms) runs on device inside the step. With
    ``accum_steps > 1`` the batch is split into that many micro-batches whose
    f32-accumulated mean gradient drives ONE optimizer update — activation
    memory is per-micro-batch, so effective batches beyond HBM capacity
    train at full numerical fidelity (a TPU extension; the reference has no
    accumulation). When ``config`` sets PARALLEL.PIPE > 1 the forward runs
    the pipelined trunks (state must come from a PIPE create_train_state).

    ``jit=False`` returns the raw (unjitted) step function — for callers
    that compose it into a larger jitted program (bench.py chains K
    production steps inside one ``lax.scan`` so a single dispatch amortizes
    the remote-relay round trip; the math is the exact object training runs).
    """
    from headct_foundation_tpu.ops.attention import attention_mesh

    pipe = int(getattr(config.PARALLEL, "PIPE", 1)) if config is not None else 1
    pipelined_loss = _make_pipelined_loss(config, mesh) if pipe > 1 else None

    def _micro_loss(state, params, batch, step_rng, micro_idx):
        micro_rng = jax.random.fold_in(step_rng, micro_idx)
        mask_rng, drop_rng = jax.random.split(micro_rng)
        if augment:
            from headct_foundation_tpu.data.augment import mae_augment

            aug_rng = jax.random.fold_in(micro_rng, 7)
            batch = mae_augment(aug_rng, batch)
        if pipelined_loss is not None:
            return pipelined_loss(state.apply_fn, params, batch, mask_rng)
        if "blocks" in params and "blocks_0" not in params:
            raise ValueError(
                "state holds pipelined (stacked) trunk params; pass the same "
                "config (with PARALLEL.PIPE set) to make_train_step/"
                "make_eval_step as to create_train_state"
            )
        loss, _, _ = state.apply_fn(
            {"params": params},
            batch,
            deterministic=False,
            rngs={"mask": mask_rng, "dropout": drop_rng},
        )
        return loss

    from headct_foundation_tpu.data.device_preprocess import wire_to_compute

    in_chans = int(config.MAE.IN_CHANS) if config is not None else 0

    def train_step(state: TrainState, batch: jnp.ndarray, rng: jax.Array):
        # Scoped at trace time: shard the Pallas attention over THIS mesh,
        # whatever was traced before or since.
        with attention_mesh(mesh):
            # Batches arrive in the WIRE format (fp16 windowed channels, or
            # 1-ch int16 HU that the step window-stacks on device — 3x fewer
            # H2D bytes); compute in bfloat16 from here on.
            batch = wire_to_compute(batch, config, in_chans)
            step_rng = jax.random.fold_in(rng, state.step)

            if accum_steps == 1:
                loss, grads = jax.value_and_grad(_micro_loss, argnums=1)(
                    state, state.params, batch, step_rng, 0
                )
            else:
                B = batch.shape[0]
                assert B % accum_steps == 0, (B, accum_steps)
                micros = batch.reshape(
                    (accum_steps, B // accum_steps) + batch.shape[1:]
                )

                def body(carry, inp):
                    gsum, lsum = carry
                    mb, i = inp
                    loss, grads = jax.value_and_grad(_micro_loss, argnums=1)(
                        state, state.params, mb, step_rng, i
                    )
                    gsum = jax.tree.map(
                        lambda a, g: a + g.astype(jnp.float32), gsum, grads
                    )
                    return (gsum, lsum + loss), None

                gsum0 = jax.tree.map(
                    lambda p: jnp.zeros(p.shape, jnp.float32), state.params
                )
                (gsum, lsum), _ = jax.lax.scan(
                    body, (gsum0, jnp.float32(0)),
                    (micros, jnp.arange(accum_steps)),
                )
                grads = jax.tree.map(
                    lambda g, p: (g / accum_steps).astype(p.dtype),
                    gsum, state.params,
                )
                loss = lsum / accum_steps

            new_state = state.apply_gradients(grads=grads)
            metrics = {"loss": loss}
            return new_state, metrics

    if not jit:
        return train_step
    return jax.jit(
        train_step,
        in_shardings=(None, batch_sharding(mesh), None),
        donate_argnums=(0,),
    )


def make_eval_step(mesh: Mesh, config=None):
    from headct_foundation_tpu.ops.attention import attention_mesh

    pipe = int(getattr(config.PARALLEL, "PIPE", 1)) if config is not None else 1
    pipelined_loss = _make_pipelined_loss(config, mesh) if pipe > 1 else None

    from headct_foundation_tpu.data.device_preprocess import wire_to_compute

    in_chans = int(config.MAE.IN_CHANS) if config is not None else 0

    def eval_step(state: TrainState, batch: jnp.ndarray, rng: jax.Array):
        with attention_mesh(mesh):
            batch = wire_to_compute(batch, config, in_chans)
            if pipelined_loss is not None:
                return {"loss": pipelined_loss(
                    state.apply_fn, state.params, batch, rng
                )}
            if "blocks" in state.params and "blocks_0" not in state.params:
                raise ValueError(
                    "state holds pipelined (stacked) trunk params; pass the "
                    "same config (with PARALLEL.PIPE set) to make_eval_step"
                )
            loss, _, _ = state.apply_fn(
                {"params": state.params}, batch, deterministic=True,
                rngs={"mask": rng},
            )
            return {"loss": loss}

    return jax.jit(eval_step, in_shardings=(None, batch_sharding(mesh), None))


from contextlib import nullcontext as _nullcontext


def _to_device_batch(batch: np.ndarray, mesh: Mesh, dtype=jnp.bfloat16) -> jnp.ndarray:
    from headct_foundation_tpu.parallel.mesh import shard_batch

    arr = np.asarray(batch)
    if arr.dtype in (np.int16, np.uint8):  # hu16/hu8 wire batches ship
        dev, _ = shard_batch(arr, mesh)    # as-is (the step windows)
    else:
        dev, _ = shard_batch(arr.astype(np.float32), mesh, dtype=dtype)
    return dev


def train_one_epoch(
    config,
    state: TrainState,
    train_step,
    loader: Iterable,
    mesh: Mesh,
    rng: jax.Array,
    lr_schedule,
    epoch: int,
    max_epoch: int,
    logger=None,
    wandb_run=None,
) -> Tuple[TrainState, Dict[str, float]]:
    from headct_foundation_tpu.data.pipeline import DevicePrefetcher

    metric_logger = MetricLogger(logger=logger)
    n_batches = len(loader) if hasattr(loader, "__len__") else None
    loader = DevicePrefetcher.wrap(loader, mesh)  # H2D overlapped with compute
    # Per-step losses are fetched in batches of LOSS_FLUSH: every value fetch
    # is a host<->device round trip (33 ms over a remote-attached chip), so
    # fetching one-by-one would serialize RTTs into the step time. Every loss
    # is still fetched, logged, and NaN-checked — the hard abort (reference:
    # engine_pretrain_mae.py:76-78) fires within LOSS_FLUSH steps instead
    # of 1. Deliberate deviation: up to LOSS_FLUSH-1 post-NaN steps run
    # before exit (in DINO they also touch the teacher EMA/center), so resume
    # from the last epoch checkpoint after an abort rather than from the
    # aborted in-memory state. Also bounds the dispatch queue depth.
    pending = []  # [(loss_device, step_idx)]

    def _flush():
        drain_pending_losses(
            pending, logger,
            lambda loss, idx: _log_step(
                loss, idx, config, metric_logger, lr_schedule, epoch,
                max_epoch, n_batches, logger, wandb_run,
            ),
        )

    for idx, batch in enumerate(metric_logger.log_every(loader)):
        if isinstance(batch, tuple):  # loaders yield (volumes, fnames)
            batch = batch[0]
        data = batch if isinstance(batch, jax.Array) else _to_device_batch(batch, mesh)
        state, metrics = train_step(state, data, rng)
        pending.append((metrics["loss"], idx))
        if len(pending) >= LOSS_FLUSH:
            _flush()

    _flush()
    return state, metric_logger.averages()


LOSS_FLUSH = 8  # steps between batched loss fetches (see train_one_epoch)


def drain_pending_losses(pending, logger, log_fn) -> None:
    """Fetch all pending (loss_device, idx) pairs in ONE device_get, hard-
    abort on any non-finite loss (reference: engine_pretrain_mae.py:76-78),
    and feed each value to the engine's per-step logging callback. Shared by
    the MAE and DINO train loops."""
    losses = jax.device_get([l for l, _ in pending])
    for loss, (_, idx) in zip(losses, pending):
        loss = float(loss)
        if not math.isfinite(loss):
            if logger:
                logger.info(f"Loss is {loss}, stopping training")
            sys.exit(1)
        log_fn(loss, idx)
    pending.clear()


def _log_step(loss, idx, config, metric_logger, lr_schedule, epoch, max_epoch,
              n_batches, logger, wandb_run):
    step_global = (n_batches or 0) * epoch + idx
    lr = float(lr_schedule(step_global))
    metric_logger.update(loss=loss, lr=lr)
    if logger:
        total = n_batches if n_batches is not None else "?"
        logger.info(
            f"Epoch {epoch + 1}/{max_epoch} [{idx + 1}/{total}]  Loss: {loss:.4f}"
        )
    if wandb_run is not None:
        wandb_run.log({"Training Loss": loss, "Training lr": lr})


def val_one_epoch(
    config,
    state: TrainState,
    eval_step,
    loader: Iterable,
    mesh: Mesh,
    rng: jax.Array,
    epoch: int,
    max_epoch: int,
    logger=None,
) -> Dict[str, float]:
    from headct_foundation_tpu.data.pipeline import DevicePrefetcher

    metric_logger = MetricLogger(logger=logger)
    loader = DevicePrefetcher.wrap(loader, mesh)
    for idx, batch in enumerate(loader):
        if isinstance(batch, tuple):
            batch = batch[0]
        data = batch if isinstance(batch, jax.Array) else _to_device_batch(batch, mesh)
        metrics = eval_step(state, data, jax.random.fold_in(rng, idx))
        loss = float(jax.device_get(metrics["loss"]))
        metric_logger.update(loss=loss)
        if logger:
            logger.info(f"Val Epoch {epoch + 1}/{max_epoch} [{idx + 1}]  Loss: {loss:.4f}")
    return metric_logger.averages()


def trainer(
    config,
    state: TrainState,
    train_step,
    eval_step,
    train_loader,
    val_loader,
    mesh: Mesh,
    rng: jax.Array,
    lr_schedule,
    max_epochs: int,
    val_every: int,
    logger=None,
    start_epoch: int = 0,
    wandb_run=None,
    checkpoint_extra: Optional[Dict[str, Any]] = None,
) -> Tuple[TrainState, float]:
    """Epoch loop with latest/best checkpointing (reference: engine_pretrain_mae.py:149-265)."""
    from headct_foundation_tpu.utils.misc import profile_trace

    best_loss = float("inf")
    save_name = config.MODEL.SAVE_NAME
    for epoch in range(start_epoch, max_epochs):
        t0 = time.time()
        if hasattr(train_loader, "set_epoch"):
            # Keeps the loader's cross-epoch lookahead aligned (pretrain
            # indices ignore the epoch, so semantics are unchanged).
            train_loader.set_epoch(epoch)
        # HEADCT_PROFILE_DIR captures a jax.profiler trace of the first epoch.
        with profile_trace() if epoch == start_epoch else _nullcontext():
            state, train_stats = train_one_epoch(
                config, state, train_step, train_loader, mesh, rng, lr_schedule,
                epoch, max_epochs, logger=logger, wandb_run=wandb_run,
            )
        if logger:
            logger.info(
                f"Epoch {epoch + 1} done in {time.time() - t0:.1f}s  "
                f"train loss {train_stats.get('loss', float('nan')):.4f}  "
                f"iter {train_stats.get('iter_time', 0.0):.3f}s "
                f"(data {train_stats.get('data_time', 0.0):.3f}s)"
            )
        # every process enters (cross-process-sharded states gather with a
        # collective inside); process 0 alone writes the file
        save_checkpoint(
            state, epoch, best_loss, config.MODEL.DIR, f"latest_{save_name}",
            logger=logger, extra=checkpoint_extra,
            async_save=bool(config.TRAIN.ASYNC_CKPT),
            fmt=str(config.TRAIN.CKPT_FORMAT),
        )
        if (epoch + 1) % val_every == 0 and val_loader is not None:
            val_stats = val_one_epoch(
                config, state, eval_step, val_loader, mesh, rng, epoch,
                max_epochs, logger=logger,
            )
            val_loss = val_stats.get("loss", float("inf"))
            if wandb_run is not None:
                wandb_run.log({"Validation Loss": val_loss})
            if val_loss < best_loss:
                best_loss = val_loss
                save_checkpoint(
                    state, epoch, best_loss, config.MODEL.DIR,
                    f"best_{save_name}", logger=logger, extra=checkpoint_extra,
                    async_save=bool(config.TRAIN.ASYNC_CKPT),
                    fmt=str(config.TRAIN.CKPT_FORMAT),
                )
    if hasattr(train_loader, "close"):
        train_loader.close()  # stop the post-final-epoch lookahead
    wait_for_saves()  # join the in-flight async checkpoint write
    return state, best_loss


def tester(
    config, state, eval_step, test_loader, mesh, rng, logger=None, wandb_run=None
) -> Dict[str, float]:
    stats = val_one_epoch(
        config, state, eval_step, test_loader, mesh, rng, epoch=0, max_epoch=1,
        logger=logger,
    )
    if wandb_run is not None and "loss" in stats:
        wandb_run.log({"Test Loss": stats["loss"]})
    return stats
