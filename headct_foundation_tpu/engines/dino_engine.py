"""DINO pretraining engine: student/teacher EMA, on-device multi-crop.

Mirrors the reference engine surface (reference: engine_pretrain_dino.py) with
a TPU-first redesign. ONE jitted train step contains:

* the FULL multi-crop augmentation (reference runs it on CPU workers — its
  hot-loop bottleneck, SURVEY.md §3.2; here it's fused crop+resize on device),
* teacher forward on the 2 global crops, student forward on ALL crops as a
  single batched pass (every crop is the same 96^3 size, so the reference's
  size-grouped loop — misc.py:463-484 — collapses to one MXU-saturating
  batch),
* DINO loss with centered/sharpened teacher (losses/dino_loss.py); the
  center's cross-replica all-reduce (reference: losses.py:97) is implicit in
  the sharded-batch mean,
* per-iter weight-decay schedule on the optimizer (reference:
  engine_pretrain_dino.py:62-65), last-layer grad cancel during warmup epochs
  (reference: :95), and the teacher EMA update as a pytree lerp (reference:
  misc.py:386-397).

The reference indexes the EMA momentum by within-epoch idx rather than global
step (engine_pretrain_dino.py:104) — kept behind ``momentum_global_step``
(default False == reference behavior).
"""

from __future__ import annotations

import math
import sys
import time
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from headct_foundation_tpu.data.augment import dino_multicrop
# single shared host->sharded-device helper (tests import it from either)
from headct_foundation_tpu.engines.mae_engine import _to_device_batch
from headct_foundation_tpu.losses.dino_loss import (
    dino_loss,
    teacher_temp_schedule,
    update_center,
)
from headct_foundation_tpu.models.dino_head import DINOHead
from headct_foundation_tpu.models.multicrop import multicrop_forward
from headct_foundation_tpu.models.vit import ViT
from headct_foundation_tpu.optim.lr_sched import get_lr_schedule
from headct_foundation_tpu.optim.optimizers import get_optimizer
from headct_foundation_tpu.optim.schedules import get_momentum_schedule, get_wd_schedule
from headct_foundation_tpu.parallel.mesh import batch_sharding, param_shardings
from headct_foundation_tpu.utils.checkpoint import save_checkpoint, wait_for_saves
from headct_foundation_tpu.utils.metrics import MetricLogger


class DINOTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any          # student {'backbone': ..., 'head': ...}
    teacher_params: Any  # same structure, EMA of student
    head_stats: Any          # student head BatchNorm running stats ({} w/o BN)
    teacher_head_stats: Any  # teacher head BatchNorm running stats
    opt_state: Any
    center: jnp.ndarray  # [1, out_dim]
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    backbone_apply: Callable = struct.field(pytree_node=False)
    head_apply: Callable = struct.field(pytree_node=False)


def build_vit_model(config, dtype=jnp.bfloat16, lora: bool = False) -> ViT:
    """ViT backbone from config keys (reference: main_pretrain_dino.py:110-145)."""
    return ViT(
        lora=lora,
        in_chans=config.VIT.IN_CHANS,
        img_size=config.VIT.INPUT_SIZE,
        patch_size=config.VIT.PATCH_SIZE,
        hidden_size=config.VIT.HIDDEN_SIZE,
        mlp_dim=config.VIT.MLP_DIM,
        num_layers=config.VIT.NUM_LAYERS,
        num_heads=config.VIT.NUM_HEADS,
        pos_embed=config.VIT.POS_EMBED,
        classification=False,
        dropout_rate=config.VIT.DROPOUT_RATE,
        spatial_dims=config.VIT.SPATIAL_DIMS,
        num_register_tokens=config.VIT.NUM_REGISTER_TOKENS,
        qkv_bias=config.VIT.USE_BIAS,
        norm_layer=config.VIT.NORM_LAYER,
        remat=config.PARALLEL.REMAT,
        dtype=dtype,
    )


def build_dino_head(config, dtype=jnp.bfloat16) -> DINOHead:
    return DINOHead(
        in_dim=config.VIT.HIDDEN_SIZE,
        out_dim=config.DINO.HEAD_N_PROTOTYPES,
        use_bn=config.DINO.USE_BN,
        norm_last_layer=config.DINO.NORM_LAST_LAYER,
        nlayers=config.DINO.HEAD_N_LAYERS,
        hidden_dim=config.DINO.HEAD_HIDDEN_DIM,
        bottleneck_dim=config.DINO.BOTTLENECK_DIM,
        dtype=dtype,
    )


def dino_trainable_mask(params: Any, config) -> Any:
    """False for frozen leaves: sincos position embeddings and (when
    NORM_LAST_LAYER) the weight-norm gain of the head's last layer
    (reference: dino_head.py:27-29)."""

    def _mask(path, leaf):
        names = [str(getattr(k, "key", k)) for k in path]
        if config.VIT.POS_EMBED == "sincos" and "position_embeddings" in names:
            return False
        if (
            config.DINO.NORM_LAST_LAYER
            and "last_layer" in names
            and names[-1] == "weight_g"
        ):
            return False
        return True

    return jax.tree_util.tree_map_with_path(_mask, params)


def create_train_state(
    config,
    mesh: Mesh,
    rng: jax.Array,
    total_steps: int,
    num_warmup_steps: int,
    niter_per_ep: int,
    dtype=jnp.bfloat16,
) -> Tuple[DINOTrainState, Any, Callable, np.ndarray, np.ndarray, np.ndarray]:
    """Returns (state, state_shardings, lr_schedule, wd_sched, momentum_sched,
    teacher_temp_sched)."""
    from headct_foundation_tpu.ops.attention import (
        attention_mesh,
        set_pallas_min_t,
    )

    set_pallas_min_t(config.PARALLEL.PALLAS_MIN_T)
    backbone = build_vit_model(config, dtype=dtype)
    head = build_dino_head(config, dtype=dtype)
    roi = config.MODEL.ROI
    sample = jnp.zeros((1, config.VIT.IN_CHANS, roi[0], roi[1], roi[2]), dtype)

    def _init(rng):
        # init traces use batch-1 samples; no shard_map around attention
        with attention_mesh(None):
            kb, kh = jax.random.split(rng)
            b_params = backbone.init(kb, sample)["params"]
            h_vars = head.init(kh, jnp.zeros((1, config.VIT.HIDDEN_SIZE), dtype))
        return {"backbone": b_params, "head": h_vars["params"]}, h_vars.get(
            "batch_stats", {}
        )

    # one jitted init returning (params, stats) with per-output shardings —
    # running _init twice would double the startup init compute/compile
    params_shape, stats_shape = jax.eval_shape(_init, rng)
    p_shardings = param_shardings(params_shape, mesh)
    replicated = NamedSharding(mesh, P())
    s_shardings = jax.tree.map(lambda _: replicated, stats_shape)
    params, head_stats = jax.jit(
        _init, out_shardings=(p_shardings, s_shardings)
    )(rng)
    teacher_params = jax.tree.map(jnp.copy, params)
    teacher_head_stats = jax.tree.map(jnp.copy, head_stats)

    lr_schedule = get_lr_schedule(
        config, config.TRAIN.BASE_LR, num_warmup_steps, total_steps, config.TRAIN.MIN_LR
    )
    wd_sched = get_wd_schedule(config, niter_per_ep)
    momentum_sched = get_momentum_schedule(config, niter_per_ep)
    temp_sched = teacher_temp_schedule(
        config.DINO.WARMUP_TEACHER_TEMP,
        config.DINO.TEACHER_TEMP,
        config.DINO.WARMUP_TEACHER_EPOCHS,
        config.TRAIN.MAX_EPOCHS,
    )

    wd_dev = jnp.asarray(wd_sched, jnp.float32)

    def wd_fn(step):
        return jnp.take(wd_dev, jnp.minimum(step, len(wd_sched) - 1))

    mask = dino_trainable_mask(params, config)
    tx = get_optimizer(
        config,
        lr_schedule,
        weight_decay=wd_fn,
        grad_clip=config.TRAIN.GRAD_CLIP or None,
        trainable_mask=mask,
    )

    state = DINOTrainState(
        step=jnp.zeros([], jnp.int32),
        params=params,
        teacher_params=teacher_params,
        head_stats=head_stats,
        teacher_head_stats=teacher_head_stats,
        opt_state=tx.init(params),
        center=jnp.zeros((1, config.DINO.HEAD_N_PROTOTYPES), jnp.float32),
        tx=tx,
        backbone_apply=backbone.apply,
        head_apply=head.apply,
    )
    replicated = NamedSharding(mesh, P())
    state_shardings = jax.tree.map(lambda _: replicated, state)
    state_shardings = state_shardings.replace(
        params=p_shardings, teacher_params=p_shardings
    )
    state = jax.device_put(state, state_shardings)
    return state, state_shardings, lr_schedule, wd_sched, momentum_sched, temp_sched


def make_train_step(config, mesh: Mesh):
    """Jitted DINO step: (state, batch, rng, momentum, teacher_temp,
    cancel_last_layer) -> (state, metrics)."""
    from headct_foundation_tpu.ops.attention import attention_mesh

    ncrops = config.DINO.LOCAL_CROP_NUM + 2
    final_size = tuple(config.MODEL.ROI)
    global_size = config.DINO.GLOBAL_CROP_SIZE[0]
    local_size = config.DINO.LOCAL_CROP_SIZE[0]
    local_num = config.DINO.LOCAL_CROP_NUM
    use_bn = config.DINO.USE_BN
    accum_steps = int(getattr(config.TRAIN, "ACCUM_STEPS", 1))
    freeze_flag_dtype = jnp.float32

    def train_step(
        state: DINOTrainState,
        batch: jnp.ndarray,
        rng: jax.Array,
        momentum: jnp.ndarray,
        teacher_temp: jnp.ndarray,
        cancel_last_layer: jnp.ndarray,
    ):
        step_rng = jax.random.fold_in(rng, state.step)
        crop_rng, _ = jax.random.split(step_rng)

        # Teacher/student heads: with BN, both networks run train-mode batch
        # statistics and keep their own running stats (the reference keeps
        # teacher in .train() and never broadcasts buffers —
        # engine_pretrain_dino.py:58, main_pretrain_dino.py:190
        # broadcast_buffers=False).
        def _head_fn(params, stats, stats_box):
            def head_apply(feats):
                if use_bn:
                    out, upd = state.head_apply(
                        {"params": params, "batch_stats": stats},
                        feats,
                        use_running_average=False,
                        mutable=["batch_stats"],
                    )
                    stats_box.append(upd["batch_stats"])
                    return out
                return state.head_apply({"params": params}, feats)

            return head_apply

        def one_micro(mb, micro_idx, head_stats, teacher_head_stats):
            """Crops + teacher forward + student loss/grads for one
            micro-batch. Teacher: 2 global crops via multicrop_forward (one
            batched pass — all crops share the final size, so the
            reference's size-grouped MultiCropWrapper loop collapses to a
            single group), CLS -> head."""
            micro_rng = jax.random.fold_in(crop_rng, micro_idx)
            crops = dino_multicrop(
                micro_rng,
                mb,
                final_size=final_size,
                global_crop_size=global_size,
                local_crop_size=local_size,
                local_crops_number=local_num,
            )
            # The reference trains BOTH networks in .train() mode
            # (engine_pretrain_dino.py:56-57), so backbone dropout is active
            # for the student AND the teacher when VIT.DROPOUT_RATE > 0
            # (flax Dropout short-circuits at rate 0 — free by default).
            t_drop = jax.random.fold_in(micro_rng, 101)
            s_drop = jax.random.fold_in(micro_rng, 102)
            t_stats_box: list = []
            teacher_output = multicrop_forward(
                lambda x: state.backbone_apply(
                    {"params": state.teacher_params["backbone"]}, x,
                    deterministic=False, rngs={"dropout": t_drop},
                ),
                _head_fn(state.teacher_params["head"], teacher_head_stats,
                         t_stats_box),
                crops[:2],
            )
            new_t_stats = t_stats_box[0] if t_stats_box else teacher_head_stats
            teacher_output = jax.lax.stop_gradient(teacher_output)

            def loss_fn(params):
                s_stats_box: list = []
                student_output = multicrop_forward(
                    lambda x: state.backbone_apply(
                        {"params": params["backbone"]}, x,
                        deterministic=False, rngs={"dropout": s_drop},
                    ),
                    _head_fn(params["head"], head_stats, s_stats_box),
                    crops,
                )
                new_stats = s_stats_box[0] if s_stats_box else head_stats
                loss = dino_loss(
                    student_output, teacher_output, state.center, teacher_temp,
                    ncrops,
                )
                return loss, new_stats

            (loss, new_s_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            t_mean = jnp.mean(teacher_output.astype(jnp.float32), axis=0)
            return loss, grads, t_mean, new_s_stats, new_t_stats

        if accum_steps == 1:
            loss, grads, t_mean, new_head_stats, new_teacher_head_stats = (
                one_micro(batch, 0, state.head_stats, state.teacher_head_stats)
            )
        else:
            B = batch.shape[0]
            assert B % accum_steps == 0, (B, accum_steps)
            micros = batch.reshape(
                (accum_steps, B // accum_steps) + batch.shape[1:]
            )

            def body(carry, inp):
                gsum, lsum, tsum, h_stats, t_stats = carry
                mb, i = inp
                loss, grads, t_mean, h_stats, t_stats = one_micro(
                    mb, i, h_stats, t_stats
                )
                gsum = jax.tree.map(
                    lambda a, g: a + g.astype(jnp.float32), gsum, grads
                )
                return (gsum, lsum + loss, tsum + t_mean, h_stats, t_stats), None

            gsum0 = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params
            )
            tsum0 = jnp.zeros_like(state.center[0], dtype=jnp.float32)
            (gsum, lsum, tsum, new_head_stats, new_teacher_head_stats), _ = (
                jax.lax.scan(
                    body,
                    (gsum0, jnp.float32(0), tsum0, state.head_stats,
                     state.teacher_head_stats),
                    (micros, jnp.arange(accum_steps)),
                )
            )
            grads = jax.tree.map(
                lambda g, p: (g / accum_steps).astype(p.dtype),
                gsum, state.params,
            )
            loss = lsum / accum_steps
            t_mean = tsum / accum_steps

        # Cancel last-layer updates during warmup epochs (reference:
        # misc.py:366-371 sets p.grad = None, so torch AdamW skips the param
        # ENTIRELY — no moment update and no weight decay). Masking the grads
        # keeps the Adam moments at zero (0-in -> 0-state), and masking the
        # post-optimizer update kills the decoupled weight-decay term too —
        # the parameter is bit-frozen like the reference's. (Known residual
        # deviation: optax's bias correction uses the global step count, so
        # the first few post-unfreeze updates are slightly smaller than
        # torch's fresh per-param count; transient, ~20 steps.)
        keep = (1.0 - cancel_last_layer).astype(freeze_flag_dtype)

        def _mask_last_layer(tree):
            return jax.tree_util.tree_map_with_path(
                lambda path, g: g * keep.astype(g.dtype)
                if any(str(getattr(k, "key", k)) == "last_layer" for k in path)
                else g,
                tree,
            )

        grads = _mask_last_layer(grads)
        updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
        updates = _mask_last_layer(updates)
        new_params = optax.apply_updates(state.params, updates)

        # Teacher EMA (reference: misc.py:386-397).
        m = momentum.astype(jnp.float32)
        new_teacher = jax.tree.map(
            lambda t, s: (t.astype(jnp.float32) * m
                          + s.astype(jnp.float32) * (1.0 - m)).astype(t.dtype),
            state.teacher_params,
            new_params,
        )

        # Center EMA from the mean teacher output over the whole (possibly
        # accumulated) batch. update_center takes the mean over axis 0, so
        # feeding it the already-averaged [1, K] row keeps the canonical
        # formula (losses/dino_loss.py:79-92, reference momentum 0.9).
        new_center = update_center(state.center, t_mean[None]).astype(
            state.center.dtype
        )

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            teacher_params=new_teacher,
            head_stats=new_head_stats,
            teacher_head_stats=new_teacher_head_stats,
            opt_state=new_opt_state,
            center=new_center,
        )
        return new_state, {"loss": loss}

    from headct_foundation_tpu.data.device_preprocess import wire_to_compute

    def train_step_scoped(state, batch, rng, momentum, teacher_temp, cancel):
        # Scoped at trace time: shard the Pallas attention over THIS mesh.
        with attention_mesh(mesh):
            # Wire-format batches (fp16 windowed, or 1-ch int16 HU expanded
            # to the window stack here — before the multicrop) → bfloat16.
            batch = wire_to_compute(batch, config, int(config.VIT.IN_CHANS))
            return train_step(state, batch, rng, momentum, teacher_temp, cancel)

    return jax.jit(
        train_step_scoped,
        in_shardings=(None, batch_sharding(mesh), None, None, None, None),
        donate_argnums=(0,),
    )


def make_eval_step(config, mesh: Mesh):
    """Validation: same loss computed without updates (reference:
    engine_pretrain_dino.py:128-205 val_one_epoch)."""
    from headct_foundation_tpu.ops.attention import attention_mesh

    ncrops = config.DINO.LOCAL_CROP_NUM + 2
    final_size = tuple(config.MODEL.ROI)

    use_bn = config.DINO.USE_BN

    def _head(state, params, stats, x):
        if use_bn:
            return state.head_apply(
                {"params": params, "batch_stats": stats}, x,
                use_running_average=True,
            )
        return state.head_apply({"params": params}, x)

    def eval_step(state, batch, rng, teacher_temp):
        crops = dino_multicrop(
            rng,
            batch,
            final_size=final_size,
            global_crop_size=config.DINO.GLOBAL_CROP_SIZE[0],
            local_crop_size=config.DINO.LOCAL_CROP_SIZE[0],
            local_crops_number=config.DINO.LOCAL_CROP_NUM,
        )
        teacher_output = multicrop_forward(
            lambda x: state.backbone_apply(
                {"params": state.teacher_params["backbone"]}, x
            ),
            lambda f: _head(
                state, state.teacher_params["head"], state.teacher_head_stats, f
            ),
            crops[:2],
        )
        student_output = multicrop_forward(
            lambda x: state.backbone_apply({"params": state.params["backbone"]}, x),
            lambda f: _head(state, state.params["head"], state.head_stats, f),
            crops,
        )
        loss = dino_loss(
            student_output, teacher_output, state.center, teacher_temp, ncrops
        )
        return {"loss": loss}

    from headct_foundation_tpu.data.device_preprocess import wire_to_compute

    def eval_step_scoped(state, batch, rng, teacher_temp):
        with attention_mesh(mesh):
            batch = wire_to_compute(batch, config, int(config.VIT.IN_CHANS))
            return eval_step(state, batch, rng, teacher_temp)

    return jax.jit(
        eval_step_scoped, in_shardings=(None, batch_sharding(mesh), None, None)
    )


def train_one_epoch(
    config, state, train_step, loader, mesh, rng,
    lr_schedule, wd_sched, momentum_sched, temp_sched,
    epoch: int, max_epoch: int, logger=None, wandb_run=None,
    momentum_global_step: bool = False,
) -> Tuple[DINOTrainState, Dict[str, float]]:
    from headct_foundation_tpu.data.pipeline import DevicePrefetcher

    metric_logger = MetricLogger(logger=logger)
    n_batches = len(loader) if hasattr(loader, "__len__") else 0
    loader = DevicePrefetcher.wrap(loader, mesh)  # H2D overlapped with compute
    cancel = jnp.asarray(1.0 if epoch < config.DINO.FREEZE_LAST_LAYER else 0.0)
    temp = jnp.asarray(temp_sched[min(epoch, len(temp_sched) - 1)], jnp.float32)

    from headct_foundation_tpu.engines.mae_engine import (
        LOSS_FLUSH,
        drain_pending_losses,
    )

    # Batched loss fetches: every value fetch is a host<->device round trip;
    # fetch LOSS_FLUSH at a time (see mae_engine.train_one_epoch). NaN abort
    # fires within LOSS_FLUSH steps.
    pending = []

    def _log(loss, idx):
        it = n_batches * epoch + idx
        lr = float(lr_schedule(it))
        wd = float(wd_sched[min(it, len(wd_sched) - 1)])
        metric_logger.update(loss=loss, lr=lr, wd=wd)
        if logger:
            logger.info(
                f"Epoch {epoch + 1}/{max_epoch} [{idx + 1}/{n_batches}]  Loss: {loss:.4f}"
            )
        if wandb_run is not None:
            wandb_run.log(
                {"Training Loss": loss, "Training lr": lr, "Training wd": wd}
            )

    def _flush():
        drain_pending_losses(pending, logger, _log)

    for idx, batch_data in enumerate(metric_logger.log_every(loader)):
        batch = batch_data[0] if isinstance(batch_data, tuple) else batch_data
        it = n_batches * epoch + idx
        # Reference quirk: momentum indexed by within-epoch idx, not global it
        # (engine_pretrain_dino.py:104). momentum_global_step=True fixes it.
        m_idx = min(it if momentum_global_step else idx, len(momentum_sched) - 1)
        m = jnp.asarray(momentum_sched[m_idx], jnp.float32)

        data = batch if isinstance(batch, jax.Array) else _to_device_batch(batch, mesh)
        state, metrics = train_step(state, data, rng, m, temp, cancel)
        pending.append((metrics["loss"], idx))
        if len(pending) >= LOSS_FLUSH:
            _flush()

    _flush()
    return state, metric_logger.averages()


def val_one_epoch(
    config, state, eval_step, loader, mesh, rng, temp_sched, epoch, max_epoch,
    logger=None,
) -> Dict[str, float]:
    from headct_foundation_tpu.data.pipeline import DevicePrefetcher

    metric_logger = MetricLogger(logger=logger)
    loader = DevicePrefetcher.wrap(loader, mesh)
    temp = jnp.asarray(temp_sched[min(epoch, len(temp_sched) - 1)], jnp.float32)
    for idx, batch_data in enumerate(loader):
        batch = batch_data[0] if isinstance(batch_data, tuple) else batch_data
        data = batch if isinstance(batch, jax.Array) else _to_device_batch(batch, mesh)
        metrics = eval_step(state, data, jax.random.fold_in(rng, idx), temp)
        loss = float(jax.device_get(metrics["loss"]))
        metric_logger.update(loss=loss)
        if logger:
            logger.info(f"Val Epoch {epoch + 1}/{max_epoch} [{idx + 1}]  Loss: {loss:.4f}")
    return metric_logger.averages()


def trainer(
    config, state, train_step, eval_step, train_loader, val_loader, mesh, rng,
    lr_schedule, wd_sched, momentum_sched, temp_sched, max_epochs, val_every,
    logger=None, start_epoch: int = 0, wandb_run=None,
) -> Tuple[DINOTrainState, float]:
    best_loss = float("inf")
    save_name = config.MODEL.SAVE_NAME
    from contextlib import nullcontext

    from headct_foundation_tpu.utils.misc import profile_trace

    for epoch in range(start_epoch, max_epochs):
        t0 = time.time()
        if hasattr(train_loader, "set_epoch"):
            train_loader.set_epoch(epoch)
        # HEADCT_PROFILE_DIR captures a jax.profiler trace of the first epoch.
        with profile_trace() if epoch == start_epoch else nullcontext():
            state, stats = train_one_epoch(
                config, state, train_step, train_loader, mesh, rng, lr_schedule,
                wd_sched, momentum_sched, temp_sched, epoch, max_epochs,
                logger=logger, wandb_run=wandb_run,
            )
        if logger:
            logger.info(
                f"Epoch {epoch + 1} done in {time.time() - t0:.1f}s  "
                f"train loss {stats.get('loss', float('nan')):.4f}  "
                f"iter {stats.get('iter_time', 0.0):.3f}s "
                f"(data {stats.get('data_time', 0.0):.3f}s)"
            )
        # every process enters (cross-process-sharded states gather with a
        # collective inside); process 0 alone writes the file
        save_checkpoint(
            _ckpt_view(state), epoch, best_loss, config.MODEL.DIR,
            f"latest_{save_name}", logger=logger,
            extra={"momentum_model_state_dict": state.teacher_params,
                   "center": state.center,
                   "head_stats": state.head_stats,
                   "teacher_head_stats": state.teacher_head_stats},
            async_save=bool(config.TRAIN.ASYNC_CKPT),
            fmt=str(config.TRAIN.CKPT_FORMAT),
        )
        if (epoch + 1) % val_every == 0 and val_loader is not None:
            val_stats = val_one_epoch(
                config, state, eval_step, val_loader, mesh, rng, temp_sched,
                epoch, max_epochs, logger=logger,
            )
            val_loss = val_stats.get("loss", float("inf"))
            if wandb_run is not None:
                wandb_run.log({"Validation Loss": val_loss})
            if val_loss < best_loss:
                best_loss = val_loss
                save_checkpoint(
                    _ckpt_view(state), epoch, best_loss, config.MODEL.DIR,
                    f"best_{save_name}", logger=logger,
                    extra={"momentum_model_state_dict": state.teacher_params,
                           "center": state.center,
                           "head_stats": state.head_stats,
                           "teacher_head_stats": state.teacher_head_stats},
                    async_save=bool(config.TRAIN.ASYNC_CKPT),
                    fmt=str(config.TRAIN.CKPT_FORMAT),
                )
    if hasattr(train_loader, "close"):
        train_loader.close()  # stop the post-final-epoch lookahead
    wait_for_saves()  # join the in-flight async checkpoint write
    return state, best_loss


class _CkptView:
    """Adapter presenting a DINOTrainState through the save_checkpoint API."""

    def __init__(self, state: DINOTrainState):
        self.step = state.step
        self.params = state.params
        self.opt_state = state.opt_state


def _ckpt_view(state: DINOTrainState) -> _CkptView:
    return _CkptView(state)


def tester(config, state, eval_step, test_loader, mesh, rng, temp_sched,
           logger=None, wandb_run=None) -> Dict[str, float]:
    stats = val_one_epoch(
        config, state, eval_step, test_loader, mesh, rng, temp_sched,
        epoch=0, max_epoch=1, logger=logger,
    )
    if wandb_run is not None and "loss" in stats:
        wandb_run.log({"Test Loss": stats["loss"]})
    return stats
