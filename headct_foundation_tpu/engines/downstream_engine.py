"""Downstream engine: fine-tune / linear-probe / LoRA / few-shot classification.

Mirrors the reference engine surface (reference: engine_downstream.py):

* ViT forward -> CLS slice for the linear classifier, full token sequence for
  the attentive classifier (reference: engine_downstream.py:85-89),
* cross-entropy loss, dual optimizers — classifier LR = 100 x backbone LR
  (reference: main_downstream.py:200-208) — expressed as one
  ``optax.multi_transform`` over the {model, classifier} partition,
* global-norm gradient clipping per group (reference:
  engine_downstream.py:107-110 uses clip_grad_norm_, unlike pretrain's
  per-param clip),
* --freeze (TRAIN.LOCK) drops the backbone from optimization; --lora trains
  only lora/bias/embeddings/norm backbone params (reference:
  misc.py:349-359),
* model selection by mean validation AUROC with best-state copy (reference:
  engine_downstream.py:381-412), tester saves a
  {fnames, preds, targets} pickle and ROC/PR plots (reference:
  engine_downstream.py:234-242).

Classifier BatchNorm statistics are computed over the global (sharded) batch
under jit — the TPU-native SyncBatchNorm.
"""

from __future__ import annotations

import math
import os
import pickle
import sys
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from headct_foundation_tpu.data.augment import vit_augment
from headct_foundation_tpu.engines.dino_engine import build_vit_model
from headct_foundation_tpu.models.classifier import AttentionClassifier, LinearClassifier
from headct_foundation_tpu.optim.lr_sched import get_lr_schedule
from headct_foundation_tpu.optim.optimizers import get_optimizer
from headct_foundation_tpu.parallel.mesh import batch_sharding, param_shardings
from headct_foundation_tpu.utils.checkpoint import save_checkpoint, wait_for_saves
from headct_foundation_tpu.utils.metrics import MetricLogger, multiclass_metrics
from headct_foundation_tpu.utils.plots import plot_pr_curve


class DownstreamTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any       # {'model': vit params, 'classifier': classifier params}
    batch_stats: Any  # classifier BN running stats
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    model_apply: Callable = struct.field(pytree_node=False)
    classifier_apply: Callable = struct.field(pytree_node=False)
    classifier_kind: str = struct.field(pytree_node=False, default="linear")


def build_classifier(config, dtype=jnp.bfloat16):
    """Classifier choice (reference: main_downstream.py:141-154)."""
    kind = config.TRAIN.CLASSIFIER
    if kind == "linear":
        return LinearClassifier(
            dim=config.VIT.HIDDEN_SIZE, num_classes=config.DATA.NUM_CLASSES,
            dtype=dtype,
        )
    if kind == "attentive":
        return AttentionClassifier(
            dim=config.VIT.HIDDEN_SIZE, num_classes=config.DATA.NUM_CLASSES,
            num_heads=config.VIT.NUM_HEADS, qkv_bias=config.VIT.USE_BIAS,
            dtype=dtype,
        )
    raise NotImplementedError(f"Unknown classifier: {kind}")


# Reference LoRA rule: train lora/bias/embeddings/norm params only
# (reference: misc.py:349-359, substring match on parameter names).
# Single source of truth — used by both the mask tree and the optimizer
# label routing below.
_LORA_TRAINABLE_SUBSTRINGS = ("lora", "bias", "embeddings", "norm")


def lora_trainable_mask(params: Any) -> Any:
    """Per-leaf bool tree of the reference LoRA trainability rule."""

    def _mask(path, leaf):
        joined = "/".join(str(getattr(k, "key", k)) for k in path).lower()
        return any(s in joined for s in _LORA_TRAINABLE_SUBSTRINGS)

    return jax.tree_util.tree_map_with_path(_mask, params)


def create_train_state(
    config,
    mesh: Mesh,
    rng: jax.Array,
    total_steps: int,
    num_warmup_steps: int,
    dtype=jnp.bfloat16,
) -> Tuple[DownstreamTrainState, Any, Callable]:

    from headct_foundation_tpu.ops.attention import (
        attention_mesh,
        set_pallas_min_t,
    )

    set_pallas_min_t(config.PARALLEL.PALLAS_MIN_T)
    model = build_vit_model(config, dtype=dtype, lora=config.TRAIN.LORA)
    classifier = build_classifier(config, dtype=dtype)
    roi = config.MODEL.ROI
    sample = jnp.zeros((2, config.VIT.IN_CHANS, roi[0], roi[1], roi[2]), dtype)
    kind = config.TRAIN.CLASSIFIER

    def _init(rng):
        km, kc = jax.random.split(rng)
        # init traces use small samples; no shard_map around attention
        with attention_mesh(None):
            m_params = model.init(km, sample)["params"]
        if kind == "linear":
            feat = jnp.zeros((2, config.VIT.HIDDEN_SIZE), dtype)
        else:
            feat = jnp.zeros((2, 5, config.VIT.HIDDEN_SIZE), dtype)
        c_vars = classifier.init(kc, feat)
        return (
            {"model": m_params, "classifier": c_vars["params"]},
            {"classifier": c_vars.get("batch_stats", {})},
        )

    (params_shape, stats_shape) = jax.eval_shape(_init, rng)
    p_shardings = param_shardings(params_shape, mesh)
    replicated = NamedSharding(mesh, P())
    s_shardings = jax.tree.map(lambda _: replicated, stats_shape)
    params, batch_stats = jax.jit(
        _init, out_shardings=(p_shardings, s_shardings)
    )(rng)

    # LR schedules: classifier at 100x (reference: main_downstream.py:200-210).
    lr_model = get_lr_schedule(
        config, config.TRAIN.BASE_LR, num_warmup_steps, total_steps,
        config.TRAIN.BASE_LR * 1e-3,
    )
    lr_clf = get_lr_schedule(
        config, config.TRAIN.BASE_LR * 1e2, num_warmup_steps, total_steps,
        config.TRAIN.BASE_LR * 1e-1,
    )

    # Per-leaf routing: classifier params get the 100x-LR optimizer; frozen
    # backbone leaves (LOCK, non-LoRA params under --lora, sincos position
    # embeddings) get zero updates; the rest get the backbone optimizer.
    def _label(path, _leaf):
        top = str(getattr(path[0], "key", path[0]))
        if top == "classifier":
            return "classifier"
        names = [str(getattr(k, "key", k)) for k in path]
        if config.TRAIN.LOCK:
            return "freeze"
        if config.VIT.POS_EMBED == "sincos" and "position_embeddings" in names:
            return "freeze"
        if config.TRAIN.LORA:
            joined = "/".join(names[1:]).lower()
            if not any(s in joined for s in _LORA_TRAINABLE_SUBSTRINGS):
                return "freeze"
        return "model"

    labels = jax.tree_util.tree_map_with_path(_label, params)

    grad_clip = config.TRAIN.GRAD_CLIP or None
    model_tx = get_optimizer(config, lr_model)
    clf_tx = get_optimizer(config, lr_clf)
    if grad_clip:
        # global-norm clip per group (reference: engine_downstream.py:107-110)
        model_tx = optax.chain(optax.clip_by_global_norm(grad_clip), model_tx)
        clf_tx = optax.chain(optax.clip_by_global_norm(grad_clip), clf_tx)

    tx = optax.multi_transform(
        {"model": model_tx, "classifier": clf_tx, "freeze": optax.set_to_zero()},
        labels,
    )

    state = DownstreamTrainState(
        step=jnp.zeros([], jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        model_apply=model.apply,
        classifier_apply=classifier.apply,
        classifier_kind=kind,
    )
    state_shardings = jax.tree.map(lambda _: replicated, state)
    state_shardings = state_shardings.replace(params=p_shardings)
    state = jax.device_put(state, state_shardings)
    return state, state_shardings, (lr_model, lr_clf)


def _features(state, params, batch, kind, dropout_rng=None):
    """Backbone features. A dropout_rng makes the forward NON-deterministic
    (backbone dropout active) — the reference trains the downstream model in
    .train() mode (engine_downstream.py:65), so with VIT.DROPOUT_RATE > 0
    the train step must run dropout; eval passes None (.eval() parity)."""
    if dropout_rng is not None:
        tokens, _ = state.model_apply(
            {"params": params["model"]}, batch, deterministic=False,
            rngs={"dropout": dropout_rng},
        )
    else:
        tokens, _ = state.model_apply({"params": params["model"]}, batch)
    if kind == "linear":
        return tokens[:, 0, :]  # CLS (reference: engine_downstream.py:85-86)
    return tokens  # full sequence for attentive classifier


def make_train_step(config, mesh: Mesh, lock: Optional[bool] = None,
                    compute_dtype=jnp.bfloat16):
    from headct_foundation_tpu.ops.attention import attention_mesh

    kind = config.TRAIN.CLASSIFIER
    lock = config.TRAIN.LOCK if lock is None else lock

    from headct_foundation_tpu.data.device_preprocess import wire_to_compute

    in_chans = int(config.VIT.IN_CHANS)

    def train_step(state: DownstreamTrainState, batch, target, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        # wire -> windowed channels FIRST (hu16 batches window on device;
        # the reference augments windowed volumes), then the per-step
        # augmentation, in compute_dtype (bf16 on device; float32 for the
        # torch-twin oracle)
        batch = wire_to_compute(batch, config, in_chans, dtype=compute_dtype)
        batch = vit_augment(step_rng, batch)

        drop_rng = jax.random.fold_in(step_rng, 1)

        def loss_fn(params):
            feats = _features(state, params, batch, kind,
                              dropout_rng=drop_rng)
            if lock:
                feats = jax.lax.stop_gradient(feats)
            logits, updates = state.classifier_apply(
                {"params": params["classifier"],
                 "batch_stats": state.batch_stats["classifier"]},
                feats,
                use_running_average=False,
                mutable=["batch_stats"],
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), target
            ).mean()
            return loss, (logits, updates["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats={"classifier": new_stats},
            opt_state=new_opt_state,
        )
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return new_state, {"loss": loss, "probs": probs}

    def train_step_scoped(state, batch, target, rng):
        # Scoped at trace time: shard the Pallas attention over THIS mesh.
        with attention_mesh(mesh):
            return train_step(state, batch, target, rng)

    return jax.jit(
        train_step_scoped,
        in_shardings=(None, batch_sharding(mesh), batch_sharding(mesh), None),
        donate_argnums=(0,),
    )


def make_eval_step(config, mesh: Mesh, compute_dtype=jnp.bfloat16):
    from headct_foundation_tpu.ops.attention import attention_mesh

    kind = config.TRAIN.CLASSIFIER

    from headct_foundation_tpu.data.device_preprocess import wire_to_compute

    in_chans = int(config.VIT.IN_CHANS)

    def eval_step(state: DownstreamTrainState, batch, target):
        batch = wire_to_compute(batch, config, in_chans, dtype=compute_dtype)
        feats = _features(state, state.params, batch, kind)
        logits = state.classifier_apply(
            {"params": state.params["classifier"],
             "batch_stats": state.batch_stats["classifier"]},
            feats,
            use_running_average=True,
        )
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), target
        ).mean()
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return {"loss": loss, "probs": probs}

    def eval_step_scoped(state, batch, target):
        with attention_mesh(mesh):
            return eval_step(state, batch, target)

    return jax.jit(
        eval_step_scoped, in_shardings=(None, batch_sharding(mesh), batch_sharding(mesh))
    )


def _to_device(arr: np.ndarray, mesh: Mesh, dtype) -> jnp.ndarray:
    from headct_foundation_tpu.parallel.mesh import shard_batch

    dev, _ = shard_batch(np.asarray(arr), mesh, dtype=dtype)
    return dev


def _local_rows(garr, n_local: int) -> np.ndarray:
    """This process's rows of a (possibly process-spanning) global array, in
    contribution order, sliced to the real pre-padding local batch size.

    Multi-host, ``device_get`` of the full global array is invalid (rows on
    other hosts are not addressable); each process reads back exactly the
    shard it contributed via ``shard_batch``. Shards are reassembled by
    their GLOBAL index slices (not naively concatenated): replicated shards
    (e.g. under a tensor-parallel mesh the output is replicated over the
    'tensor' axis) land on the same region instead of duplicating rows, and
    column-sharded outputs reassemble correctly."""

    def _start(s):
        return s.index[0].start or 0

    shards = list(garr.addressable_shards)
    r0 = min(_start(s) for s in shards)
    r1 = max(s.index[0].stop or garr.shape[0] for s in shards)
    out = np.empty((r1 - r0,) + garr.shape[1:], dtype=garr.dtype)
    covered = np.zeros(r1 - r0, dtype=bool)
    for s in shards:
        sl = (slice(_start(s) - r0, (s.index[0].stop or garr.shape[0]) - r0),)
        out[sl + tuple(s.index[1:])] = np.asarray(s.data)
        covered[sl[0]] = True
    # A non-contiguous addressable layout along dim 0 (exotic mesh/device
    # orderings) would leave gap rows uninitialized — fail loudly instead of
    # silently feeding garbage to metrics.
    assert covered.all(), (
        f"non-contiguous addressable shards along dim 0: rows "
        f"{np.nonzero(~covered)[0] + r0} of [{r0},{r1}) uncovered"
    )
    return out[:n_local]


def _gather_rows(arr: np.ndarray) -> np.ndarray:
    """Concatenate per-process row blocks across processes. Metrics (and the
    best-AUROC model selection they drive) must be computed on the GLOBAL
    prediction set so every process picks the same best model. No-op
    single-host."""
    if jax.process_count() == 1:
        return arr
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(arr)  # [P, n, ...]
    return np.concatenate(list(np.asarray(gathered)), axis=0)


def _gather_strings(strings) -> list:
    """Concatenate per-process string lists across processes (same process
    order as ``_gather_rows``), so the tester can write ONE reference-named
    predictions pickle with every host's fnames (reference:
    engine_downstream.py:234-237 — single-process there). Strings ride as
    fixed-width uint8 rows through ``process_allgather``; per-process list
    lengths are exchanged first so ragged tails reassemble exactly."""
    if jax.process_count() == 1:
        return list(strings)
    from jax.experimental import multihost_utils

    counts = np.asarray(
        multihost_utils.process_allgather(np.asarray([len(strings)]))
    ).reshape(-1)
    n_max = int(counts.max())
    enc = [s.encode("utf-8") for s in strings]
    width = max([len(b) for b in enc] or [1])
    widths = np.asarray(
        multihost_utils.process_allgather(np.asarray([width]))
    ).reshape(-1)
    width = int(widths.max())
    buf = np.zeros((n_max, width), np.uint8)
    for i, b in enumerate(enc):
        buf[i, : len(b)] = np.frombuffer(b, np.uint8)
    gathered = np.asarray(multihost_utils.process_allgather(buf))  # [P, n_max, W]
    out = []
    for p in range(gathered.shape[0]):
        for i in range(int(counts[p])):
            row = gathered[p, i]
            out.append(bytes(row[row != 0]).decode("utf-8"))
    return out


def _wrap_loader(loader, mesh):
    """DevicePrefetcher over (vols, targets, fnames) batches: volumes AND
    integer targets land sharded on device in the producer thread (H2D rides
    under compute, mirroring the MAE loop); fnames pass through on host and
    the real pre-padding local batch size is appended. Volumes cross the
    wire in their fp16 storage dtype (half the H2D bytes — the jitted steps
    cast to bfloat16 on device, like the MAE loop)."""
    from headct_foundation_tpu.data.pipeline import DevicePrefetcher

    return DevicePrefetcher.wrap(
        loader, mesh, with_counts=True, extra_fields=((1, np.int32),),
    )


def _drain_step_outputs(pending, logger, on_row, abort_on_nonfinite=True) -> None:
    """Fetch all pending (loss, probs, targets, n_real, idx) device values in
    ONE batched transfer, hard-abort on non-finite TRAIN loss (reference:
    engine_downstream.py:118-120 — a train-loop-only guard; validation and
    the tester record the loss and continue, so a degenerate eval batch
    cannot kill the best-checkpoint save or the preds pickle), and feed host
    rows to ``on_row``. Every value fetch is a host<->device RTT, so
    per-step fetching would serialize RTTs into the step time (see
    mae_engine.train_one_epoch)."""
    if not pending:
        return
    if jax.process_count() == 1:
        fetched = jax.device_get([(l, p, t) for l, p, t, _, _ in pending])
        rows = [
            (float(l), np.asarray(p)[:n], np.asarray(t)[:n], idx)
            for (l, p, t), (_, _, _, n, idx) in zip(fetched, pending)
        ]
    else:
        # multi-host: only the addressable shards can be read back; the
        # replicated scalar losses still batch into one device_get call
        losses = jax.device_get([l for l, _, _, _, _ in pending])
        rows = [
            (float(l), _local_rows(p, n), _local_rows(t, n), idx)
            for l, (_, p, t, n, idx) in zip(losses, pending)
        ]
    pending.clear()
    for loss, probs, targets, idx in rows:
        if abort_on_nonfinite and not math.isfinite(loss):
            if logger:
                logger.info(f"Loss is {loss}, stopping training")
            sys.exit(1)
        on_row(loss, probs, targets, idx)


def train_one_epoch(
    config, state, train_step, loader, mesh, rng, epoch, max_epoch, logger=None,
    wandb_run=None,
) -> Tuple[DownstreamTrainState, Dict[str, float]]:
    from headct_foundation_tpu.engines.mae_engine import LOSS_FLUSH

    metric_logger = MetricLogger(logger=logger)
    all_probs, all_targets = [], []
    n_batches = len(loader) if hasattr(loader, "__len__") else 0
    loader = _wrap_loader(loader, mesh)
    pending = []  # [(loss_dev, probs_dev, targets_dev, n_real, idx)]

    def _on_row(loss, probs, targets, idx):
        all_probs.append(probs)
        all_targets.append(targets)
        metric_logger.update(loss=loss)
        if logger:
            logger.info(
                f"Epoch {epoch + 1}/{max_epoch} [{idx + 1}/{n_batches}]  Loss: {loss:.4f}"
            )
        if wandb_run is not None:
            wandb_run.log({"Training Loss": loss})

    for idx, (data, tgt, _fnames, n_real) in enumerate(
        metric_logger.log_every(loader)
    ):
        state, metrics = train_step(state, data, tgt, rng)
        pending.append((metrics["loss"], metrics["probs"], tgt, n_real, idx))
        if len(pending) >= LOSS_FLUSH:
            _drain_step_outputs(pending, logger, _on_row)

    _drain_step_outputs(pending, logger, _on_row)
    stats = metric_logger.averages()
    if all_probs:
        m = multiclass_metrics(
            _gather_rows(np.concatenate(all_targets)),
            _gather_rows(np.concatenate(all_probs)),
            config.DATA.NUM_CLASSES,
        )
        stats.update(m)
    return state, stats


def val_one_epoch(
    config, state, eval_step, loader, mesh, epoch=0, max_epoch=1, logger=None,
    save_preds: bool = False,
) -> Dict[str, Any]:
    from headct_foundation_tpu.engines.mae_engine import LOSS_FLUSH

    metric_logger = MetricLogger(logger=logger)
    all_probs, all_targets, all_fnames = [], [], []
    loader = _wrap_loader(loader, mesh)
    pending = []

    def _on_row(loss, probs, targets, idx):
        all_probs.append(probs)
        all_targets.append(targets)
        metric_logger.update(loss=loss)
        if logger:
            logger.info(
                f"Val Epoch {epoch + 1}/{max_epoch} [{idx + 1}]  Loss: {loss:.4f}"
            )

    for idx, (data, tgt, fnames, n_real) in enumerate(loader):
        metrics = eval_step(state, data, tgt)
        all_fnames.extend(fnames)
        pending.append((metrics["loss"], metrics["probs"], tgt, n_real, idx))
        if len(pending) >= LOSS_FLUSH:
            _drain_step_outputs(pending, logger, _on_row,
                                abort_on_nonfinite=False)
    _drain_step_outputs(pending, logger, _on_row, abort_on_nonfinite=False)
    stats: Dict[str, Any] = metric_logger.averages()
    if all_probs:
        probs = np.concatenate(all_probs)
        targets_np = np.concatenate(all_targets)
        g_probs = _gather_rows(probs)
        g_targets = _gather_rows(targets_np)
        stats.update(
            multiclass_metrics(g_targets, g_probs, config.DATA.NUM_CLASSES)
        )
        if save_preds:
            # GLOBAL prediction set: every process ends up with the same
            # gathered rows; the tester writes ONE reference-named pickle on
            # rank 0 (reference: engine_downstream.py:234-237).
            stats["_preds"] = {
                "fnames": _gather_strings(all_fnames),
                "preds": g_probs[:, 1] if g_probs.shape[1] > 1 else g_probs[:, 0],
                "targets": g_targets,
            }
    return stats


def trainer(
    config, state, train_step, eval_step, train_loader, val_loader, mesh, rng,
    max_epochs, val_every, logger=None, start_epoch: int = 0, wandb_run=None,
) -> Tuple[DownstreamTrainState, Any, float]:
    """Best-by-mean-AUROC selection (reference: engine_downstream.py:381-412).
    Returns (final_state, best_params (params, batch_stats), best_auroc)."""
    best_auroc = -float("inf")
    # to_numpy_tree gathers cross-process-sharded leaves collectively
    # (multi-host fsdp); plain device_get would raise on them. On best-AUROC
    # epochs the full model is fetched here AND inside save_checkpoint —
    # accepted: replicated leaves short-circuit to a local read, so the
    # double cost only exists for sharded-downstream configs.
    from headct_foundation_tpu.utils.checkpoint import to_numpy_tree

    best = (to_numpy_tree(state.params), to_numpy_tree(state.batch_stats))
    save_name = config.MODEL.SAVE_NAME
    for epoch in range(start_epoch, max_epochs):
        t0 = time.time()
        if hasattr(train_loader, "set_epoch"):
            train_loader.set_epoch(epoch)
        state, stats = train_one_epoch(
            config, state, train_step, train_loader, mesh, rng, epoch,
            max_epochs, logger=logger, wandb_run=wandb_run,
        )
        if logger:
            logger.info(
                f"Epoch {epoch + 1} done in {time.time() - t0:.1f}s  "
                f"train loss {stats.get('loss', float('nan')):.4f}  "
                f"train mean AUROC {stats.get('mean_auroc', float('nan')):.4f}"
            )
        if (epoch + 1) % val_every == 0 and val_loader is not None:
            val_stats = val_one_epoch(
                config, state, eval_step, val_loader, mesh, epoch, max_epochs,
                logger=logger,
            )
            auroc = val_stats.get("mean_auroc", float("nan"))
            if wandb_run is not None:
                wandb_run.log({
                    "Validation Loss": val_stats.get("loss", float("nan")),
                    "Validation AUROC": auroc,
                })
            if logger:
                logger.info(f"Val mean AUROC: {auroc:.4f}")
            if np.isfinite(auroc) and auroc > best_auroc:
                best_auroc = auroc
                best = (to_numpy_tree(state.params),
                        to_numpy_tree(state.batch_stats))
                # every process enters (sharded states gather inside);
                # process 0 alone writes the file
                save_checkpoint(
                    state, epoch, best_auroc, config.MODEL.DIR,
                    f"best_{save_name}", logger=logger,
                    # classifier BN running stats ride along — without
                    # them a RELOADED checkpoint would eval with fresh
                    # mean/var (the reference's state_dict carries BN
                    # buffers implicitly)
                    extra={"batch_stats": state.batch_stats},
                    async_save=bool(config.TRAIN.ASYNC_CKPT),
                    fmt=str(config.TRAIN.CKPT_FORMAT),
                )
    if hasattr(train_loader, "close"):
        train_loader.close()  # stop the post-final-epoch lookahead
    wait_for_saves()  # join the in-flight async checkpoint write
    return state, best, best_auroc


def tester(
    config, state, eval_step, test_loader, mesh, logger=None, wandb_run=None,
    preds_dir: str = "preds_pkl", plots_dir: str = "plots",
) -> Dict[str, Any]:
    """Test eval + predictions pickle + ROC/PR plots (reference:
    engine_downstream.py:419-491)."""
    stats = val_one_epoch(
        config, state, eval_step, test_loader, mesh, logger=logger, save_preds=True,
    )
    if wandb_run is not None and "loss" in stats:
        wandb_run.log({"Test Loss": stats["loss"]})
    preds = stats.pop("_preds", None)
    if preds is not None:
        name = config.PREDS_SAVE_NAME
        # preds/targets/fnames are already globally gathered (val_one_epoch),
        # so rank 0 writes the single reference-named pickle and the PR curve
        # agrees with the reported (global) AUROC, matching the reference's
        # single-process artifact (engine_downstream.py:234-242).
        if jax.process_index() == 0:
            os.makedirs(preds_dir, exist_ok=True)
            path = os.path.join(preds_dir, f"{name}_preds.pkl")
            with open(path, "wb") as f:
                pickle.dump(preds, f)
            if logger:
                logger.info(f"Saved predictions to {path}")
            if len(np.unique(preds["targets"])) > 1:
                plot_pr_curve(preds["targets"], preds["preds"], plots_dir, name)
    return stats
