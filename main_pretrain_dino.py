"""DINO pretraining CLI (reference surface: main_pretrain_dino.py).

  python main_pretrain_dino.py --cfg configs/dino/dino_HeadCT.yaml ...

Student/teacher ViTs + DINO heads trained with EMA, on-device multi-crop
augmentation, and per-iteration LR/WD/momentum schedules
(reference: main_pretrain_dino.py:180-260).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

from headct_foundation_tpu.config import get_config
from headct_foundation_tpu.engines import dino_engine
from headct_foundation_tpu.logger import create_logger
from headct_foundation_tpu.parallel.mesh import mesh_from_config
from headct_foundation_tpu.utils.checkpoint import load_checkpoint, restore_dino_state
from headct_foundation_tpu.utils.torch_interop import (
    classify_checkpoint,
    load_pretrained_into,
    put_like,
)
from main_pretrain_mae import init_wandb


def parse_option():
    parser = argparse.ArgumentParser("DINO 3D pretraining (TPU)", add_help=False)
    parser.add_argument("--cfg", type=str, required=True, metavar="FILE")
    parser.add_argument("--opts", default=None, nargs="+")
    parser.add_argument("--local_rank", type=int, default=0,
                        help="unused on TPU; kept for reference CLI parity")
    parser.add_argument("--dist-backend", default="ici")
    parser.add_argument("--dist-url", default="env://")
    parser.add_argument("--seed", type=int)
    parser.add_argument("--use_amp", action="store_true")
    parser.add_argument("--use_wandb", action="store_true")
    parser.add_argument("--wandb_project", type=str, default=None)
    parser.add_argument("--model_name", type=str)
    parser.add_argument("--model_load_path", type=str)
    parser.add_argument("--optimizer", type=str)
    parser.add_argument("--scheduler", type=str)
    parser.add_argument("--base_lr", type=float)
    parser.add_argument("--min_lr", type=float)
    parser.add_argument("--weight_decay", type=float)
    parser.add_argument("--grad_clip", type=float)
    parser.add_argument("--batch_size", type=int)
    parser.add_argument("--num_workers", type=int)
    parser.add_argument("--max_epochs", type=int)
    parser.add_argument("--train_csv_path", type=str)
    parser.add_argument("--val_csv_path", type=str)
    parser.add_argument("--test_csv_path", type=str)

    args, _ = parser.parse_known_args()
    config = get_config(args)
    return args, config


def main(config, wandb_run, logger):
    from headct_foundation_tpu.data.datasets import get_pretrain_dataloaders

    mesh = mesh_from_config(config)
    # WIRE_FORMAT='auto': probe the H2D transport once and resolve to a
    # concrete wire format before any loader/cache reads the key
    # (data/pipeline.resolve_wire_format; threshold DATA.WIRE_AUTO_MBPS).
    if str(config.DATA.WIRE_FORMAT) == "auto":
        from headct_foundation_tpu.data.pipeline import resolve_wire_format

        config.defrost()
        config.DATA.WIRE_FORMAT = resolve_wire_format(config)
        config.freeze()
        logger.info(f"Resolved DATA.WIRE_FORMAT=auto -> {config.DATA.WIRE_FORMAT}")
    train_loader, val_loader, test_loader = get_pretrain_dataloaders(config)

    world = jax.process_count()
    effective_batch_size = config.DATA.BATCH_SIZE * world
    niter_per_ep = len(train_loader)
    total_steps = niter_per_ep * config.TRAIN.MAX_EPOCHS
    num_warmup_steps = int(config.TRAIN.PER_WARMUP * total_steps)
    config.defrost()
    config.TRAIN.BASE_LR = config.TRAIN.BASE_LR * effective_batch_size / 256
    config.TRAIN.MIN_LR = config.TRAIN.BASE_LR * 1e-3
    config.freeze()
    logger.info(
        f"Effective LR: {config.TRAIN.BASE_LR}, Effective Batch: {effective_batch_size}, "
        f"Warmup/Total steps: {num_warmup_steps}/{total_steps}, Mesh: {dict(mesh.shape)}"
    )

    # process-INDEPENDENT key: in multi-controller SPMD every process
    # must feed identical scalars into the jitted init/steps — a
    # per-process key would materialize divergent 'replicated' params
    # (the reference's DDP broadcast has no equivalent here). Host-side
    # numpy seeds stay per-process for loader sharding.
    rng = jax.random.PRNGKey(config.SEED)
    state, _, lr_schedule, wd_sched, momentum_sched, temp_sched = (
        dino_engine.create_train_state(
            config, mesh, rng, total_steps, num_warmup_steps, niter_per_ep
        )
    )

    start_epoch = 0
    if config.MODEL.PRETRAINED and config.MODEL.PRETRAINED != "None":
        path = config.MODEL.PRETRAINED
        # Routed by CONTENT, not extension: our checkpoints may be named
        # *.pt (MODEL.SAVE_NAME default) and orbax checkpoints are
        # directories — only genuine torch files take the merge branch.
        is_torch, payload = classify_checkpoint(path)
        if is_torch:
            merged = load_pretrained_into(
                jax.device_get(state.params), path,
                norm_layer=config.VIT.NORM_LAYER, logger=logger,
            )
            merged_teacher = load_pretrained_into(
                jax.device_get(state.teacher_params), path,
                norm_layer=config.VIT.NORM_LAYER,
                state_key="momentum_model_state_dict", logger=logger,
            )
            state = state.replace(
                params=put_like(state.params, merged),
                teacher_params=put_like(state.teacher_params, merged_teacher),
            )
        else:
            if payload is None:  # orbax checkpoint directory
                payload = load_checkpoint(path)
            try:
                # Full resume: params + teacher + opt_state + center + head
                # stats + step (reference restores model/optimizer/scheduler/
                # epoch, src/utils/misc.py:55-69).
                state, start_epoch, _ = restore_dino_state(
                    state, payload, logger=logger
                )
                logger.info(f"Resumed (full) from {path} at epoch {start_epoch}")
            except (ValueError, KeyError, TypeError) as e:
                # Architecture-mismatched or bare-params checkpoint:
                # tolerant strict=False WARM START (reference load_model
                # semantics, misc.py:72-96 — the reference's merge path
                # never restores the epoch; a mismatched checkpoint is a
                # different run, so schedules restart at epoch 0). Weights
                # may sit under 'state_dict' (reference layout) or 'params'.
                logger.info(f"Full resume failed ({e}); merging params only")
                from headct_foundation_tpu.utils.torch_interop import merge_params

                tree = payload.get("state_dict", payload.get("params", payload))
                merged, _, _ = merge_params(jax.device_get(state.params), tree)
                state = state.replace(params=put_like(state.params, merged))
                if "momentum_model_state_dict" in payload:
                    mt, _, _ = merge_params(
                        jax.device_get(state.teacher_params),
                        payload["momentum_model_state_dict"],
                    )
                    state = state.replace(
                        teacher_params=put_like(state.teacher_params, mt)
                    )
                logger.info(f"Warm-started params from {path} (epoch 0)")

    train_step = dino_engine.make_train_step(config, mesh)
    eval_step = dino_engine.make_eval_step(config, mesh)

    state, best_loss = dino_engine.trainer(
        config, state, train_step, eval_step, train_loader, val_loader, mesh,
        rng, lr_schedule, wd_sched, momentum_sched, temp_sched,
        config.TRAIN.MAX_EPOCHS, config.TRAIN.VAL_EVERY, logger=logger,
        start_epoch=start_epoch, wandb_run=wandb_run,
    )
    logger.info(f"train completed, best val loss: {best_loss:.4f}")

    test_stats = dino_engine.tester(
        config, state, eval_step, test_loader, mesh, rng, temp_sched,
        logger=logger, wandb_run=wandb_run,
    )
    logger.info(f"test completed, test loss: {test_stats.get('loss', float('nan')):.4f}")


if __name__ == "__main__":
    from headct_foundation_tpu.parallel.mesh import respect_jax_platforms_env

    respect_jax_platforms_env()
    # Multi-host SPMD: initialize the jax distributed runtime when a
    # coordinator is configured (TPU pods / multi-slice; single-host runs
    # skip this). The reference's torchrun env:// rendezvous equivalent.
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
    args, config = parse_option()
    np.random.seed(config.SEED + jax.process_index())

    os.makedirs(config.LOG.OUTPUT_DIR, exist_ok=True)
    logger = create_logger(
        config.LOG.OUTPUT_DIR, jax.process_index(), config.LOG.FILENAME
    )

    if jax.process_index() == 0 and config.OUTPUT:
        os.makedirs(config.OUTPUT, exist_ok=True)
        with open(os.path.join(config.OUTPUT, "config.json"), "w") as f:
            json.dump(config.to_dict(), f, indent=2)

    wandb_run = init_wandb(config)
    main(config, wandb_run, logger)
