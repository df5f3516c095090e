"""MAE pretraining CLI (reference surface: main_pretrain_mae.py).

Usage matches the reference's flags:

  python main_pretrain_mae.py --cfg configs/mae/mae_HeadCT.yaml \
      [--local_rank 0] [--batch_size N] [--max_epochs E] [--use_wandb] ...

TPU-native execution model: ONE process per host drives all local chips via a
('data','fsdp','tensor') mesh (reference: one torchrun process per GPU with
NCCL DDP — misc.py:325-344). ``--local_rank`` is accepted for CLI parity but
unused; multi-host runs initialize jax.distributed when JAX_COORDINATOR_ADDRESS
is set.
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
from headct_foundation_tpu.engines import mae_engine
from headct_foundation_tpu.logger import create_logger
from headct_foundation_tpu.parallel.mesh import mesh_from_config
from headct_foundation_tpu.utils.checkpoint import load_checkpoint, restore_state
from headct_foundation_tpu.utils.torch_interop import (
    classify_checkpoint,
    load_pretrained_into,
    merge_params,
    put_like,
)


def parse_option():
    parser = argparse.ArgumentParser(
        "MAE 3D pretraining (TPU)", add_help=False
    )
    parser.add_argument("--cfg", type=str, required=True, metavar="FILE",
                        help="path to config file")
    parser.add_argument("--opts", help="Modify config options using the command-line",
                        default=None, nargs="+")
    # distributed training (accepted for reference-CLI parity)
    parser.add_argument("--local_rank", type=int, default=0,
                        help="unused on TPU; kept for reference CLI parity")
    parser.add_argument("--dist-backend", default="ici", help="unused on TPU")
    parser.add_argument("--dist-url", default="env://", help="unused on TPU")
    parser.add_argument("--seed", type=int, help="seed")
    parser.add_argument("--use_amp", action="store_true",
                        help="reference flag; bf16 compute is always on")
    # wandb
    parser.add_argument("--use_wandb", action="store_true")
    parser.add_argument("--wandb_project", type=str, default=None)
    # model parameters
    parser.add_argument("--model_name", type=str, help="model name")
    parser.add_argument("--model_load_path", type=str, help="path to trained model")
    parser.add_argument("--optimizer", type=str, help="training optimizer")
    parser.add_argument("--scheduler", type=str, help="learning rate scheduler")
    parser.add_argument("--base_lr", type=float, help="base learning rate")
    parser.add_argument("--min_lr", type=float, help="minimum learning rate")
    parser.add_argument("--weight_decay", type=float, help="weight decay")
    parser.add_argument("--grad_clip", type=float, help="gradient clipping")
    parser.add_argument("--batch_size", type=int, help="batch size")
    parser.add_argument("--num_workers", type=int, help="dataloader workers")
    parser.add_argument("--max_epochs", type=int, help="max epoch")
    # dataset parameters
    parser.add_argument("--train_csv_path", type=str)
    parser.add_argument("--val_csv_path", type=str)
    parser.add_argument("--test_csv_path", type=str)

    args, _ = parser.parse_known_args()
    config = get_config(args)
    return args, config


def init_wandb(config):
    if not config.WANDB.WANDB_ENABLE or jax.process_index() != 0:
        return None
    try:
        import wandb

        return wandb.init(project=config.WANDB.PROJECT, config=config.to_dict())
    except ImportError:
        print("wandb not available; continuing without it")
        return None


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

    # LR scaling: base_lr x eff_batch / 256, min_lr = base_lr x 1e-3
    # (reference: main_pretrain_mae.py:149-152).
    world = jax.process_count()
    effective_batch_size = config.DATA.BATCH_SIZE * world
    total_steps = len(train_loader) * config.TRAIN.MAX_EPOCHS
    num_warmup_steps = int(config.TRAIN.PER_WARMUP * total_steps)
    config.defrost()
    config.TRAIN.BASE_LR = config.TRAIN.BASE_LR * effective_batch_size / 256
    config.TRAIN.MIN_LR = config.TRAIN.BASE_LR * 1e-3
    config.freeze()
    logger.info(
        f"Effective LR: {config.TRAIN.BASE_LR}, Effective Batch: {effective_batch_size}, "
        f"Epochs: {config.TRAIN.MAX_EPOCHS}, Warmup/Total steps: "
        f"{num_warmup_steps}/{total_steps}, Mesh: {dict(mesh.shape)}"
    )

    # process-INDEPENDENT key: in multi-controller SPMD every process
    # must feed identical scalars into the jitted init/steps — a
    # per-process key would materialize divergent 'replicated' params
    # (the reference's DDP broadcast has no equivalent here). Host-side
    # numpy seeds stay per-process for loader sharding.
    rng = jax.random.PRNGKey(config.SEED)
    state, _, lr_schedule = mae_engine.create_train_state(
        config, mesh, rng, total_steps, num_warmup_steps
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
                norm_layer=config.MAE.NORM_LAYER, logger=logger,
            )
            state = state.replace(params=put_like(state.params, merged))
        else:
            if payload is None:  # orbax checkpoint directory
                payload = load_checkpoint(path)
            try:
                state, start_epoch, _ = restore_state(state, payload)
                logger.info(f"Resumed from {path} at epoch {start_epoch}")
            except (ValueError, KeyError, TypeError) as e:
                # Architecture-mismatched or bare-params checkpoint:
                # tolerant strict=False WARM START (reference load_model,
                # misc.py:72-96 — the reference's merge path never restores
                # the epoch either; start_epoch stays 0). Weights may sit
                # under 'state_dict' (reference layout) or 'params' (ours).
                logger.info(f"Full resume failed ({e}); merging params only")
                tree = payload.get("state_dict", payload.get("params", payload))
                merged, _, _ = merge_params(jax.device_get(state.params), tree)
                state = state.replace(params=put_like(state.params, merged))

    train_step = mae_engine.make_train_step(
        mesh, augment=True, accum_steps=config.TRAIN.ACCUM_STEPS, config=config
    )
    eval_step = mae_engine.make_eval_step(mesh, config=config)

    state, best_loss = mae_engine.trainer(
        config, state, train_step, eval_step, train_loader, val_loader, mesh,
        rng, lr_schedule, config.TRAIN.MAX_EPOCHS, config.TRAIN.VAL_EVERY,
        logger=logger, start_epoch=start_epoch, wandb_run=wandb_run,
    )
    logger.info(f"train completed, best val loss: {best_loss:.4f}")

    test_stats = mae_engine.tester(
        config, state, eval_step, test_loader, mesh, rng, logger=logger,
        wandb_run=wandb_run,
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
        path = os.path.join(config.OUTPUT, "config.json")
        with open(path, "w") as f:
            json.dump(config.to_dict(), f, indent=2)
        logger.info(f"Full config saved to {path}")

    wandb_run = init_wandb(config)
    main(config, wandb_run, logger)
