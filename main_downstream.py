"""Downstream fine-tune / linear-probe / few-shot CLI
(reference surface: main_downstream.py).

  python main_downstream.py --cfg configs/downstream/vit_HeadCT_cq500.yaml \
      --dataset cq500 --label_name ICH [--lock] [--lora] [--few_shots K] \
      [--classifier linear|attentive] [--model_load_path mae.ckpt] ...
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
from headct_foundation_tpu.engines import downstream_engine
from headct_foundation_tpu.logger import create_logger
from headct_foundation_tpu.parallel.mesh import mesh_from_config
from headct_foundation_tpu.utils.torch_interop import (
    load_pretrained_into,
    put_like,
)
from main_pretrain_mae import init_wandb


def parse_option():
    parser = argparse.ArgumentParser("Downstream classification (TPU)", add_help=False)
    parser.add_argument("--cfg", type=str, required=True, metavar="FILE")
    parser.add_argument("--opts", default=None, nargs="+")
    parser.add_argument("--preds_save_name", type=str)
    parser.add_argument("--local_rank", type=int, default=0,
                        help="unused on TPU; kept for reference CLI parity")
    parser.add_argument("--dist-backend", default="ici")
    parser.add_argument("--dist-url", default="env://")
    parser.add_argument("--seed", type=int)
    parser.add_argument("--use_amp", action="store_true")
    parser.add_argument("--use_wandb", action="store_true")
    parser.add_argument("--filename", type=str, default=None)
    parser.add_argument("--wandb_project", type=str, default=None)
    parser.add_argument("--model_name", type=str)
    parser.add_argument("--model_load_path", type=str)
    parser.add_argument("--classifier", type=str, help="linear or attentive")
    parser.add_argument("--label_name", type=str)
    parser.add_argument("--optimizer", type=str)
    parser.add_argument("--scheduler", type=str)
    parser.add_argument("--base_lr", type=float)
    parser.add_argument("--min_lr", type=float)
    parser.add_argument("--weight_decay", type=float)
    parser.add_argument("--grad_clip", type=float)
    parser.add_argument("--batch_size", type=int)
    parser.add_argument("--num_workers", type=int)
    parser.add_argument("--max_epochs", type=int)
    parser.add_argument("--lock", action="store_true")
    parser.add_argument("--lora", action="store_true")
    parser.add_argument("--dataset", type=str)
    parser.add_argument("--train_csv_path", type=str)
    parser.add_argument("--val_csv_path", type=str)
    parser.add_argument("--test_csv_path", type=str)
    parser.add_argument("--few_shots", type=int)

    args, _ = parser.parse_known_args()
    config = get_config(args)
    if args.lora:
        config.defrost()
        config.TRAIN.LORA = True
        config.freeze()
    return args, config


def main(config, wandb_run, logger):
    from headct_foundation_tpu.data.datasets import (
        get_fewshots_dataloaders,
        get_finetune_dataloaders,
    )

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
    if config.DATA.FEW_SHOTS > 0:
        train_loader, val_loader, test_loader, class_weights = (
            get_fewshots_dataloaders(config)
        )
    else:
        train_loader, val_loader, test_loader, class_weights = (
            get_finetune_dataloaders(config)
        )

    total_steps = len(train_loader) * config.TRAIN.MAX_EPOCHS
    num_warmup_steps = int(config.TRAIN.PER_WARMUP * total_steps)
    # Downstream keeps BASE_LR unscaled; MIN_LR = BASE_LR x 1e-3
    # (reference: main_downstream.py:190-192).
    config.defrost()
    config.TRAIN.MIN_LR = config.TRAIN.BASE_LR * 1e-3
    config.freeze()
    logger.info(
        f"LR: {config.TRAIN.BASE_LR} (classifier x100), LOCK: {config.TRAIN.LOCK}, "
        f"LoRA: {config.TRAIN.LORA}, Classifier: {config.TRAIN.CLASSIFIER}, "
        f"Warmup/Total steps: {num_warmup_steps}/{total_steps}"
    )

    # process-INDEPENDENT key: in multi-controller SPMD every process
    # must feed identical scalars into the jitted init/steps — a
    # per-process key would materialize divergent 'replicated' params
    # (the reference's DDP broadcast has no equivalent here). Host-side
    # numpy seeds stay per-process for loader sharding.
    rng = jax.random.PRNGKey(config.SEED)
    state, _, _ = downstream_engine.create_train_state(
        config, mesh, rng, total_steps, num_warmup_steps
    )

    # Load pretrained backbone (MAE/DINO checkpoint, .pt or .ckpt), with
    # prefix-strip + strict=False semantics (reference: misc.py:72-96).
    if config.MODEL.PRETRAINED and config.MODEL.PRETRAINED != "None":
        merged_model = load_pretrained_into(
            jax.device_get(state.params["model"]), config.MODEL.PRETRAINED,
            norm_layer=config.VIT.NORM_LAYER, logger=logger,
        )
        new_params = dict(jax.device_get(state.params))
        new_params["model"] = merged_model
        state = state.replace(params=put_like(state.params, new_params))

    n_trainable = sum(
        int(np.prod(p.shape))
        for p in jax.tree.leaves(state.params)
    )
    logger.info(f"Total params (model+classifier): {n_trainable / 1e6:.2f}M")

    train_step = downstream_engine.make_train_step(config, mesh)
    eval_step = downstream_engine.make_eval_step(config, mesh)

    state, best, best_auroc = downstream_engine.trainer(
        config, state, train_step, eval_step, train_loader, val_loader, mesh,
        rng, config.TRAIN.MAX_EPOCHS, config.TRAIN.VAL_EVERY, logger=logger,
        wandb_run=wandb_run,
    )
    logger.info(f"train completed, best val mean AUROC: {best_auroc:.4f}")

    # Test with the best-by-AUROC weights (reference: engine_downstream.py:410-412).
    best_params, best_stats = best
    state = state.replace(
        params=put_like(state.params, best_params),
        batch_stats=jax.device_get(best_stats),
    )
    test_stats = downstream_engine.tester(
        config, state, eval_step, test_loader, mesh, logger=logger,
        wandb_run=wandb_run,
    )
    logger.info(
        f"test completed, loss {test_stats.get('loss', float('nan')):.4f}, "
        f"mean AUROC {test_stats.get('mean_auroc', float('nan')):.4f}"
    )


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
