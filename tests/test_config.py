import argparse
import os
import textwrap

import pytest

from headct_foundation_tpu.config import CfgNode, default_config, get_config


def _args(**kw):
    ns = argparse.Namespace(
        cfg=None, opts=None, local_rank=0,
        preds_save_name=None, dataset=None, batch_size=None, few_shots=None,
        num_workers=None, train_csv_path=None, val_csv_path=None,
        test_csv_path=None, optimizer=None, scheduler=None, max_epochs=None,
        grad_clip=None, base_lr=None, min_lr=None, weight_decay=None,
        lock=None, pooling=None, seed=None, use_amp=None, use_wandb=None,
        wandb_project=None, model_name=None, model_load_path=None,
        label_name=None, classifier=None, filename=None,
    )
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def test_defaults_match_reference_keys():
    cfg = default_config()
    assert cfg.MAE.MASK_RATIO == 0.75
    assert cfg.MODEL.ROI == [96, 96, 96]
    assert cfg.VIT.PATCH_SIZE == 12
    assert cfg.DINO.HEAD_N_PROTOTYPES == 65536
    assert cfg.TRAIN.BETA2 == 0.95
    assert cfg.SEED == 42


def test_freeze_blocks_mutation():
    cfg = default_config()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.SEED = 1
    cfg.defrost()
    cfg.SEED = 1
    assert cfg.SEED == 1


def test_merge_from_yaml_with_base(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text(textwrap.dedent("""
        TRAIN:
          MAX_EPOCHS: 7
        SEED: 5
    """))
    child = tmp_path / "child.yaml"
    child.write_text(textwrap.dedent("""
        BASE: ['base.yaml']
        TRAIN:
          BASE_LR: 0.01
    """))
    cfg = get_config(_args(cfg=str(child)))
    assert cfg.TRAIN.MAX_EPOCHS == 7      # from BASE
    assert cfg.TRAIN.BASE_LR == 0.01      # from child
    assert cfg.SEED == 5
    assert cfg.is_frozen()


def test_reference_yaml_parses():
    # The reference's shipped YAML must merge unchanged.
    ref = "/root/reference/configs/mae/mae_HeadCT.yaml"
    if not os.path.exists(ref):
        pytest.skip("reference not mounted")
    cfg = get_config(_args(cfg=ref))
    assert cfg.MAE.PATCH_SIZE == 12
    assert cfg.MAE.USE_BIAS is True
    assert cfg.TRAIN.MAX_EPOCHS == 400
    assert cfg.TRAIN.BASE_LR == pytest.approx(1.5e-4)


def test_opts_and_named_args(tmp_path):
    f = tmp_path / "c.yaml"
    f.write_text("SEED: 3\n")
    cfg = get_config(_args(
        cfg=str(f), opts=["TRAIN.MAX_EPOCHS", "3", "DATA.BATCH_SIZE", "8"],
        base_lr=0.5, batch_size=16,
    ))
    assert cfg.TRAIN.MAX_EPOCHS == 3
    assert cfg.DATA.BATCH_SIZE == 16    # named arg wins over opts
    assert cfg.TRAIN.BASE_LR == 0.5


def test_falsy_named_arg_not_merged(tmp_path):
    # Reference quirk parity: falsy values (0, False) are not merged
    # (reference: config.py:196-197).
    f = tmp_path / "c.yaml"
    f.write_text("SEED: 3\n")
    cfg = get_config(_args(cfg=str(f), max_epochs=0))
    assert cfg.TRAIN.MAX_EPOCHS == 100  # default retained


def test_unknown_key_raises(tmp_path):
    f = tmp_path / "c.yaml"
    f.write_text("NOT_A_KEY: 1\n")
    with pytest.raises(KeyError):
        get_config(_args(cfg=str(f)))
