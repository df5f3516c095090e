"""End-to-end CLI smoke tests: run the three mains as subprocesses on tiny
synthetic NIfTI datasets (CPU, 8 virtual devices). This mirrors the
reference's torchrun entry points (SURVEY.md §2.8)."""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pandas as pd
import pytest

from headct_foundation_tpu.data.nifti import save_nifti

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROI = 24


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _make_dataset(tmp_path, n=6, labeled=False):
    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        vol = (rng.rand(30, 32, 28) * 3000 - 1000).astype(np.float32)
        p = str(tmp_path / f"scan_{i}.nii.gz")
        save_nifti(p, vol, np.diag([2.0, 2.0, 2.0, 1.0]))
        paths.append(p)
    df = pd.DataFrame({"img_path": paths})
    if labeled:
        df["ICH"] = [i % 2 for i in range(n)]
    for split in ["train", "val", "test"]:
        df.to_csv(tmp_path / f"{split}.csv", index=False)
    return tmp_path


_COMMON_TINY = """
MODEL:
  DIR: {out}/model_saved
  ROI: [24, 24, 24]
  IN_CHANS: 3
DATA:
  BATCH_SIZE: 3
  NUM_WORKERS: 2
  CACHE_DIR: {out}/cache
  TRAIN_CSV_PATH: {out}/train.csv
  VAL_CSV_PATH: {out}/val.csv
  TEST_CSV_PATH: {out}/test.csv
LOG:
  OUTPUT_DIR: {out}/log
TRAIN:
  MAX_EPOCHS: 2
  VAL_EVERY: 1
  BASE_LR: 1.0e-3
  MIN_LR: 1.0e-6
  GRAD_CLIP: 1.0
"""

import yaml


def _tiny_yaml(out, extra):
    """Compose the common tiny config with per-test extras (deep merge, so no
    duplicate top-level YAML keys)."""
    base = yaml.safe_load(_COMMON_TINY.format(out=out))
    for k, v in extra.items():
        if k in base and isinstance(base[k], dict):
            base[k].update(v)
        else:
            base[k] = v
    return yaml.safe_dump(base)


_TINY_MAE = {
    "INPUT_SIZE": 24, "PATCH_SIZE": 12, "IN_CHANS": 3,
    "ENCODER_DEPTH": 2, "ENCODER_EMBED_DIM": 48, "ENCODER_MLP_DIM": 96,
    "ENCODER_NUM_HEADS": 4, "DECODER_DEPTH": 1, "DECODER_EMBED_DIM": 36,
    "DECODER_MLP_DIM": 72, "DECODER_NUM_HEADS": 4, "USE_BIAS": True,
}
_TINY_VIT = {
    "INPUT_SIZE": 24, "PATCH_SIZE": 12, "IN_CHANS": 3, "HIDDEN_SIZE": 48,
    "MLP_DIM": 96, "NUM_LAYERS": 2, "NUM_HEADS": 4, "NUM_REGISTER_TOKENS": 2,
    "USE_BIAS": True,
}


def _run(cmd, cwd):
    result = subprocess.run(
        cmd, cwd=cwd, env=_env(), capture_output=True, text=True, timeout=540
    )
    assert result.returncode == 0, (
        f"STDOUT:\n{result.stdout[-3000:]}\nSTDERR:\n{result.stderr[-3000:]}"
    )
    return result


@pytest.mark.slow
def test_main_pretrain_mae(tmp_path):
    _make_dataset(tmp_path)
    cfg = tmp_path / "mae_tiny.yaml"
    cfg.write_text(_tiny_yaml(tmp_path, {"MAE": _TINY_MAE}))
    _run(
        [sys.executable, "main_pretrain_mae.py", "--cfg", str(cfg), "--local_rank", "0"],
        REPO,
    )
    saved = os.listdir(tmp_path / "model_saved")
    assert any(f.startswith("latest_") for f in saved), saved
    assert any(f.startswith("best_") for f in saved), saved

    # full resume from OUR pickle even though the default SAVE_NAME gives it
    # a .pt extension — routing is by content, not extension (a torch-like
    # extension must not silently downgrade resume to a params-only merge)
    latest = next(f for f in saved if f.startswith("latest_"))
    assert latest.endswith(".pt"), latest  # default SAVE_NAME is debug.pt
    result = _run(
        [sys.executable, "main_pretrain_mae.py", "--cfg", str(cfg),
         "--local_rank", "0", "--model_load_path",
         str(tmp_path / "model_saved" / latest)],
        REPO,
    )
    assert "Resumed from" in result.stdout + result.stderr


@pytest.mark.slow
def test_main_pretrain_dino(tmp_path):
    _make_dataset(tmp_path, n=3)
    cfg = tmp_path / "dino_tiny.yaml"
    cfg.write_text(_tiny_yaml(tmp_path, {
        "MODEL": {"NAME": "dino"},
        "VIT": _TINY_VIT,
        "DINO": {"HEAD_N_PROTOTYPES": 64, "HEAD_HIDDEN_DIM": 32,
                 "BOTTLENECK_DIM": 8, "LOCAL_CROP_NUM": 1, "USE_BN": False,
                 "WARMUP_TEACHER_EPOCHS": 1},
        "TRAIN": {"MAX_EPOCHS": 1, "VAL_EVERY": 5},
        "PARALLEL": {"DATA": 2},
    }))
    _run(
        [sys.executable, "main_pretrain_dino.py", "--cfg", str(cfg), "--local_rank", "0"],
        REPO,
    )
    saved = os.listdir(tmp_path / "model_saved")
    assert any(f.startswith("latest_") for f in saved), saved

    # full DINO resume (teacher/center/head-stats path) from the written
    # checkpoint, content-routed despite the .pt default SAVE_NAME
    latest = next(f for f in saved if f.startswith("latest_"))
    result = _run(
        [sys.executable, "main_pretrain_dino.py", "--cfg", str(cfg),
         "--local_rank", "0", "--model_load_path",
         str(tmp_path / "model_saved" / latest)],
        REPO,
    )
    assert "Resumed (full) from" in result.stdout + result.stderr


@pytest.mark.slow
def test_main_downstream_with_pretrained(tmp_path):
    """MAE-pretrain then linear-probe: exercises checkpoint load path too."""
    _make_dataset(tmp_path, labeled=True)
    mae_cfg = tmp_path / "mae_tiny.yaml"
    mae_cfg.write_text(_tiny_yaml(tmp_path, {
        "MAE": _TINY_MAE, "TRAIN": {"MAX_EPOCHS": 1, "VAL_EVERY": 5},
    }))
    _run(
        [sys.executable, "main_pretrain_mae.py", "--cfg", str(mae_cfg),
         "--local_rank", "0"],
        REPO,
    )
    ckpt = next(
        str(tmp_path / "model_saved" / f)
        for f in os.listdir(tmp_path / "model_saved")
        if f.startswith("latest_")
    )

    ds_cfg = tmp_path / "ds_tiny.yaml"
    ds_cfg.write_text(_tiny_yaml(tmp_path, {
        "MODEL": {"NAME": "vit"},
        "VIT": {k: v for k, v in _TINY_VIT.items() if k != "NUM_REGISTER_TOKENS"},
        "DATA": {"DATASET": "cq500", "NUM_CLASSES": 2, "BATCH_SIZE": 8},
        "TRAIN": {"LABEL_NAME": "ICH", "CLASSIFIER": "linear",
                  "MAX_EPOCHS": 1, "VAL_EVERY": 1},
    }))
    result = _run(
        [sys.executable, os.path.join(REPO, "main_downstream.py"), "--cfg", str(ds_cfg),
         "--local_rank", "0", "--lock", "--model_load_path", ckpt,
         "--preds_save_name", "e2e", "--dataset", "cq500",
         "--label_name", "ICH"],
        str(tmp_path),
    )
    assert os.path.exists(tmp_path / "preds_pkl" / "e2e_preds.pkl")


@pytest.mark.slow
def test_main_pretrain_mae_orbax_format_and_resume(tmp_path):
    """TRAIN.CKPT_FORMAT=orbax end to end: the trainer writes latest_/best_
    as orbax checkpoint DIRECTORIES, and a second run resumes from the
    directory path through the same --model_load_path flag (load_checkpoint
    dispatches on isdir)."""
    _make_dataset(tmp_path)
    cfg = tmp_path / "mae_tiny.yaml"
    cfg.write_text(_tiny_yaml(tmp_path, {
        "MAE": _TINY_MAE,
        "TRAIN": {"MAX_EPOCHS": 1, "VAL_EVERY": 5, "CKPT_FORMAT": "orbax"},
    }))
    _run(
        [sys.executable, "main_pretrain_mae.py", "--cfg", str(cfg),
         "--local_rank", "0"],
        REPO,
    )
    saved_dir = tmp_path / "model_saved"
    latest = next(f for f in os.listdir(saved_dir) if f.startswith("latest_"))
    assert (saved_dir / latest).is_dir(), "orbax checkpoint must be a directory"
    result = _run(
        [sys.executable, "main_pretrain_mae.py", "--cfg", str(cfg),
         "--local_rank", "0", "--model_load_path", str(saved_dir / latest)],
        REPO,
    )
    assert "Resumed from" in result.stdout + result.stderr

    # reference-layout pickle ({'state_dict': ...}, no 'params'/'opt_state'):
    # classify_checkpoint marks it ours, full restore raises, and the
    # tolerant fallback must merge from 'state_dict' instead of KeyError'ing
    import pickle

    sys.path.insert(0, REPO)
    from headct_foundation_tpu.utils.checkpoint import load_checkpoint

    payload = load_checkpoint(str(saved_dir / latest))
    bare = tmp_path / "bare_params.pt"
    with open(bare, "wb") as f:
        pickle.dump({"epoch": 0, "state_dict": payload["params"]}, f)
    result = _run(
        [sys.executable, "main_pretrain_mae.py", "--cfg", str(cfg),
         "--local_rank", "0", "--model_load_path", str(bare)],
        REPO,
    )
    assert "merging params only" in result.stdout + result.stderr


@pytest.mark.slow
def test_main_pretrain_mae_wire_auto(tmp_path):
    """DATA.WIRE_FORMAT=auto resolves to a concrete format from the probed
    transport before any loader reads it, and the main trains through the
    resolved wire end-to-end (CPU mesh: host transfer is fast -> hu16)."""
    _make_dataset(tmp_path)
    cfg = tmp_path / "mae_tiny.yaml"
    cfg.write_text(_tiny_yaml(tmp_path, {"MAE": _TINY_MAE}))
    result = _run(
        [sys.executable, "main_pretrain_mae.py", "--cfg", str(cfg),
         "--local_rank", "0", "--opts", "DATA.WIRE_FORMAT", "auto"],
        REPO,
    )
    out = result.stdout + result.stderr
    assert "Resolved DATA.WIRE_FORMAT=auto -> hu16" in out, out[-2000:]
    saved = os.listdir(tmp_path / "model_saved")
    assert any(f.startswith("latest_") for f in saved), saved
