import os

import numpy as np
import pandas as pd
import pytest

from headct_foundation_tpu.config import default_config
from headct_foundation_tpu.data.datasets import (
    FinetuneDataset,
    PretrainDataset,
    ThreadedLoader,
    distributed_indices,
    get_fewshots_dataloaders,
    get_finetune_dataloaders,
    get_pretrain_dataloaders,
    weighted_indices,
)
from headct_foundation_tpu.data.nifti import save_nifti


ROI = 24


def _make_scans(tmp_path, n, seed=0):
    rng = np.random.RandomState(seed)
    paths = []
    for i in range(n):
        vol = (rng.rand(30, 32, 28) * 3000 - 1000).astype(np.float32)
        p = str(tmp_path / f"scan_{i}.nii.gz")
        save_nifti(p, vol, np.diag([2.0, 2.0, 2.0, 1.0]))
        paths.append(p)
    return paths


def _cfg(tmp_path):
    cfg = default_config()
    cfg.MODEL.ROI = [ROI, ROI, ROI]
    cfg.MODEL.IN_CHANS = 3
    cfg.DATA.BATCH_SIZE = 2
    cfg.DATA.NUM_WORKERS = 2
    cfg.DATA.CACHE_DIR = str(tmp_path / "cache")
    return cfg


def test_pretrain_dataset_and_cache(tmp_path):
    paths = _make_scans(tmp_path, 3)
    csv = tmp_path / "train.csv"
    pd.DataFrame({"img_path": paths}).to_csv(csv, index=False)
    cfg = _cfg(tmp_path)
    ds = PretrainDataset(cfg, str(csv), cache_dir=cfg.DATA.CACHE_DIR)
    vol, fname = ds[0]
    assert vol.shape == (3, ROI, ROI, ROI)
    assert vol.dtype == np.float16
    # cache file created; second load identical
    assert len(os.listdir(cfg.DATA.CACHE_DIR)) == 1
    vol2, _ = ds[0]
    np.testing.assert_array_equal(vol, vol2)


def test_error_shielding(tmp_path):
    csv = tmp_path / "train.csv"
    bad = str(tmp_path / "missing.nii.gz")
    pd.DataFrame({"img_path": [bad]}).to_csv(csv, index=False)
    cfg = _cfg(tmp_path)
    ds = PretrainDataset(cfg, str(csv), cache_dir=None)
    vol, fname = ds[0]  # must not raise
    assert vol.shape == (3, ROI, ROI, ROI)
    np.testing.assert_array_equal(vol, 0)
    assert ds.error_count == 1


def test_distributed_indices():
    idx = [distributed_indices(10, r, 4, shuffle=False) for r in range(4)]
    # every index covered, shards near-equal (padded)
    allidx = np.concatenate(idx)
    assert set(allidx.tolist()) == set(range(10))
    assert all(len(i) == 3 for i in idx)
    # shuffled is a permutation and differs across epochs
    a = distributed_indices(100, 0, 1, shuffle=True, epoch=0)
    b = distributed_indices(100, 0, 1, shuffle=True, epoch=1)
    assert set(a.tolist()) == set(range(100))
    assert not np.array_equal(a, b)


def test_weighted_indices_bias():
    w = np.array([1.0, 1.0, 8.0, 1.0])
    idx = weighted_indices(np.repeat(w, 25), 2000, rank=0)
    frac_heavy = np.mean((idx >= 50) & (idx < 75))
    assert frac_heavy > 0.5  # heavy class oversampled


def test_threaded_loader_batches(tmp_path):
    paths = _make_scans(tmp_path, 5)
    csv = tmp_path / "t.csv"
    pd.DataFrame({"img_path": paths}).to_csv(csv, index=False)
    cfg = _cfg(tmp_path)
    ds = PretrainDataset(cfg, str(csv), cache_dir=None)
    loader = ThreadedLoader(
        ds, batch_size=2,
        indices_fn=lambda epoch: distributed_indices(5, 0, 1, shuffle=False),
        num_workers=2,
    )
    batches = list(loader)
    assert len(batches) == len(loader) == 3
    vols, fnames = batches[0]
    assert vols.shape == (2, 3, ROI, ROI, ROI)
    assert len(fnames) == 2


def test_finetune_factories(tmp_path):
    paths = _make_scans(tmp_path, 8)
    labels = [0, 1, 0, 1, 0, 0, 1, 0]
    df = pd.DataFrame({"img_path": paths, "ICH": labels})
    for split in ["train", "val", "test"]:
        df.to_csv(tmp_path / f"{split}.csv", index=False)
    cfg = _cfg(tmp_path)
    cfg.DATA.DATASET = "cq500"
    cfg.TRAIN.LABEL_NAME = "ICH"
    cfg.DATA.TRAIN_CSV_PATH = str(tmp_path / "train.csv")
    cfg.DATA.VAL_CSV_PATH = str(tmp_path / "val.csv")
    cfg.DATA.TEST_CSV_PATH = str(tmp_path / "test.csv")

    train, val, test, weights = get_finetune_dataloaders(cfg)
    assert weights is not None and len(weights) == 2
    assert weights[1] > weights[0]  # minority class upweighted
    # train loader draws 500 weighted samples per epoch
    assert len(train) == -(-500 // 2)
    vols, labels_np, fnames = next(iter(val))
    assert vols.shape == (2, 3, ROI, ROI, ROI)
    assert labels_np.dtype == np.int32

    cfg.defrost() if cfg.is_frozen() else None
    cfg.DATA.FEW_SHOTS = 2
    ftrain, fval, ftest, _ = get_fewshots_dataloaders(cfg)
    # 2 shots x 2 classes = 4 samples
    assert len(ftrain) == 2


def test_pretrain_factories(tmp_path):
    paths = _make_scans(tmp_path, 4)
    df = pd.DataFrame({"img_path": paths})
    for split in ["train", "val", "test"]:
        df.to_csv(tmp_path / f"{split}.csv", index=False)
    cfg = _cfg(tmp_path)
    cfg.DATA.TRAIN_CSV_PATH = str(tmp_path / "train.csv")
    cfg.DATA.VAL_CSV_PATH = str(tmp_path / "val.csv")
    cfg.DATA.TEST_CSV_PATH = str(tmp_path / "test.csv")
    train, val, test = get_pretrain_dataloaders(cfg)
    vols, fnames = next(iter(train))
    assert vols.shape == (2, 3, ROI, ROI, ROI)
