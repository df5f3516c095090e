"""Unit coverage for the per-process logger and the parity reconstruction
losses (reference: logger.py:7-33, src/losses/losses.py:14-43)."""

import logging
import os

import numpy as np

from headct_foundation_tpu.logger import create_logger
from headct_foundation_tpu.losses.basic import kl_divergence, l1_loss, l2_loss


def test_create_logger_per_rank_files(tmp_path):
    lg0 = create_logger(str(tmp_path), 0, "covtest")
    lg1 = create_logger(str(tmp_path), 1, "covtest_r1")
    lg0.info("hello-rank0")
    lg1.info("hello-rank1")
    for h in lg0.handlers + lg1.handlers:
        h.flush()
    f0 = tmp_path / "log_rank0_covtest.txt"
    f1 = tmp_path / "log_rank1_covtest_r1.txt"
    assert f0.exists() and "hello-rank0" in f0.read_text()
    assert f1.exists() and "hello-rank1" in f1.read_text()
    # rank 0 gets a console handler, other ranks file-only
    assert any(isinstance(h, logging.StreamHandler)
               and not isinstance(h, logging.FileHandler)
               for h in lg0.handlers)
    assert all(isinstance(h, logging.FileHandler) for h in lg1.handlers)
    # memoized: same args return the same logger object
    assert create_logger(str(tmp_path), 0, "covtest") is lg0


def test_basic_losses_match_formulas():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 5).astype(np.float32)
    y = rng.randn(4, 5).astype(np.float32)
    np.testing.assert_allclose(
        float(l2_loss(x, y)), np.sum((x - y) ** 2) / y.size, rtol=1e-6
    )
    np.testing.assert_allclose(
        float(l1_loss(x, y)), np.sum(np.abs(x - y)) / y.size, rtol=1e-6
    )
    zm = rng.randn(6).astype(np.float32) * 0.1
    zls = rng.randn(6).astype(np.float32) * 0.1
    expected = 0.5 * np.sum(zm**2 + np.exp(2 * zls) - 2 * zls - 1.0)
    np.testing.assert_allclose(float(kl_divergence(zm, zls)), expected, rtol=1e-5)


def test_datafold_read_splits_by_fold(tmp_path):
    # reference parity: src/utils/misc.py:99-120 — basedir join (lists and
    # strings, empty string untouched), fold -> val, missing fold -> train
    import json

    from headct_foundation_tpu.utils.misc import datafold_read

    datalist = {
        "training": [
            {"image": "a.nii.gz", "fold": 0, "extra": ""},
            {"image": "b.nii.gz", "fold": 1},
            {"image": ["c1.nii.gz", "c2.nii.gz"]},
        ]
    }
    p = tmp_path / "folds.json"
    p.write_text(json.dumps(datalist))
    tr, val = datafold_read(str(p), "/base", fold=0)
    assert [d["image"] for d in val] == ["/base/a.nii.gz"]
    assert val[0]["extra"] == ""  # empty strings are not joined
    assert [d["image"] for d in tr] == [
        "/base/b.nii.gz",
        ["/base/c1.nii.gz", "/base/c2.nii.gz"],
    ]
