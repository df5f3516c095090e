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


class _ArrayDataset:
    """Index -> deterministic tiny array; counts construction-thread names."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        import threading

        return (np.full((2, 2), idx, dtype=np.float16),
                threading.current_thread().name)


def test_threaded_loader_persistent_pool_and_lookahead():
    ds = _ArrayDataset(8)
    per_epoch = {0: np.arange(8), 1: np.arange(8)[::-1], 2: np.arange(4)}
    loader = ThreadedLoader(
        ds, batch_size=2,
        indices_fn=lambda epoch: per_epoch[epoch],
        num_workers=2, prefetch=2,
    )
    # epoch 0: order matches indices_fn (set_epoch marks the loader as
    # epoch-driven, enabling cross-epoch lookahead)
    loader.set_epoch(0)
    vals = [b[0][:, 0, 0].tolist() for b in loader]
    assert vals == [[0, 1], [2, 3], [4, 5], [6, 7]]
    assert 1 in loader._pending  # lookahead for the next epoch started
    # pool persists across epochs (same object)
    pool0 = loader._pool
    assert pool0 is not None
    # lookahead for epoch 1 was started; consuming epoch 1 uses it and is
    # correct even though set_epoch changed after the lookahead began
    loader.set_epoch(1)
    vals1 = [b[0][:, 0, 0].tolist() for b in loader]
    assert vals1 == [[7, 6], [5, 4], [3, 2], [1, 0]]
    assert loader._pool is pool0
    # jumping to a non-looked-ahead epoch discards the stale lookahead
    loader.set_epoch(2)
    assert len(loader) == 2
    vals2 = [b[0][:, 0, 0].tolist() for b in loader]
    assert vals2 == [[0, 1], [2, 3]]
    loader.close()
    assert loader._pool is None


def test_threaded_loader_no_lookahead_without_set_epoch():
    """Val/test loaders never call set_epoch; they must not spawn (and then
    discard) epoch+1 lookahead production on every pass."""
    ds = _ArrayDataset(4)
    loader = ThreadedLoader(
        ds, batch_size=2, indices_fn=lambda epoch: np.arange(4), num_workers=1,
    )
    list(loader)
    assert not loader._pending
    loader.close()


def test_threaded_loader_abandoned_iteration():
    ds = _ArrayDataset(64)
    loader = ThreadedLoader(
        ds, batch_size=4,
        indices_fn=lambda epoch: np.arange(64),
        num_workers=2, prefetch=2,
    )
    it = iter(loader)
    first = next(it)
    assert first[0][:, 0, 0].tolist() == [0, 1, 2, 3]
    it.close()  # abandon mid-epoch: must not deadlock or leak the pool
    # loader still usable afterwards
    vals = [b[0][:, 0, 0].tolist() for b in loader]
    assert vals[0] == [0, 1, 2, 3] and len(vals) == 16
    loader.close()


def test_device_prefetcher_matches_host_batches():
    import jax

    from headct_foundation_tpu.data.pipeline import DevicePrefetcher
    from headct_foundation_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=len(jax.devices()))
    rng = np.random.RandomState(0)
    host_batches = [
        (rng.rand(8, 1, 4, 4, 4).astype(np.float16), [f"f{i}"]) for i in range(3)
    ]
    pf = DevicePrefetcher(host_batches, mesh, depth=2)
    out = list(pf)
    assert len(out) == len(pf) == 3
    for (host, fnames), got in zip(host_batches, out):
        dev, got_fnames = got
        assert isinstance(dev, jax.Array)
        assert dev.dtype == jnp_float16()
        np.testing.assert_array_equal(np.asarray(dev), host)
        assert got_fnames == fnames
    # bare-array batches and with_counts
    bare = [rng.rand(5, 2).astype(np.float32)]
    dev, n = next(iter(DevicePrefetcher(bare, mesh, with_counts=True)))
    assert n == 5  # real batch size before mesh padding
    np.testing.assert_array_equal(np.asarray(dev)[:5], bare[0])


def jnp_float16():
    import jax.numpy as jnp

    return jnp.float16


def test_device_prefetcher_chunked_transfer(monkeypatch):
    """Large batches split into concurrent chunked device_puts must yield
    bit-identical arrays with the mesh batch sharding."""
    import jax

    from headct_foundation_tpu.data import pipeline as pl
    from headct_foundation_tpu.parallel.mesh import make_mesh

    monkeypatch.setattr(pl.DevicePrefetcher, "CHUNK_BYTES", 1024)
    mesh = make_mesh(data=1, devices=jax.devices()[:1])  # single-device path
    host = np.random.RandomState(0).rand(8, 4, 4, 4).astype(np.float16)
    out = list(pl.DevicePrefetcher([host], mesh))
    assert len(out) == 1
    np.testing.assert_array_equal(np.asarray(out[0]), host)


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


def test_packed_cache_roundtrip(tmp_path):
    """Packed shard format: writer -> index -> memmapped reads identical to
    the per-volume path; DiskCache serves packed hits without touching the
    per-volume .npy files."""
    from headct_foundation_tpu.data.datasets import (
        DiskCache, PackedCacheWriter, PackedShardReader,
    )

    paths = _make_scans(tmp_path, 5)
    cache_dir = str(tmp_path / "cache")
    cache = DiskCache(cache_dir, (ROI,) * 3, 3)
    vols = {p: np.array(cache.load(p)) for p in paths}  # per-volume build

    packed_dir = str(tmp_path / "packed")
    with PackedCacheWriter(
        packed_dir, (3, ROI, ROI, ROI), volumes_per_shard=2
    ) as w:
        for p in paths:
            w.add(cache._key(p), vols[p])

    reader = PackedShardReader.open(packed_dir)
    assert reader is not None and len(reader) == 5
    assert len(reader._shard_meta) == 3  # 2+2+1 across three shards
    for p in paths:
        np.testing.assert_array_equal(np.asarray(reader.get(cache._key(p))), vols[p])

    # DiskCache in a packed-only dir: every load is a packed hit, no .npy
    # files appear
    pcache = DiskCache(packed_dir, (ROI,) * 3, 3)
    for p in paths:
        np.testing.assert_array_equal(np.asarray(pcache.load(p)), vols[p])
    assert not [f for f in os.listdir(packed_dir) if f.endswith(".npy")]


def test_packed_cache_incremental_rebuild(tmp_path):
    """Re-opening a PackedCacheWriter over an existing same-tag index is an
    incremental build: old entries carry into the new index, old shard
    FILES are never reopened/truncated (a live reader may be serving
    memmapped pages from them), and new volumes land in fresh shards."""
    import hashlib

    from headct_foundation_tpu.data.datasets import (
        PackedCacheWriter, PackedShardReader,
    )

    shape = (1, 4, 4, 4)
    rng = np.random.RandomState(3)
    vols = {f"k{i}": rng.rand(*shape).astype(np.float16) for i in range(5)}
    with PackedCacheWriter(str(tmp_path), shape, volumes_per_shard=2) as w:
        for k in ("k0", "k1", "k2"):
            w.add(k, vols[k])
    old_bins = {
        f: hashlib.sha1((tmp_path / f).read_bytes()).hexdigest()
        for f in os.listdir(tmp_path) if f.endswith(".bin")
    }
    # a reader holding memmaps open across the rebuild (the crash scenario)
    live = PackedShardReader.open(str(tmp_path))
    live.get("k0")

    with PackedCacheWriter(str(tmp_path), shape, volumes_per_shard=2) as w:
        assert set(w.entries) == {"k0", "k1", "k2"}  # carried over
        for k in ("k3", "k4"):
            w.add(k, vols[k])

    for f, digest in old_bins.items():  # old shards bit-identical
        assert hashlib.sha1((tmp_path / f).read_bytes()).hexdigest() == digest
    reader = PackedShardReader.open(str(tmp_path))
    assert len(reader) == 5
    for k, v in vols.items():
        np.testing.assert_array_equal(np.asarray(reader.get(k)), v)
    np.testing.assert_array_equal(np.asarray(live.get("k1")), vols["k1"])

    # dtype divergence fails loudly on reopen
    with pytest.raises(ValueError, match="dtype"):
        PackedCacheWriter(str(tmp_path), shape, dtype=np.float32)


def test_packed_cache_multi_tag_merge(tmp_path):
    """Rank-tagged shard series (parallel builds) merge at read time."""
    from headct_foundation_tpu.data.datasets import (
        PackedCacheWriter, PackedShardReader,
    )

    shape = (1, 4, 4, 4)
    rng = np.random.RandomState(0)
    expect = {}
    for tag in ("r0_", "r1_"):
        with PackedCacheWriter(str(tmp_path), shape, 2, tag=tag) as w:
            for i in range(3):
                v = rng.rand(*shape).astype(np.float16)
                expect[f"{tag}{i}"] = v
                w.add(f"{tag}{i}", v)
    reader = PackedShardReader.open(str(tmp_path))
    assert len(reader) == 6
    for k, v in expect.items():
        np.testing.assert_array_equal(np.asarray(reader.get(k)), v)


def test_packed_cache_mixed_geometries(tmp_path):
    """One cache dir holding packed builds with DIFFERENT shapes/dtypes
    (e.g. 3-channel pretrain next to 1-channel downstream volumes) serves
    both: each shard is memmapped with its own index's geometry. Regression:
    this used to raise 'packed cache shape mismatch' on EVERY load, which
    dataset error-shielding silently turned into zero placeholders."""
    from headct_foundation_tpu.data.datasets import (
        DiskCache, PackedCacheWriter, PackedShardReader,
    )

    rng = np.random.RandomState(0)
    a_shape, b_shape = (3, 4, 4, 4), (1, 6, 6, 6)
    a = {f"a{i}": rng.rand(*a_shape).astype(np.float16) for i in range(3)}
    b = {f"b{i}": rng.rand(*b_shape).astype(np.float32) for i in range(2)}
    with PackedCacheWriter(str(tmp_path), a_shape, 2, tag="a_") as w:
        for k, v in a.items():
            w.add(k, v)
    with PackedCacheWriter(
        str(tmp_path), b_shape, 2, tag="b_", dtype=np.float32
    ) as w:
        for k, v in b.items():
            w.add(k, v)

    reader = PackedShardReader.open(str(tmp_path))
    assert len(reader) == 5
    for k, v in {**a, **b}.items():
        got = np.asarray(reader.get(k))
        assert got.dtype == v.dtype
        np.testing.assert_array_equal(got, v)

    # a corrupt index file disables the packed path without poisoning loads
    with open(tmp_path / "pack_indexzz.json", "w") as f:
        f.write("{not json")
    cache = DiskCache(str(tmp_path), (ROI,) * 3, 3)
    with pytest.raises(Exception):
        PackedShardReader.open(str(tmp_path))
    paths = _make_scans(tmp_path, 1)
    vol = cache.load(paths[0])  # falls back to preprocess + .npy, no raise
    assert vol.shape == (3, ROI, ROI, ROI) and cache._packed is None


def test_threaded_loader_from_packed_cache(tmp_path):
    """ThreadedLoader batches off a packed cache match the per-volume cache."""
    from headct_foundation_tpu.data.datasets import DiskCache, PackedCacheWriter

    paths = _make_scans(tmp_path, 4)
    csv = tmp_path / "train.csv"
    pd.DataFrame({"img_path": paths}).to_csv(csv, index=False)
    cfg = _cfg(tmp_path)
    cache = DiskCache(cfg.DATA.CACHE_DIR, (ROI,) * 3, 3)

    packed_dir = str(tmp_path / "packed")
    with PackedCacheWriter(packed_dir, (3, ROI, ROI, ROI)) as w:
        for p in paths:
            w.add(cache._key(p), cache.load(p))

    ds = PretrainDataset(cfg, str(csv), cache_dir=packed_dir)
    loader = ThreadedLoader(
        ds, batch_size=2,
        indices_fn=lambda epoch: distributed_indices(4, 0, 1, shuffle=False),
        num_workers=2,
    )
    batches = list(loader)
    loader.close()
    assert len(batches) == 2
    got = np.concatenate([b[0] for b in batches])
    want = np.stack([cache.load(p) for p in paths])
    np.testing.assert_array_equal(got, want)


def test_threaded_loader_worker_self_cap(monkeypatch):
    """Worker pools self-cap at 4 threads/core (oversubscription on small
    hosts only adds GIL thrash — measured); the env override lifts it."""
    import os as _os

    from headct_foundation_tpu.data.datasets import ThreadedLoader

    class _DS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            return np.zeros((1, 2, 2, 2), np.float16), str(i)

    cores = _os.cpu_count() or 1
    ld = ThreadedLoader(_DS(), batch_size=2,
                        indices_fn=lambda e: np.arange(4), num_workers=1000)
    assert ld.num_workers == 4 * cores
    ld.close()

    monkeypatch.setenv("HEADCT_LOADER_MAX_WORKERS", "7")
    ld = ThreadedLoader(_DS(), batch_size=2,
                        indices_fn=lambda e: np.arange(4), num_workers=1000)
    assert ld.num_workers == 7
    ld.close()

    ld = ThreadedLoader(_DS(), batch_size=2,
                        indices_fn=lambda e: np.arange(4), num_workers=2)
    assert ld.num_workers == 2  # requests below the cap are untouched
    ld.close()
