import os

import numpy as np
import pytest

from headct_foundation_tpu.data.nifti import save_nifti
from headct_foundation_tpu.eval.retrieval import (
    average_precision,
    retrieval_map,
    retrieval_map_per_class,
)
from headct_foundation_tpu.feature_extraction import FeatureExtractor


@pytest.fixture(scope="module")
def extractor():
    return FeatureExtractor(
        img_size=24, patch_size=12, in_chans=3, hidden_size=48, mlp_dim=96,
        num_layers=2, num_heads=4,
    )


def test_forward_returns_tokens_and_hidden(extractor):
    x = np.random.RandomState(0).rand(2, 3, 24, 24, 24).astype(np.float32)
    out, hidden = extractor(x)
    assert out.shape == (2, 1 + 8, 48)
    assert len(hidden) == 2
    cls = extractor.cls_embedding(x)
    assert cls.shape == (2, 48)
    np.testing.assert_allclose(cls, np.asarray(out[:, 0, :]), atol=1e-6)


def test_extract_from_files(extractor, tmp_path):
    rng = np.random.RandomState(1)
    paths = []
    for i in range(5):
        vol = (rng.rand(30, 30, 30) * 3000 - 1000).astype(np.float32)
        p = str(tmp_path / f"s{i}.nii.gz")
        save_nifti(p, vol, np.diag([2.0, 2.0, 2.0, 1.0]))
        paths.append(p)
    feats = extractor.extract_from_files(paths, batch_size=2)
    assert feats.shape == (5, 48)
    assert np.isfinite(feats).all()
    # deterministic across calls
    feats2 = extractor.extract_from_files(paths, batch_size=3)
    np.testing.assert_allclose(feats, feats2, atol=1e-4)


def test_device_area_ops_match_host_operator():
    """The on-device bbox + 'area' operator builder (_device_area_ops,
    inside the fused single-dispatch preprocess) must reproduce the host
    reference builder (area_axis_operator) bit-for-bit — including a
    NONTRIVIAL foreground crop and the empty-foreground full-axis
    fallback."""
    import jax.numpy as jnp

    from headct_foundation_tpu.data.device_preprocess import (
        _device_area_ops,
        area_axis_operator,
    )

    n_pad, n_real, n_out = 64, 50, 24
    vol = np.zeros((n_pad, n_pad, n_pad), np.float32)
    # distinct per-axis foreground extents: [7,41) x [3,50) x [11,29)
    vol[7:41, 3:50, 11:29] = 1.0
    n_reals = jnp.asarray([n_real] * 3, jnp.int32)  # traced in production
    ops = _device_area_ops(jnp.asarray(vol), n_reals, (n_out,) * 3)
    for m, (s, e) in zip(ops, [(7, 41), (3, 50), (11, 29)]):
        ref = area_axis_operator(n_pad, s, e, n_out)
        np.testing.assert_array_equal(np.asarray(m), ref)
    # empty foreground -> full real axis [0, n_real)
    ops = _device_area_ops(jnp.zeros((n_pad,) * 3), n_reals, (n_out,) * 3)
    for m in ops:
        ref = area_axis_operator(n_pad, 0, n_real, n_out)
        np.testing.assert_array_equal(np.asarray(m), ref)


def test_device_preprocess_one_compile_per_bucket(tmp_path):
    """Scans of different real geometry inside the same 128-bucket must
    share ONE compiled program: n_reals is a traced operand, so only the
    bucket-padded shapes enter the jit signature (real datasets vary
    continuously — a compile per geometry would dwarf the fused-dispatch
    win)."""
    from headct_foundation_tpu.data.device_preprocess import (
        DevicePreprocessor, _fused_preprocess,
    )

    dp = DevicePreprocessor((24, 24, 24), 3)
    rng = np.random.RandomState(5)
    before = _fused_preprocess._cache_size()
    for i, (shape, vox) in enumerate(
        [((40, 36, 28), (1.5, 1.25, 2.0)), ((37, 41, 25), (1.4, 1.3, 2.1))]
    ):
        vol = (rng.rand(*shape) * 2000 - 1000).astype(np.float32)
        p = str(tmp_path / f"s{i}.nii.gz")
        save_nifti(p, vol, np.diag(vox + (1.0,)))
        out = np.asarray(dp(p))
        assert out.shape == (3, 24, 24, 24) and np.isfinite(out).all()
    assert _fused_preprocess._cache_size() - before <= 1


@pytest.mark.parametrize("in_chans", [1, 3])
def test_device_preprocess_matches_scipy(tmp_path, in_chans):
    """On-device preprocessing (cubic resample + crop + area resize + window
    as TPU matmuls) must match the scipy host path voxel-for-voxel — the
    per-axis operators are scipy's own zoom applied to identity matrices."""
    from headct_foundation_tpu.data.device_preprocess import DevicePreprocessor
    from headct_foundation_tpu.data.transforms import extract_feature_preprocess

    rng = np.random.RandomState(7)
    vol = (rng.rand(40, 36, 28) * 3000 - 1000).astype(np.float32)
    p = str(tmp_path / "scan.nii.gz")
    save_nifti(p, vol, np.diag([1.5, 1.25, 2.0, 1.0]))  # anisotropic grid

    ref = extract_feature_preprocess(p, (24, 24, 24), in_chans)
    dev = np.asarray(DevicePreprocessor((24, 24, 24), in_chans)(p))
    assert dev.shape == ref.shape == (in_chans, 24, 24, 24)
    np.testing.assert_allclose(dev, ref, atol=1e-3, rtol=1e-3)


def test_device_preprocess_training_order_matches_scipy(tmp_path):
    """Training-order device path (window BEFORE resize) must match the
    scipy training pipeline (load_and_preprocess) — this is what the
    HEADCT_DEVICE_CACHE=1 cache backend serves."""
    from headct_foundation_tpu.data.device_preprocess import DevicePreprocessor
    from headct_foundation_tpu.data.transforms import load_and_preprocess

    rng = np.random.RandomState(9)
    vol = (rng.rand(40, 36, 28) * 3000 - 1000).astype(np.float32)
    p = str(tmp_path / "scan.nii.gz")
    save_nifti(p, vol, np.diag([1.5, 1.25, 2.0, 1.0]))

    ref = load_and_preprocess(p, (24, 24, 24), 3).astype(np.float32)
    dev = np.asarray(
        DevicePreprocessor((24, 24, 24), 3, order="training")(p)
    )
    np.testing.assert_allclose(dev, ref, atol=2e-3, rtol=1e-3)


def test_device_cache_backend(tmp_path, monkeypatch):
    """HEADCT_DEVICE_CACHE=1 routes DiskCache through the device pipeline
    with its own cache key namespace."""
    from headct_foundation_tpu.data.datasets import DiskCache
    from headct_foundation_tpu.data.transforms import load_and_preprocess

    rng = np.random.RandomState(10)
    vol = (rng.rand(30, 30, 30) * 3000 - 1000).astype(np.float32)
    p = str(tmp_path / "scan.nii.gz")
    save_nifti(p, vol, np.diag([2.0, 2.0, 2.0, 1.0]))

    cache_py = DiskCache(str(tmp_path / "c"), (16, 16, 16), 3)
    key_default = cache_py._key(p)
    monkeypatch.setenv("HEADCT_DEVICE_CACHE", "1")
    cache_dev = DiskCache(str(tmp_path / "c"), (16, 16, 16), 3)
    assert cache_dev._backend() == "device"
    assert cache_dev._key(p) != key_default  # separate namespace

    out = cache_dev.load(p)
    assert out.shape == (3, 16, 16, 16) and out.dtype == np.float16
    ref = load_and_preprocess(p, (16, 16, 16), 3)
    np.testing.assert_allclose(
        out.astype(np.float32), ref.astype(np.float32), atol=2e-3
    )
    # second load is a cache hit with identical bytes
    np.testing.assert_array_equal(cache_dev.load(p), out)


def test_device_preprocess_isotropic_skip(tmp_path):
    """Spacing ~1 mm skips the resample exactly like the scipy path."""
    from headct_foundation_tpu.data.device_preprocess import DevicePreprocessor
    from headct_foundation_tpu.data.transforms import extract_feature_preprocess

    rng = np.random.RandomState(8)
    vol = (rng.rand(30, 30, 30) * 3000 - 1000).astype(np.float32)
    p = str(tmp_path / "iso.nii.gz")
    save_nifti(p, vol, np.diag([1.0, 1.0, 1.0, 1.0]))
    ref = extract_feature_preprocess(p, (16, 16, 16), 3)
    dev = np.asarray(DevicePreprocessor((16, 16, 16), 3)(p))
    np.testing.assert_allclose(dev, ref, atol=1e-4, rtol=1e-4)


def test_average_precision():
    assert average_precision([1, 1, 0, 0]) == 1.0
    assert average_precision([0, 0, 1]) == pytest.approx(1 / 3)
    assert np.isnan(average_precision([0, 0, 0]))


def test_average_precision_matches_sklearn():
    # Rank-based AP equals sklearn's threshold-based AP when scores are
    # unique (continuous similarities have no ties in practice).
    from sklearn.metrics import average_precision_score

    rng = np.random.RandomState(3)
    for _ in range(5):
        scores = rng.randn(50)
        labels = rng.randint(0, 2, size=50)
        labels[0] = 1  # at least one positive
        ours = average_precision(labels[np.argsort(-scores)])
        assert ours == pytest.approx(
            average_precision_score(labels, scores), rel=1e-9
        )


def test_retrieval_map_separable_clusters():
    rng = np.random.RandomState(0)
    # two well-separated clusters: positives around +10, negatives around -10
    pos = rng.randn(10, 8) + 10.0
    neg = rng.randn(20, 8) - 10.0
    emb = np.concatenate([pos, neg])
    labels = np.array([1] * 10 + [0] * 20)
    assert retrieval_map(emb, labels) > 0.99
    # random labels give much lower mAP
    rand_labels = rng.permutation(labels)
    assert retrieval_map(emb, rand_labels) < 0.9
    per = retrieval_map_per_class(emb, {"a": labels, "b": rand_labels})
    assert per["a"] > per["b"]


def test_attention_maps_shapes_and_rows(extractor):
    """save_attn surface: per-layer [B, H, T, T] post-softmax matrices whose
    rows are probability distributions."""
    x = np.random.RandomState(2).rand(2, 3, 24, 24, 24).astype(np.float32)
    maps = extractor.attention_maps(x)
    T = 1 + 8  # CLS + 2^3 patches
    assert len(maps) == 2
    for m in maps:
        assert m.shape == (2, 4, T, T)
        np.testing.assert_allclose(m.sum(axis=-1), 1.0, atol=1e-5)
        assert (m >= 0).all()


def test_cls_attention_volume_overlay_grid(extractor):
    """CLS attention reshaped onto the token grid and upsampled to the
    volume resolution: block-constant over each patch's voxels, and the
    single-head slice must match slicing the raw maps."""
    from headct_foundation_tpu.feature_extraction import cls_attention_grid

    x = np.random.RandomState(3).rand(1, 3, 24, 24, 24).astype(np.float32)
    att = extractor.cls_attention_volume(x, layer=-1)
    assert att.shape == (1, 24, 24, 24)
    # nearest-neighbor upsample => constant within each 12^3 patch block
    blocks = att.reshape(1, 2, 12, 2, 12, 2, 12)
    assert np.allclose(blocks, blocks[:, :, :1, :, :1, :, :1])

    maps = extractor.attention_maps(x)
    grid_mean = cls_attention_grid(maps, (2, 2, 2))
    np.testing.assert_allclose(
        grid_mean, np.asarray(maps[-1])[:, :, 0, 1:].mean(1).reshape(1, 2, 2, 2),
        atol=1e-6,
    )
    att_h0 = cls_attention_grid(maps, (2, 2, 2), head=0)
    np.testing.assert_allclose(
        att_h0.ravel(), np.asarray(maps[-1])[0, 0, 0, 1:], atol=1e-6
    )


def test_cls_attention_grid_skips_register_tokens():
    ext = FeatureExtractor(
        img_size=24, patch_size=12, in_chans=1, hidden_size=36, mlp_dim=64,
        num_layers=1, num_heads=2, num_register_tokens=3,
    )
    x = np.random.RandomState(4).rand(1, 1, 24, 24, 24).astype(np.float32)
    att = ext.cls_attention_volume(x, layer=0)
    assert att.shape == (1, 24, 24, 24)
    maps = ext.attention_maps(x)
    assert maps[0].shape == (1, 2, 1 + 3 + 8, 1 + 3 + 8)
    # register rows excluded: grid values come from columns 4..12
    expect = np.asarray(maps[0])[:, :, 0, 4:].mean(1).reshape(1, 2, 2, 2)
    np.testing.assert_allclose(att[:, ::12, ::12, ::12], expect, atol=1e-6)


@pytest.mark.slow
def test_visualize_attention_example_runs(tmp_path):
    """The shipped example renders end-to-end (phantom scan -> PNG)."""
    import subprocess
    import sys as _sys

    out = tmp_path / "attn.png"
    r = subprocess.run(
        [_sys.executable, "examples/visualize_attention.py", "--out", str(out),
         "--layers", "0", "1"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True, timeout=1200,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists() and out.stat().st_size > 10_000
