"""Native (C++) preprocessing pipeline: availability, parity, error paths."""

import os

import numpy as np
import pytest
from scipy import ndimage

from headct_foundation_tpu.data.native_loader import (
    load_and_preprocess_native,
    native_available,
)
from headct_foundation_tpu.data.nifti import save_nifti
from headct_foundation_tpu.data.transforms import load_and_preprocess

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


def _scan(tmp_path, affine, shape=(40, 44, 36), name="s.nii.gz", seed=0):
    rng = np.random.RandomState(seed)
    base = ndimage.gaussian_filter(rng.rand(*shape), 2)
    vol = (base / base.max() * 3000 - 1000).astype(np.float32)
    p = str(tmp_path / name)
    save_nifti(p, vol, affine)
    return p


def test_parity_with_python_pipeline(tmp_path):
    p = _scan(tmp_path, np.diag([2.0, 1.5, 2.5, 1.0]))
    py = load_and_preprocess(p, (48, 48, 48), 3).astype(np.float32)
    nat = load_and_preprocess_native(p, (48, 48, 48), 3).astype(np.float32)
    assert nat.shape == py.shape
    # resample numerics agree except isolated boundary voxels (spline
    # prefilter init differs slightly from scipy's exact mirror recursion)
    assert np.abs(py - nat).max() < 2e-2
    assert np.abs(py - nat).mean() < 1e-4
    cos = (py * nat).sum() / (np.linalg.norm(py) * np.linalg.norm(nat) + 1e-12)
    assert cos > 0.9999


def test_parity_with_flips_and_permutation(tmp_path):
    aff = np.zeros((4, 4))
    aff[0, 1] = -1.0  # world x from voxel axis 1, flipped
    aff[1, 0] = 1.0
    aff[2, 2] = 1.0
    aff[3, 3] = 1.0
    p = _scan(tmp_path, aff)
    py = load_and_preprocess(p, (24, 24, 24), 1).astype(np.float32)
    nat = load_and_preprocess_native(p, (24, 24, 24), 1).astype(np.float32)
    np.testing.assert_allclose(py, nat, atol=1e-3)


def test_single_channel(tmp_path):
    p = _scan(tmp_path, np.eye(4))
    nat = load_and_preprocess_native(p, (24, 24, 24), 1)
    assert nat.shape == (1, 24, 24, 24)
    assert nat.dtype == np.float16
    assert 0.0 <= float(nat.min()) and float(nat.max()) <= 1.0


def test_error_paths(tmp_path):
    missing = str(tmp_path / "missing.nii.gz")
    with pytest.raises(RuntimeError, match="cannot open"):
        load_and_preprocess_native(missing, (24, 24, 24), 3)
    bad = tmp_path / "bad.nii"
    bad.write_bytes(b"garbage" * 100)
    with pytest.raises(RuntimeError):
        load_and_preprocess_native(str(bad), (24, 24, 24), 3)
    trunc = tmp_path / "trunc.nii"
    p = _scan(tmp_path, np.eye(4), name="full.nii")
    trunc.write_bytes(open(p, "rb").read()[:400])
    with pytest.raises(RuntimeError, match="truncated"):
        load_and_preprocess_native(str(trunc), (24, 24, 24), 3)


def test_diskcache_uses_native(tmp_path, monkeypatch):
    from headct_foundation_tpu.data.datasets import DiskCache

    p = _scan(tmp_path, np.diag([2.0, 2.0, 2.0, 1.0]))
    cache = DiskCache(str(tmp_path / "c"), (24, 24, 24), 3)
    v1 = cache.load(p)
    assert v1.shape == (3, 24, 24, 24)
    # forcing python path gives numerically close results
    monkeypatch.setenv("HEADCT_NATIVE", "0")
    cache2 = DiskCache(str(tmp_path / "c2"), (24, 24, 24), 3)
    v2 = cache2.load(p)
    assert np.abs(v1.astype(np.float32) - v2.astype(np.float32)).mean() < 1e-4


def test_int16_scaled_nifti_decoders_agree(tmp_path):
    """Real CT is stored int16 with scl_slope/inter rescaling to HU; the
    python reader and the native decode-only API must agree exactly."""
    import numpy as np
    import pytest

    from headct_foundation_tpu.data.native_loader import (
        decode_native,
        native_available,
    )
    from headct_foundation_tpu.data.nifti import (
        load_nifti,
        orientation_ras,
        save_nifti,
    )

    if not native_available():
        pytest.skip("native library unavailable")

    rng = np.random.RandomState(0)
    raw = rng.randint(0, 3000, size=(20, 18, 16)).astype(np.int16)
    p = str(tmp_path / "ct.nii.gz")
    save_nifti(p, raw, np.diag([1.0, 1.0, 2.0, 1.0]), dtype=np.int16,
               scl_slope=1.0, scl_inter=-1024.0)

    img = load_nifti(p)
    py_data, py_aff = orientation_ras(
        np.asarray(img.data, np.float32), img.affine
    )
    np.testing.assert_allclose(py_data.min(), raw.min() - 1024.0)

    nat_data, nat_aff = decode_native(p)
    np.testing.assert_array_equal(nat_data, py_data)
    np.testing.assert_allclose(nat_aff, py_aff[:3, :4], atol=1e-5)


def test_decode_native_corrupt_files_error_not_abort(tmp_path):
    """Corrupt inputs must surface as catchable per-file errors (the
    datasets' error shielding relies on it) — never a C++ exception
    crossing the C ABI into std::terminate. Covers: garbage bytes, a valid
    gzip with a corrupted ISIZE trailer (would otherwise drive a huge
    up-front allocation in the fast-inflate path), and a truncated gzip."""
    import gzip

    import pytest

    from headct_foundation_tpu.data.native_loader import (
        decode_native,
        native_available,
    )

    if not native_available():
        pytest.skip("native library unavailable")

    cases = {
        "garbage.nii": b"definitely not a nifti",
        "bad_isize.nii.gz": gzip.compress(b"x" * 100000)[:-4] + b"\xff" * 4,
        "truncated.nii.gz": gzip.compress(b"y" * 100000)[:64],
    }
    for name, blob in cases.items():
        p = tmp_path / name
        p.write_bytes(blob)
        with pytest.raises(RuntimeError):
            decode_native(str(p))
