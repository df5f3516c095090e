import os

import numpy as np
import pytest
import torch

from headct_foundation_tpu.data.nifti import load_nifti, orientation_ras, save_nifti
from headct_foundation_tpu.data.transforms import (
    area_resize,
    crop_foreground,
    load_and_preprocess,
    resize_with_pad_or_crop,
    scale_intensity_range,
    window_stack,
)


def test_nifti_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    vol = rng.randn(17, 23, 11).astype(np.float32) * 100
    affine = np.diag([2.0, 1.5, 3.0, 1.0])
    affine[:3, 3] = [5, -3, 2]
    for name in ["a.nii", "b.nii.gz"]:
        p = str(tmp_path / name)
        save_nifti(p, vol, affine)
        img = load_nifti(p)
        np.testing.assert_allclose(img.data, vol, atol=1e-5)
        np.testing.assert_allclose(img.affine, affine, atol=1e-5)
        np.testing.assert_allclose(img.spacing, [2.0, 1.5, 3.0], atol=1e-5)


def test_orientation_ras_identity():
    vol = np.random.RandomState(1).randn(4, 5, 6).astype(np.float32)
    out, aff = orientation_ras(vol, np.eye(4))
    np.testing.assert_array_equal(out, vol)


def test_orientation_ras_flip_and_permute():
    vol = np.random.RandomState(2).randn(4, 5, 6).astype(np.float32)
    # LPS affine: flip x and y
    affine = np.diag([-1.0, -1.0, 1.0, 1.0])
    out, aff = orientation_ras(vol, affine)
    np.testing.assert_array_equal(out, vol[::-1, ::-1, :])
    assert np.all(np.diag(aff[:3, :3]) > 0)

    # axis permutation: world x comes from voxel axis 2
    perm_aff = np.zeros((4, 4))
    perm_aff[0, 2] = 1.0
    perm_aff[1, 0] = 1.0
    perm_aff[2, 1] = 1.0
    perm_aff[3, 3] = 1.0
    out2, aff2 = orientation_ras(vol, perm_aff)
    assert out2.shape == (6, 4, 5)
    np.testing.assert_array_equal(out2, np.transpose(vol, (2, 0, 1)))


def test_window_math_matches_reference_values():
    x = np.array([[[-1000.0, 0.0, 40.0, 80.0, 3000.0]]])
    out = window_stack(x, 3)
    assert out.shape == (3, 1, 1, 5)
    # brain window (40, 80): a_min=0, a_max=80
    np.testing.assert_allclose(out[0, 0, 0], [0.0, 0.0, 0.5, 1.0, 1.0], atol=1e-6)
    # subdural window (80, 200): a_min=-20, a_max=180
    np.testing.assert_allclose(out[1, 0, 0], [0.0, 0.1, 0.3, 0.5, 1.0], atol=1e-6)
    # bone window (600, 2800): a_min=-800, a_max=2000
    np.testing.assert_allclose(
        out[2, 0, 0], [0.0, 800 / 2800, 840 / 2800, 880 / 2800, 1.0], atol=1e-6
    )
    out1 = window_stack(x, 1)
    assert out1.shape == (1, 1, 1, 5)
    np.testing.assert_allclose(out1[0, 0, 0, 1], 110 / 300, atol=1e-6)


def test_area_resize_matches_torch():
    rng = np.random.RandomState(3)
    x = rng.rand(2, 20, 14, 30).astype(np.float32)
    ours = area_resize(x, (10, 7, 9))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x)[None], size=(10, 7, 9), mode="area"
    )[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_crop_foreground():
    x = np.zeros((10, 10, 10), dtype=np.float32)
    x[2:5, 3:7, 1:9] = 5.0
    out, start, end = crop_foreground(x)
    assert out.shape == (3, 4, 8)
    np.testing.assert_array_equal(start, [2, 3, 1])
    # all-background returns full volume
    out2, _, _ = crop_foreground(np.zeros((4, 4, 4), dtype=np.float32) - 1)
    assert out2.shape == (4, 4, 4)


def test_resize_with_pad_or_crop():
    x = np.arange(2 * 4 * 6 * 3, dtype=np.float32).reshape(2, 4, 6, 3)
    out = resize_with_pad_or_crop(x, (6, 4, 3))
    assert out.shape == (2, 6, 4, 3)
    # padded symmetrically on axis 0 (4 -> 6: one before, one after)
    np.testing.assert_array_equal(out[:, 0], 0)
    np.testing.assert_array_equal(out[:, -1], 0)
    # cropped center on axis 1 (6 -> 4: starts at 1)
    np.testing.assert_array_equal(out[:, 1, :, :], x[:, 0, 1:5, :])


def test_load_and_preprocess_end_to_end(tmp_path):
    rng = np.random.RandomState(4)
    # synthetic head-like volume: HU in [-1000, 2000], spacing 2mm
    vol = (rng.rand(40, 50, 30) * 3000 - 1000).astype(np.float32)
    vol[:5] = -1000  # air border to exercise crop_foreground
    affine = np.diag([2.0, 2.0, 2.0, 1.0])
    p = str(tmp_path / "scan.nii.gz")
    save_nifti(p, vol, affine)
    out = load_and_preprocess(p, (96, 96, 96), 3)
    assert out.shape == (3, 96, 96, 96)
    assert out.dtype == np.float16
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0
    assert float(out.std()) > 0.01  # non-degenerate
