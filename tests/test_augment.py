import jax
import jax.numpy as jnp
import numpy as np
import pytest

from headct_foundation_tpu.data.augment import (
    crop_and_resize,
    dino_multicrop,
    mae_augment,
    rand_adjust_contrast,
    rand_flip,
    rand_gaussian_smooth,
    rand_shift_intensity,
)

KEY = jax.random.PRNGKey(0)


def _batch(b=8, c=1, r=16):
    return jnp.asarray(
        np.random.RandomState(0).rand(b, c, r, r, r).astype(np.float32)
    )


def test_rand_flip_prob():
    x = _batch(b=64)
    # prob=1: all flipped
    out = rand_flip(KEY, x, 1.0, axis=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(jnp.flip(x, axis=2)))
    # prob=0: none
    out = rand_flip(KEY, x, 0.0, axis=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    # prob=0.5: some flipped, some not (statistically certain for b=64)
    out = np.asarray(rand_flip(KEY, x, 0.5, axis=1))
    flipped = np.asarray(jnp.flip(x, axis=2))
    per_sample_flipped = [
        np.array_equal(out[i], flipped[i]) for i in range(64)
    ]
    assert 5 < sum(per_sample_flipped) < 60


def test_rand_shift_intensity_range():
    x = _batch(b=32)
    out = np.asarray(rand_shift_intensity(KEY, x, 0.1, 1.0))
    shifts = out - np.asarray(x)
    per_sample = shifts.reshape(32, -1)
    # each sample has one constant shift in [-0.1, 0.1]
    assert np.allclose(per_sample.std(axis=1), 0, atol=1e-6)
    assert np.all(np.abs(per_sample.mean(axis=1)) <= 0.1 + 1e-6)


def test_rand_gaussian_smooth_reduces_variance():
    x = _batch(b=4)
    out = np.asarray(rand_gaussian_smooth(KEY, x, (0.8, 1.0), prob=1.0))
    assert out.shape == x.shape
    assert out.std() < np.asarray(x).std()
    # prob=0 is identity
    same = np.asarray(rand_gaussian_smooth(KEY, x, (0.8, 1.0), prob=0.0))
    np.testing.assert_array_equal(same, np.asarray(x))


def test_rand_adjust_contrast_preserves_range():
    x = _batch(b=4)
    out = np.asarray(rand_adjust_contrast(KEY, x, (0.2, 1.0), prob=1.0))
    for i in range(4):
        assert out[i].min() >= np.asarray(x)[i].min() - 1e-5
        assert out[i].max() <= np.asarray(x)[i].max() + 1e-5


def test_crop_and_resize_identity():
    x = _batch(b=2, r=16)
    start = jnp.zeros((2, 3))
    size = jnp.full((2, 3), 16.0)
    out = np.asarray(crop_and_resize(x, start, size, (16, 16, 16)))
    np.testing.assert_allclose(out, np.asarray(x), atol=1e-5)


def test_crop_and_resize_out_of_bounds_zero():
    x = jnp.ones((1, 1, 8, 8, 8))
    # box entirely outside the volume -> zeros
    start = jnp.asarray([[20.0, 20.0, 20.0]])
    size = jnp.asarray([[8.0, 8.0, 8.0]])
    out = np.asarray(crop_and_resize(x, start, size, (4, 4, 4)))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_crop_and_resize_downscale_matches_torch_trilinear():
    import torch

    x_np = np.random.RandomState(1).rand(1, 1, 12, 12, 12).astype(np.float32)
    out = np.asarray(
        crop_and_resize(jnp.asarray(x_np), jnp.zeros((1, 3)), jnp.full((1, 3), 12.0), (6, 6, 6))
    )
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x_np), size=(6, 6, 6), mode="trilinear", align_corners=False
    ).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_mae_augment_shape_and_range():
    x = _batch(b=4)
    out = mae_augment(KEY, x)
    assert out.shape == x.shape
    out2 = mae_augment(KEY, x, reshape=False)  # with gaussian smooth
    assert out2.shape == x.shape


def test_dino_multicrop_shapes_and_content():
    x = _batch(b=2, c=3, r=96 // 4)  # small 24^3 volume for speed
    crops = dino_multicrop(
        KEY, x, final_size=(24, 24, 24), global_crop_size=112,
        local_crop_size=64, local_crops_number=2,
    )
    assert len(crops) == 4
    for c in crops:
        assert c.shape == (2, 3, 24, 24, 24)
    # crops are jittable
    f = jax.jit(lambda rng, v: dino_multicrop(
        rng, v, final_size=(24, 24, 24), local_crops_number=2))
    crops2 = f(KEY, x)
    assert len(crops2) == 4


def test_crop_and_resize_area_matches_host_adaptive_pool():
    """mode='area' with integer boxes must reproduce the host area_resize
    (torch adaptive-average-pool semantics) of the explicit crop exactly —
    the reference DINO chain's Resized default."""
    from headct_foundation_tpu.data.transforms import area_resize

    rng = np.random.RandomState(0)
    x_np = rng.rand(2, 3, 20, 20, 20).astype(np.float32)
    # integer boxes fully inside the volume
    starts = np.array([[2, 0, 5], [1, 3, 0]], dtype=np.float32)
    sizes = np.array([[13, 17, 11], [18, 10, 19]], dtype=np.float32)
    out = np.asarray(
        crop_and_resize(
            jnp.asarray(x_np), jnp.asarray(starts), jnp.asarray(sizes),
            (6, 6, 6), mode="area",
        )
    )
    for b in range(2):
        s = starts[b].astype(int)
        L = sizes[b].astype(int)
        crop = x_np[b, :, s[0]:s[0]+L[0], s[1]:s[1]+L[1], s[2]:s[2]+L[2]]
        expected = area_resize(crop, (6, 6, 6))
        np.testing.assert_allclose(out[b], expected, atol=1e-5, rtol=1e-5)


def test_crop_and_resize_area_zero_padding():
    """Out-of-volume cells contribute zeros (the padded-canvas semantics)."""
    x = jnp.ones((1, 1, 8, 8, 8))
    # box half outside: start -4, size 8 -> half the cells read zeros
    out = np.asarray(
        crop_and_resize(
            x, jnp.full((1, 3), -4.0), jnp.full((1, 3), 8.0), (2, 2, 2),
            mode="area",
        )
    )
    # first output cell averages cells [-4, 0) -> all zero
    assert out[0, 0, 0, 0, 0] == 0.0
    # last output cell averages cells [0, 4) -> all ones
    np.testing.assert_allclose(out[0, 0, 1, 1, 1], 1.0)
