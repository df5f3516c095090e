"""Device-side (jit-friendly) data augmentation.

The reference augments per item on CPU dataloader workers with MONAI
transforms (reference: src/data/transforms.py:39-105, 181-320); that CPU work
is its DINO hot-loop bottleneck (SURVEY.md §3.2). Here augmentation is
batched jax running on the TPU inside (or alongside) the jitted step:

* ``mae_augment`` — RandFlip x3 axes (p=0.1) + RandShiftIntensity 0.1 (p=0.5)
  (+ RandGaussianSmooth p=0.2 when ``reshape=False``), matching
  ``mae3d_transforms`` (reference: src/data/transforms.py:181-255).
* ``vit_augment`` — same flips/shift for downstream training
  (reference: src/data/transforms.py:258-320).
* ``dino_multicrop`` — the DataAugmentationDINO3D pipeline (reference:
  src/data/transforms.py:39-105): each 96^3 volume is conceptually embedded
  centered in a 224^3 zero canvas; global crops sample a random box of side
  U[112, 224] per axis, local crops U[64, 112] inside the center-192 region;
  every crop is resized to 96^3. Crop + resize are FUSED into one batched
  per-axis-matmul resample — sizes become traced scalars, so there are no
  dynamic shapes (XLA-friendly), and the zero canvas is never materialized
  (out-of-volume samples read as 0). Default mode='area' samples integer
  boxes and uses exact MONAI/torch adaptive-average weights (the
  reference's Resized default — bit-matched per crop); mode='linear' keeps
  a continuous-box trilinear variant.

All randomness is explicit (PRNG keys), per-sample decorrelated.
Volumes are [B, C, H, W, D] float arrays in [0, 1].
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

CANVAS = 224  # DINO pad/crop canvas (reference: transforms.py:73)
LOCAL_CANVAS = 192  # center crop for local crops (reference: transforms.py:94)


# ---------------------------------------------------------------------------
# Elementwise augmentations
# ---------------------------------------------------------------------------

def rand_flip(rng: jax.Array, x: jnp.ndarray, prob: float, axis: int) -> jnp.ndarray:
    """Per-sample random flip along one spatial axis (1-indexed after C)."""
    B = x.shape[0]
    do = jax.random.bernoulli(rng, prob, (B,) + (1,) * (x.ndim - 1))
    return jnp.where(do, jnp.flip(x, axis=axis + 1), x)


def rand_shift_intensity(
    rng: jax.Array, x: jnp.ndarray, offsets: float, prob: float
) -> jnp.ndarray:
    """Per-sample additive intensity shift ~ U(-offsets, offsets), applied w.p. prob."""
    B = x.shape[0]
    k1, k2 = jax.random.split(rng)
    shift = jax.random.uniform(
        k1, (B,) + (1,) * (x.ndim - 1), minval=-offsets, maxval=offsets
    )
    do = jax.random.bernoulli(k2, prob, (B,) + (1,) * (x.ndim - 1))
    return jnp.where(do, x + shift.astype(x.dtype), x)


def _gaussian_kernel(sigma: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Normalized 1D Gaussian taps for a traced sigma (static radius)."""
    t = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * jnp.square(t / jnp.maximum(sigma, 1e-3)))
    return k / jnp.sum(k)


def _blur_axis(v: jnp.ndarray, kernel: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Separable 1D convolution of a single sample [C, H, W, D] along axis."""
    moved = jnp.moveaxis(v, axis, -1)
    shape = moved.shape
    flat = moved.reshape(-1, 1, shape[-1])  # [N=C*rest, 1, L]
    out = jax.lax.conv_general_dilated(
        flat,
        kernel[None, None, :].astype(flat.dtype),
        window_strides=(1,),
        padding="SAME",
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=1,
    )
    return jnp.moveaxis(out.reshape(shape), -1, axis)


def rand_gaussian_smooth(
    rng: jax.Array,
    x: jnp.ndarray,
    sigma_range: Tuple[float, float] = (0.5, 1.0),
    prob: float = 0.2,
    radius: int = 4,
) -> jnp.ndarray:
    """Per-sample Gaussian blur with per-axis sigma ~ U(sigma_range), w.p. prob."""
    B = x.shape[0]
    k_sig, k_do = jax.random.split(rng)
    sigmas = jax.random.uniform(
        k_sig, (B, 3), minval=sigma_range[0], maxval=sigma_range[1]
    )
    do = jax.random.bernoulli(k_do, prob, (B,))

    def _one(v, sig, d):
        out = v
        for ax in range(3):
            out = _blur_axis(out, _gaussian_kernel(sig[ax], radius), axis=1 + ax)
        return jnp.where(d, out, v)

    return jax.vmap(_one)(x, sigmas, do)


def rand_adjust_contrast(
    rng: jax.Array, x: jnp.ndarray, gamma_range: Tuple[float, float] = (0.2, 1.0),
    prob: float = 0.2,
) -> jnp.ndarray:
    """MONAI RandAdjustContrast: gamma correction on the per-sample intensity
    range: ((x - min) / range) ** gamma * range + min, applied w.p. prob."""
    B = x.shape[0]
    k_g, k_do = jax.random.split(rng)
    gamma = jax.random.uniform(
        k_g, (B,) + (1,) * (x.ndim - 1), minval=gamma_range[0], maxval=gamma_range[1]
    )
    do = jax.random.bernoulli(k_do, prob, (B,) + (1,) * (x.ndim - 1))
    reduce_axes = tuple(range(1, x.ndim))
    mn = jnp.min(x, axis=reduce_axes, keepdims=True)
    mx = jnp.max(x, axis=reduce_axes, keepdims=True)
    rng_ = jnp.maximum(mx - mn, 1e-7)
    adj = jnp.power(jnp.clip((x - mn) / rng_, 1e-7, 1.0), gamma) * rng_ + mn
    return jnp.where(do, adj.astype(x.dtype), x)


# ---------------------------------------------------------------------------
# Fused crop + resize (continuous box, trilinear, zero padding)
# ---------------------------------------------------------------------------

def crop_and_resize(
    x: jnp.ndarray,
    start: jnp.ndarray,
    size: jnp.ndarray,
    out_shape: Sequence[int],
    mode: str = "linear",
) -> jnp.ndarray:
    """Trilinearly resample a per-sample box to a fixed output shape.

    Args:
      x: [B, C, H, W, D] volumes.
      start: [B, 3] box start in voxel coordinates (may be negative — reads
        outside the volume return 0, emulating the zero padding canvas).
      size: [B, 3] box size in voxels (traced floats; no dynamic shapes).
      out_shape: static output spatial shape.

    Half-pixel-centers convention (torch align_corners=False):
      in_coord = start + (i + 0.5) * size / out - 0.5

    TPU-native formulation: trilinear resampling is separable, so instead of
    8-corner gathers (slow scalar gathers on TPU) each axis is resampled by a
    batched matmul against a per-sample interpolation-weight matrix
    W[b, o, i] = clip(1 - |coord(b, o) - i|, 0, 1) — the linear hat kernel,
    which is also exactly zero outside the volume (the zero-padding canvas).
    Three einsums ride the MXU; no gathers anywhere.

    ``mode``:
      * ``"area"`` — EXACT MONAI/torch semantics for integer boxes:
        ``Resized`` defaults to 'area' (adaptive average pooling) in the
        reference's DINO crop chain (reference: src/data/transforms.py:75-99).
        Output cell o of a length-L crop averages input cells
        [floor(o*L/O), ceil((o+1)*L/O)) uniformly — reproduced here as
        per-sample indicator/count weight matrices. With integer (start,
        size) this is bitwise the reference pipeline (modulo fp summation
        order); out-of-volume cells carry weight but read 0, identical to
        the zero-padded canvas.
      * ``"linear"`` — trilinear hat kernel (continuous boxes supported);
        a slightly narrower low-pass than area averaging for downsampling
        boxes.
    """
    assert mode in ("linear", "area"), mode
    out_shape = tuple(out_shape)
    in_shape = x.shape[2:]

    def _axis_weights(ax: int) -> jnp.ndarray:
        o = out_shape[ax]
        i_idx = jnp.arange(in_shape[ax], dtype=jnp.float32)
        o_idx = jnp.arange(o, dtype=jnp.float32)
        if mode == "area":
            L = size[:, ax, None]                        # [B, 1]
            s_idx = jnp.floor(o_idx[None, :] * L / o)    # [B, out]
            e_idx = jnp.ceil((o_idx[None, :] + 1.0) * L / o)
            abs_s = start[:, ax, None] + s_idx
            abs_e = start[:, ax, None] + e_idx
            inside = (
                (i_idx[None, None, :] >= abs_s[:, :, None])
                & (i_idx[None, None, :] < abs_e[:, :, None])
            )
            count = jnp.maximum(e_idx - s_idx, 1.0)[:, :, None]
            return (inside / count).astype(x.dtype)
        # [B, out] fractional source coordinates
        c = start[:, ax, None] + (o_idx[None, :] + 0.5) * (
            size[:, ax, None] / o
        ) - 0.5
        # [B, out, in] hat-kernel weights
        return jnp.clip(
            1.0 - jnp.abs(c[:, :, None] - i_idx[None, None, :]), 0.0, 1.0
        ).astype(x.dtype)

    w0, w1, w2 = _axis_weights(0), _axis_weights(1), _axis_weights(2)
    out = jnp.einsum("boi,bcijk->bcojk", w0, x)
    out = jnp.einsum("boj,bcijk->bciok", w1, out)
    out = jnp.einsum("bok,bcijk->bcijo", w2, out)
    return out


def _rand_box(
    rng: jax.Array,
    batch: int,
    min_size: float,
    max_size: float,
    canvas_lo: float,
    canvas_hi: float,
    integer: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample per-sample, per-axis box (start, size) with size ~ U[min, max]
    and position uniform over valid placements in [canvas_lo, canvas_hi).

    ``integer=True`` matches MONAI RandSpatialCrop exactly: size uniform over
    the INTEGERS [min, max] (inclusive) and start uniform over the integer
    placements."""
    k_size, k_pos = jax.random.split(rng)
    if integer:
        size = jax.random.randint(
            k_size, (batch, 3), int(min_size), int(max_size) + 1
        ).astype(jnp.float32)
        u = jax.random.uniform(k_pos, (batch, 3))
        n_pos = (canvas_hi - canvas_lo) - size + 1.0  # valid integer starts
        start = canvas_lo + jnp.floor(u * n_pos)
        return start, size
    size = jax.random.uniform(k_size, (batch, 3), minval=min_size, maxval=max_size)
    u = jax.random.uniform(k_pos, (batch, 3))
    start = canvas_lo + u * ((canvas_hi - canvas_lo) - size)
    return start, size


# ---------------------------------------------------------------------------
# Pipelines
# ---------------------------------------------------------------------------

def mae_augment(
    rng: jax.Array, x: jnp.ndarray, reshape: bool = True
) -> jnp.ndarray:
    """Train-time MAE augmentation (reference: transforms.py:193-239)."""
    keys = jax.random.split(rng, 5)
    x = rand_flip(keys[0], x, 0.1, axis=1)
    x = rand_flip(keys[1], x, 0.1, axis=2)
    x = rand_flip(keys[2], x, 0.1, axis=3)
    x = rand_shift_intensity(keys[3], x, 0.1, 0.5)
    if not reshape:
        x = rand_gaussian_smooth(keys[4], x, (0.5, 1.0), 0.2)
    return x


vit_augment = functools.partial(mae_augment, reshape=True)


def _dino_flip_and_noise(rng: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
    """flips p=0.2 x3 + shift 0.2 p=0.5 (reference: transforms.py:58-63)."""
    keys = jax.random.split(rng, 4)
    x = rand_flip(keys[0], x, 0.2, axis=1)
    x = rand_flip(keys[1], x, 0.2, axis=2)
    x = rand_flip(keys[2], x, 0.2, axis=3)
    x = rand_shift_intensity(keys[3], x, 0.2, 0.5)
    return x


def dino_multicrop(
    rng: jax.Array,
    x: jnp.ndarray,
    final_size: Sequence[int] = (96, 96, 96),
    global_crop_size: int = 112,
    local_crop_size: int = 64,
    local_crops_number: int = 2,
    mode: str = "area",
) -> List[jnp.ndarray]:
    """2 global + N local crops per volume, each resized to ``final_size``.

    The input [B, C, R, R, R] volume sits conceptually centered in a
    CANVAS^3 zero canvas; box coordinates are sampled in canvas space and
    shifted into volume space (offset (CANVAS - R) / 2), with out-of-volume
    reads returning 0 — numerically identical to materializing the padded
    canvas (reference: transforms.py:71-99) at a fraction of the bandwidth.

    The default ``mode="area"`` samples INTEGER boxes (MONAI RandSpatialCrop
    semantics) and resizes with exact adaptive-average 'area' weights — the
    reference pipeline's interpolation, bit-matched per crop.
    ``mode="linear"`` keeps the continuous-box trilinear variant.
    """
    B = x.shape[0]
    R = x.shape[-1]
    integer = mode == "area"
    offset = (CANVAS - R) // 2 if integer else (CANVAS - R) / 2.0
    crops: List[jnp.ndarray] = []
    keys = jax.random.split(rng, 2 + local_crops_number)

    # global crops: size U[global_crop_size, CANVAS], anywhere on the canvas
    for gi in range(2):
        k_box, k_aug, k_extra = jax.random.split(keys[gi], 3)
        start, size = _rand_box(
            k_box, B, global_crop_size, CANVAS, 0.0, CANVAS, integer=integer
        )
        crop = crop_and_resize(x, start - offset, size, final_size, mode=mode)
        crop = _dino_flip_and_noise(k_aug, crop)
        if gi == 0:
            crop = rand_gaussian_smooth(k_extra, crop, (0.5, 1.0), 0.2)
        else:
            crop = rand_adjust_contrast(k_extra, crop, (0.2, 1.0), 0.2)
        crops.append(crop)

    # local crops: inside the center LOCAL_CANVAS region, size U[local, global]
    lo = (CANVAS - LOCAL_CANVAS) // 2 if integer else (CANVAS - LOCAL_CANVAS) / 2.0
    for li in range(local_crops_number):
        k_box, _ = jax.random.split(keys[2 + li])
        start, size = _rand_box(
            k_box, B, local_crop_size, global_crop_size, lo, lo + LOCAL_CANVAS,
            integer=integer,
        )
        crops.append(
            crop_and_resize(x, start - offset, size, final_size, mode=mode)
        )

    return crops
