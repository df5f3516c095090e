"""On-device (TPU) preprocessing for feature extraction.

The reference's feature-extraction chain spends its time in the host-side
1 mm cubic-spline resample (MONAI Spacingd, reference:
src/data/transforms.py:153-158) — seconds per scan on one CPU core. Here the
whole voxel-touching pipeline runs on the TPU as dense matmuls:

  host:   NIfTI decode -> RAS orient                       (cheap memcpy ops)
  device: cubic resample to 1 mm   = 3 per-axis matmuls    (MXU)
  host:   foreground bbox          (from 3 tiny per-axis any-flags)
  device: crop + 'area' resize to ROI = 3 per-axis matmuls (MXU, gather-free:
          the crop is folded into the resize operator, same trick as the
          DINO multi-crop in data/augment.py)
  device: HU window stack          (elementwise, fused by XLA)

Numerical parity: the per-axis cubic operator is EXACT scipy parity by
construction — it is ``scipy.ndimage.zoom`` applied to an identity matrix
(resampling is linear in the input, so the zoom of eye(n) IS the operator
matrix, B-spline prefilter and boundary handling included). The 'area'
operator reproduces torch F.interpolate(mode='area') cell averaging
(data/transforms.py:_adaptive_avg_axis). Each axis operator is built once
per (length, zoom) on host (milliseconds) and cached.

Shape bucketing: scan shapes vary, and jit recompiles per shape. Volumes and
operators are zero-padded to multiples of ``BUCKET`` so distinct scans of
similar size share one compiled program; zero operator columns/rows make the
padding mathematically inert.
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from headct_foundation_tpu.data.nifti import load_nifti, orientation_ras
from headct_foundation_tpu.data.transforms import (
    WINDOW_1CH,
    WINDOW_SIZES_3CH,
)

BUCKET = 128


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@functools.lru_cache(maxsize=256)
def cubic_axis_operator(n_in: int, zoom: float) -> np.ndarray:
    """[n_out, n_in] operator == scipy.ndimage.zoom(x, zoom, order=3,
    mode='nearest', prefilter=True) along one axis. Exact by linearity:
    columns are the zoom of basis vectors."""
    eye = np.eye(n_in, dtype=np.float64)
    m = ndimage.zoom(eye, (zoom, 1.0), order=3, mode="nearest", prefilter=True)
    return np.ascontiguousarray(m, dtype=np.float32)


def area_axis_operator(n_full: int, start: int, end: int, n_out: int) -> np.ndarray:
    """[n_out, n_full] operator: crop [start, end) then 'area'-resize to n_out
    (uniform average over cells [floor(i*L/O), ceil((i+1)*L/O)))."""
    L = end - start
    m = np.zeros((n_out, n_full), dtype=np.float32)
    idx = np.arange(n_out)
    s = (idx * L) // n_out
    e = -(-((idx + 1) * L) // n_out)
    for i in range(n_out):
        m[i, start + s[i] : start + e[i]] = 1.0 / (e[i] - s[i])
    return m


def _pad_op(m: np.ndarray, rows: int, cols: int) -> np.ndarray:
    out = np.zeros((rows, cols), dtype=np.float32)
    out[: m.shape[0], : m.shape[1]] = m
    return out


def _chunked_put(arr: np.ndarray, chunk_bytes: int = 12 << 20) -> jax.Array:
    """Shared chunked transfer (data/pipeline.py); 12 MB chunks measured
    best for latency-sensitive single-scan uploads."""
    from headct_foundation_tpu.data.pipeline import chunked_device_put

    return chunked_device_put(arr, chunk_bytes)


@jax.jit
def _apply_axes(vol: jax.Array, mh: jax.Array, mw: jax.Array, md: jax.Array):
    """vol [H, W, D] -> (Mh vol Mw^T Md^T, per-axis foreground any-flags)."""
    vol = vol.astype(jnp.float32)
    out = jnp.einsum("ah,hwd->awd", mh, vol)
    out = jnp.einsum("bw,awd->abd", mw, out)
    out = jnp.einsum("cd,abd->abc", md, out)
    fg = out > 0
    return out, (jnp.any(fg, axis=(1, 2)), jnp.any(fg, axis=(0, 2)),
                 jnp.any(fg, axis=(0, 1)))


def _window_params(in_channels: int) -> Tuple[np.ndarray, np.ndarray]:
    if in_channels == 1:
        lows, highs = [WINDOW_1CH[0]], [WINDOW_1CH[1]]
    elif in_channels == 3:
        lows = [c - w // 2 for c, w in WINDOW_SIZES_3CH]
        highs = [c + w // 2 for c, w in WINDOW_SIZES_3CH]
    else:
        raise NotImplementedError(f"Channel size {in_channels} is not implemented.")
    return np.asarray(lows, np.float32), np.asarray(highs, np.float32)


@functools.partial(jax.jit, static_argnums=(4,))
def _crop_resize_window(vol, ah, aw, ad, in_channels):
    """[H', W', D'] -> windowed [C, *roi]: crop+area-resize via per-axis
    operators, then the HU window stack ((x - lo) / (hi - lo) clipped to
    [0, 1]; reference: src/data/transforms.py:8-36). Notebook order —
    resize BEFORE windowing (SURVEY.md §3.4)."""
    out = jnp.einsum("ah,hwd->awd", ah, vol)
    out = jnp.einsum("bw,awd->abd", aw, out)
    out = jnp.einsum("cd,abd->abc", ad, out)
    lows, highs = _window_params(in_channels)
    lo = jnp.asarray(lows)[:, None, None, None]
    hi = jnp.asarray(highs)[:, None, None, None]
    return jnp.clip((out[None] - lo) / (hi - lo), 0.0, 1.0)


@functools.partial(jax.jit, static_argnums=(4,))
def _window_crop_resize(vol, ah, aw, ad, in_channels):
    """Training order — window BEFORE resize (reference training chain,
    src/data/transforms.py:159-170): HU window stack on the cropped region,
    then crop+area-resize per channel via the same per-axis operators."""
    lows, highs = _window_params(in_channels)
    lo = jnp.asarray(lows)[:, None, None, None]
    hi = jnp.asarray(highs)[:, None, None, None]
    ch = jnp.clip((vol[None] - lo) / (hi - lo), 0.0, 1.0)  # [C, H', W', D']
    out = jnp.einsum("ah,chwd->cawd", ah, ch)
    out = jnp.einsum("bw,cawd->cabd", aw, out)
    out = jnp.einsum("ed,cabd->cabe", ad, out)
    return out


class DevicePreprocessor:
    """Fully on-device preprocessing. ``order`` selects the transform chain:

    * ``"notebook"`` (default): resample -> crop-foreground -> area resize
      -> window — the feature-extraction order (SURVEY.md §3.4).
    * ``"training"``: resample -> crop-foreground -> window -> area resize —
      the training ``loading_transforms`` order (reference:
      src/data/transforms.py:108-178); used by the device cache backend.

    ``__call__`` returns a device-resident [C, *roi] float32 array."""

    def __init__(self, roi: Sequence[int], in_channels: int,
                 order: str = "notebook"):
        assert order in ("notebook", "training"), order
        self.roi = tuple(int(r) for r in roi)
        self.in_channels = in_channels
        self.order = order

    def _resample(self, data: np.ndarray, vox: np.ndarray):
        H, W, D = data.shape
        zooms = [float(v) for v in vox]
        if np.allclose(zooms, 1.0, atol=1e-3):  # scipy-path skip semantics
            ops = [np.eye(n, dtype=np.float32) for n in (H, W, D)]
        else:
            ops = [cubic_axis_operator(n, z) for n, z in zip((H, W, D), zooms)]
        outs = [m.shape[0] for m in ops]
        in_b = [_round_up(n, BUCKET) for n in (H, W, D)]
        out_b = [_round_up(n, BUCKET) for n in outs]
        # Ship the RAW volume (chunked concurrent H2D — pipelines the
        # transport) and zero-pad to the bucket ON DEVICE: the padding is
        # 2-3x the real bytes and never needs to cross the wire. CT voxels
        # are integral HU in practice — when the volume is losslessly
        # representable as int16, ship half the bytes and cast on device.
        host = np.ascontiguousarray(data, dtype=np.float32)
        as_int = host.astype(np.int16)
        if np.array_equal(as_int.astype(np.float32), host):
            raw = _chunked_put(as_int).astype(jnp.float32)
        else:
            raw = _chunked_put(host)
        padded = jnp.pad(
            raw, [(0, b - n) for n, b in zip((H, W, D), in_b)]
        )
        mh, mw, md = (
            _pad_op(m, ob, ib) for m, ob, ib in zip(ops, out_b, in_b)
        )
        vol, flags = _apply_axes(
            padded, jnp.asarray(mh), jnp.asarray(mw), jnp.asarray(md)
        )
        return vol, outs, [np.asarray(f) for f in flags]

    def _bbox(self, flags, outs):
        """Foreground bbox from per-axis any-flags (MONAI CropForeground
        defaults: select_fn x > 0, margin 0)."""
        bounds = []
        for f, n in zip(flags, outs):
            f = f[:n]
            nz = np.nonzero(f)[0]
            if len(nz) == 0:
                bounds.append((0, n))
            else:
                bounds.append((int(nz[0]), int(nz[-1]) + 1))
        return bounds

    def _decode(self, path: str):
        """NIfTI decode + RAS orient: native C++ when built (GIL-free, ~2x
        the python/zlib path), python fallback otherwise."""
        import os

        if os.environ.get("HEADCT_NATIVE", "1") != "0":
            try:
                from headct_foundation_tpu.data.native_loader import (
                    decode_native,
                    native_available,
                )

                if native_available():
                    return decode_native(path)
            except Exception:
                pass  # fall through to the python decoder
        img = load_nifti(path)
        data = np.asarray(img.data, dtype=np.float32)
        if data.ndim == 4:  # drop trailing singleton (time) dim
            data = data[..., 0]
        assert data.ndim == 3, f"{path}: expected 3D volume, got {data.shape}"
        return orientation_ras(data, img.affine)

    def __call__(self, path: str) -> jax.Array:
        data, affine = self._decode(path)
        vox = np.linalg.norm(affine[:3, :3], axis=0)

        vol, outs, flags = self._resample(data, vox)
        bounds = self._bbox(flags, outs)
        ops = [
            jnp.asarray(area_axis_operator(int(vol.shape[i]), s, e, self.roi[i]))
            for i, (s, e) in enumerate(bounds)
        ]
        stage = (_window_crop_resize if self.order == "training"
                 else _crop_resize_window)
        return stage(vol, *ops, self.in_channels)
