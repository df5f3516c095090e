"""On-device (TPU) preprocessing for feature extraction.

The reference's feature-extraction chain spends its time in the host-side
1 mm cubic-spline resample (MONAI Spacingd, reference:
src/data/transforms.py:153-158) — seconds per scan on one CPU core. Here the
whole voxel-touching pipeline runs on the TPU as dense matmuls:

  host:   NIfTI decode -> RAS orient                       (cheap memcpy ops)
  device: cubic resample to 1 mm   = 3 per-axis matmuls    (MXU)
  device: foreground bbox + 'area' crop-resize operators   (argmax + iota)
  device: crop + 'area' resize to ROI = 3 per-axis matmuls (MXU, gather-free:
          the crop is folded into the resize operator, same trick as the
          DINO multi-crop in data/augment.py)
  device: HU window stack          (elementwise, fused by XLA)

Everything after the decode is ONE jitted dispatch (``_fused_preprocess``)
with zero mid-scan host round trips — on a remote-attached chip the old
flags-to-host bbox path cost 3 D2H RTTs + a second dispatch per scan, which
dominated the per-scan latency.

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


def _device_area_ops(out: jax.Array, n_reals, roi):
    """On-device foreground bbox + 'area' crop-resize operators.

    Replicates ``area_axis_operator`` (same integer cell arithmetic) with the
    bounds computed from the volume ON DEVICE, so the whole preprocess is a
    single dispatch with no host round trip: the old flags->host->operator
    path cost 3 small D2H fetches (3 tunnel RTTs) + a second dispatch per
    scan — the dominant per-scan latency on a remote-attached chip.

    Bbox semantics match ``MONAI CropForeground`` defaults exactly
    (select_fn x > 0, margin 0; empty foreground -> full axis [0, n_real)).

    ``n_reals`` (the un-padded resampled lengths) is a TRACED int32 [3]
    operand, not a static: real datasets have continuously varying scan
    geometries, and only the 128-bucketed shapes may enter the jit
    signature or every scan would recompile."""
    fg = out > 0
    ops = []
    for axis in range(3):
        n_real, n_out = n_reals[axis], int(roi[axis])
        reduce_axes = tuple(i for i in range(3) if i != axis)
        f = jnp.any(fg, axis=reduce_axes)  # [n_pad] incl. inert zero padding
        n_pad = f.shape[0]
        f = jnp.logical_and(f, jnp.arange(n_pad) < n_real)
        any_f = jnp.any(f)
        start = jnp.where(any_f, jnp.argmax(f), 0).astype(jnp.int32)
        last = (n_pad - 1 - jnp.argmax(f[::-1])).astype(jnp.int32)
        end = jnp.where(any_f, last + 1, n_real)
        length = end - start
        i = jnp.arange(n_out, dtype=jnp.int32)[:, None]   # out cells
        j = jnp.arange(n_pad, dtype=jnp.int32)[None, :]   # in cells
        s_i = (i * length) // n_out                        # floor(i*L/O)
        e_i = -((-(i + 1) * length) // n_out)              # ceil((i+1)*L/O)
        w = ((j >= start + s_i) & (j < start + e_i)).astype(jnp.float32)
        ops.append(w / (e_i - s_i).astype(jnp.float32))
    return ops


@functools.partial(jax.jit, static_argnums=(5, 6, 7))
def _fused_preprocess(vol, mh, mw, md, n_reals, roi, in_channels, order):
    """Padded raw [H, W, D] -> windowed [C, *roi] in ONE dispatch:

      cubic resample (3 per-axis matmuls) -> on-device foreground bbox ->
      on-device 'area' crop+resize operators -> HU window stack

    ``order`` picks where the window stack sits: 'notebook' windows AFTER
    the resize (feature extraction, SURVEY.md §3.4), 'training' windows
    BEFORE it (reference loading_transforms, src/data/transforms.py:159-170).
    """
    vol = vol.astype(jnp.float32)
    out = jnp.einsum("ah,hwd->awd", mh, vol)
    out = jnp.einsum("bw,awd->abd", mw, out)
    out = jnp.einsum("cd,abd->abc", md, out)
    ah, aw, ad = _device_area_ops(out, n_reals, roi)
    if order == "hu16":
        # raw-HU resize, NO window (the hu16 wire format windows on device
        # at train time); caller encodes to int16 fixed point
        r = jnp.einsum("ah,hwd->awd", ah, out)
        r = jnp.einsum("bw,awd->abd", aw, r)
        return jnp.einsum("cd,abd->abc", ad, r)[None]
    lows, highs = _window_params(in_channels)
    lo = jnp.asarray(lows)[:, None, None, None]
    hi = jnp.asarray(highs)[:, None, None, None]
    if order == "training":
        ch = jnp.clip((out[None] - lo) / (hi - lo), 0.0, 1.0)
        r = jnp.einsum("ah,chwd->cawd", ah, ch)
        r = jnp.einsum("bw,cawd->cabd", aw, r)
        return jnp.einsum("ed,cabd->cabe", ad, r)
    r = jnp.einsum("ah,hwd->awd", ah, out)
    r = jnp.einsum("bw,awd->abd", aw, r)
    r = jnp.einsum("cd,abd->abc", ad, r)
    return jnp.clip((r[None] - lo) / (hi - lo), 0.0, 1.0)


def device_hu16_window(batch: jax.Array, in_channels: int) -> jax.Array:
    """hu16 wire batches -> windowed channel stacks, on device.

    [B, 1, H, W, D] int16 fixed-point HU (data/transforms.py hu16_encode)
    -> [B, C, H, W, D] float32 in [0, 1]. Pointwise; XLA fuses it into the
    consumer (the patch-embed matmul's input fusion), so expanding the
    3-window stack on device costs no extra HBM pass while the wire carries
    3x fewer bytes. Matches transforms.window_stack math exactly
    (window contract: reference src/data/transforms.py:8-36)."""
    from headct_foundation_tpu.data.transforms import HU16_SCALE

    assert batch.ndim == 5 and batch.shape[1] == 1, batch.shape
    lows, highs = _window_params(in_channels)
    lo = jnp.asarray(lows)[None, :, None, None, None]
    hi = jnp.asarray(highs)[None, :, None, None, None]
    hu = batch.astype(jnp.float32) * jnp.float32(1.0 / HU16_SCALE)
    return jnp.clip((hu - lo) / (hi - lo), 0.0, 1.0)


def device_hu8_window(batch: jax.Array, in_channels: int) -> jax.Array:
    """hu8 wire batches -> windowed channel stacks, on device.

    [B, 1, H, W, D] uint8 companded HU codes (transforms.hu8_encode) ->
    [B, C, H, W, D] float32 in [0, 1]. One 256-entry gather (VMEM-resident
    table) + the same pointwise window math as device_hu16_window; XLA fuses
    both into the consumer. Matches transforms.hu8_window_stack exactly."""
    from headct_foundation_tpu.data.transforms import HU8_TABLE

    assert batch.ndim == 5 and batch.shape[1] == 1, batch.shape
    lows, highs = _window_params(in_channels)
    lo = jnp.asarray(lows)[None, :, None, None, None]
    hi = jnp.asarray(highs)[None, :, None, None, None]
    hu = jnp.take(jnp.asarray(HU8_TABLE), batch.astype(jnp.int32))
    return jnp.clip((hu - lo) / (hi - lo), 0.0, 1.0)


def wire_to_compute(batch: jax.Array, config, in_channels: int,
                    dtype=jnp.bfloat16) -> jax.Array:
    """Jit-traceable entry cast shared by the engines' train/eval steps:
    wire-format batch -> [B, C, ...] compute-dtype volumes. 'windowed'
    batches (fp16 off the disk cache) just cast; 'hu16' batches expand the
    window stack on device FIRST — windowing must precede the per-step
    intensity augmentations, which the reference applies to windowed
    volumes (src/data/transforms.py:193-239)."""
    wire = (str(getattr(config.DATA, "WIRE_FORMAT", "windowed"))
            if config is not None else "windowed")
    if wire == "hu16":
        return device_hu16_window(batch, in_channels).astype(dtype)
    if wire == "hu8":
        return device_hu8_window(batch, in_channels).astype(dtype)
    return batch.astype(dtype)


def _window_params(in_channels: int) -> Tuple[np.ndarray, np.ndarray]:
    if in_channels == 1:
        lows, highs = [WINDOW_1CH[0]], [WINDOW_1CH[1]]
    elif in_channels == 3:
        lows = [c - w // 2 for c, w in WINDOW_SIZES_3CH]
        highs = [c + w // 2 for c, w in WINDOW_SIZES_3CH]
    else:
        raise NotImplementedError(f"Channel size {in_channels} is not implemented.")
    return np.asarray(lows, np.float32), np.asarray(highs, np.float32)


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
        assert order in ("notebook", "training", "hu16"), order
        self.roi = tuple(int(r) for r in roi)
        self.in_channels = in_channels
        self.order = order
        # device-RESIDENT operator cache: scans from the same scanner share
        # (shape, spacing), so without this every scan re-ships ~0.6-1 MB of
        # operator matrices (3 H2D dispatches + their RTTs on a
        # remote-attached chip). Keyed per padded bucket; each entry is a few
        # hundred KB of HBM, capped FIFO.
        self._dev_ops: dict = {}
        self._DEV_OPS_CAP = 96

    def _dev_op(self, n: int, zoom: float, identity: bool,
                ob: int, ib: int):
        key = (n, None if identity else round(zoom, 9), ob, ib)
        op = self._dev_ops.get(key)
        if op is None:
            m = (np.eye(n, dtype=np.float32) if identity
                 else cubic_axis_operator(n, zoom))
            op = jax.device_put(jnp.asarray(_pad_op(m, ob, ib)))
            if len(self._dev_ops) >= self._DEV_OPS_CAP:
                self._dev_ops.pop(next(iter(self._dev_ops)))
            self._dev_ops[key] = op
        return op

    def _ship(self, data: np.ndarray, vox: np.ndarray):
        """Host side of the pipeline: cubic operators (device-cached) + the
        one H2D transfer. Returns (padded device volume, padded operators,
        real resampled lengths)."""
        H, W, D = data.shape
        zooms = [float(v) for v in vox]
        identity = bool(np.allclose(zooms, 1.0, atol=1e-3))  # scipy skip
        if identity:
            outs = [H, W, D]
        else:
            outs = [cubic_axis_operator(n, z).shape[0]
                    for n, z in zip((H, W, D), zooms)]
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
            self._dev_op(n, z, identity, ob, ib)
            for n, z, ob, ib in zip((H, W, D), zooms, out_b, in_b)
        )
        return padded, (mh, mw, md), outs

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
        padded, (mh, mw, md), outs = self._ship(data, vox)
        return _fused_preprocess(
            padded, mh, mw, md, np.asarray(outs, np.int32), self.roi,
            self.in_channels, self.order,
        )
