"""ctypes bindings for the native (C++) preprocessing pipeline.

``native/headct_native.cpp`` implements the full load_and_preprocess chain
(NIfTI decode incl. gzip, RAS orient, cubic B-spline 1 mm resample,
crop-foreground, HU window stack, area resize, fp16) with no Python in the
loop — calls release the GIL, so the ThreadedLoader's worker threads get true
parallelism across scans (the reference leans on MONAI/ITK C extensions for
the same reason; SURVEY.md §2.9).

The shared library is compiled on first use (g++ -O3); if the toolchain or
zlib is unavailable the datasets fall back to the numpy/scipy pipeline
transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_LIB_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SRC = os.path.join(_NATIVE_DIR, "headct_native.cpp")
_SO = os.path.join(_NATIVE_DIR, "libheadct_native.so")


def _build() -> bool:
    # Host-tuned codegen first (-march=native; -ffp-contract=off keeps FMA
    # contraction from changing float results — outputs stay bit-equal to
    # the scipy/torch oracles), then portable flags; libdeflate fast-inflate
    # first, zlib-only fallback.
    for march in (["-march=native", "-ffp-contract=off"], []):
        for extra in (["-ldeflate"], ["-DHEADCT_NO_LIBDEFLATE"]):
            try:
                subprocess.run(
                    ["g++", "-O3", *march, "-shared", "-fPIC", "-std=c++17",
                     _SRC, "-o", _SO, "-lz"] + extra,
                    check=True,
                    capture_output=True,
                    timeout=300,
                )
                return True
            except Exception:
                continue
    return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    with _LIB_LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            if not os.path.exists(_SRC) or not _build():
                _LIB_FAILED = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.headct_preprocess_ex.restype = ctypes.c_int
            lib.headct_preprocess_ex.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint16),
                ctypes.c_char_p,
                ctypes.c_int,
            ]
            # capability probe (v4+): older prebuilt .so lacks it
            try:
                lib.headct_abi_version.restype = ctypes.c_int
                lib.headct_abi_version.argtypes = []
                lib._abi = int(lib.headct_abi_version())
            except AttributeError:
                lib._abi = 0
            # decode-only API is optional (v3+): an older prebuilt .so
            # without it must NOT disable the whole native path
            try:
                lib.headct_decode_open.restype = ctypes.c_void_p
                lib.headct_decode_open.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_int),
                    ctypes.POINTER(ctypes.c_double),
                    ctypes.c_char_p,
                    ctypes.c_int,
                ]
                lib.headct_decode_read.restype = ctypes.c_int
                lib.headct_decode_read.argtypes = [
                    ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                ]
                lib.headct_decode_close.restype = None
                lib.headct_decode_close.argtypes = [ctypes.c_void_p]
                lib._has_decode = True
            except AttributeError:
                lib._has_decode = False
            _LIB = lib
        except (OSError, AttributeError):
            _LIB_FAILED = True
    return _LIB


def native_available() -> bool:
    return get_lib() is not None


def native_supports_hu16() -> bool:
    """True when the built .so implements the hu16 wire format (ABI >= 4)."""
    lib = get_lib()
    return lib is not None and getattr(lib, "_abi", 0) >= 4


def load_and_preprocess_native(
    path: str, roi: Sequence[int], in_channels: int, order: int = 0,
    wire: str = "windowed",
) -> np.ndarray:
    """Native counterpart of transforms.load_and_preprocess.

    order 0 = training pipeline (window before resize); order 1 = the
    notebook feature-extraction pipeline (resize before window). With
    ``wire='hu16'`` the output is the 1-channel int16 fixed-point HU wire
    tensor (transforms.load_and_preprocess_hu16 parity) instead of windowed
    fp16 channels. Raises RuntimeError on decode errors (callers shield
    errors the same way as the python path).
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    r = int(roi[0])
    assert all(int(x) == r for x in roi), "native path assumes cubic ROI"
    if wire == "hu16":
        if not native_supports_hu16():
            raise RuntimeError("native library predates hu16 (rebuild)")
        channels, order = 1, 2
    else:
        channels = in_channels
    out = np.empty(channels * r * r * r, dtype=np.uint16)
    err = ctypes.create_string_buffer(256)
    rc = lib.headct_preprocess_ex(
        path.encode(),
        r,
        channels,
        order,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        err,
        len(err),
    )
    if rc != 0:
        raise RuntimeError(f"native preprocess failed for {path}: {err.value.decode()}")
    if wire == "hu16":
        return out.view(np.int16).reshape(1, r, r, r)
    return out.view(np.float16).reshape(channels, r, r, r)


def decode_native(path: str):
    """NIfTI decode + RAS orient in C++ (no resampling): returns
    (volume float32 [X, Y, Z] C-order, affine [3, 4]). Feeds the on-device
    preprocessing path. Raises RuntimeError on failure."""
    lib = get_lib()
    if lib is None or not getattr(lib, "_has_decode", False):
        raise RuntimeError("native decode unavailable")
    shape = (ctypes.c_int * 3)()
    affine = (ctypes.c_double * 12)()
    err = ctypes.create_string_buffer(256)
    h = lib.headct_decode_open(path.encode(), shape, affine, err, len(err))
    if not h:
        raise RuntimeError(f"native decode failed for {path}: {err.value.decode()}")
    try:
        vol = np.empty((shape[0], shape[1], shape[2]), dtype=np.float32)
        rc = lib.headct_decode_read(h, vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc != 0:
            raise RuntimeError(f"native decode read failed for {path}")
    finally:
        lib.headct_decode_close(h)
    return vol, np.ctypeslib.as_array(affine).reshape(3, 4).copy()
