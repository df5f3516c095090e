"""Package setup (reference surface: setup.py).

Builds the native preprocessing library as an optional build step; the
package works without it (python/scipy fallback).
"""

import subprocess
from pathlib import Path

from setuptools import find_packages, setup

_HERE = Path(__file__).parent


def _try_build_native() -> None:
    src = _HERE / "native" / "headct_native.cpp"
    out = _HERE / "native" / "libheadct_native.so"
    if not src.exists():
        return
    # host-tuned first (-ffp-contract=off keeps outputs bit-equal to the
    # scipy/torch oracles), then portable; libdeflate first, zlib fallback
    for march in (["-march=native", "-ffp-contract=off"], []):
        for extra in (["-ldeflate"], ["-DHEADCT_NO_LIBDEFLATE"]):
            try:
                subprocess.run(
                    ["g++", "-O3", *march, "-shared", "-fPIC", "-std=c++17",
                     str(src), "-o", str(out), "-lz"] + extra,
                    check=True, capture_output=True, timeout=300,
                )
                return
            except Exception:
                continue  # optional: python fallback covers it


_try_build_native()

setup(
    name="headct_foundation_tpu",
    version="0.1.0",
    description=(
        "TPU-native 3D head-CT foundation-model framework "
        "(MAE/DINO pretraining, downstream classification, retrieval)"
    ),
    packages=find_packages(include=["headct_foundation_tpu*"]),
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "flax",
        "optax",
        "numpy",
        "scipy",
        "pandas",
        "pyyaml",
        "scikit-learn",
        "matplotlib",
    ],
)
