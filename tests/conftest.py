"""Test configuration: run everything on a virtual 8-device CPU mesh.

JAX's standard fake-multi-device mechanism (SURVEY.md §4): forcing the host
platform with 8 devices gives real collectives and sharding semantics without
TPU hardware. Must be set before jax initializes a backend, hence env vars at
import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize registers the remote-TPU ("axon") PJRT
# backend and force-sets jax_platforms="axon,cpu"; override it back to pure
# CPU before any backend initializes so the 8 virtual devices take effect.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert len(jax.devices()) == 8, jax.devices()
