"""Device mesh construction and sharding rules.

The reference's parallelism story is single-node DDP over NCCL (reference:
main_pretrain_mae.py:139, src/utils/misc.py:325-344). The TPU-native
equivalent is SPMD over a ``jax.sharding.Mesh``: one Python program, the batch
sharded over the 'data' (and 'fsdp') axes, parameters either replicated
(pure DP, like DDP) or sharded over 'fsdp' (ZeRO-3 style) and 'tensor'
(Megatron-style on the attention/MLP contracting dims). Gradients are averaged
by XLA-inserted reduce-scatter/all-reduce collectives over ICI — there is no
hand-written communication in the train step.

Sharding is annotation-driven (GSPMD): `param_shardings` applies rule-based
PartitionSpecs to a parameter pytree; everything not matched is replicated.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MESH_AXES = ("data", "fsdp", "seq", "pipe", "tensor")


def respect_jax_platforms_env() -> None:
    """Re-assert the JAX_PLATFORMS env var as jax config.

    Some environments register extra PJRT backends at interpreter start and
    force-set jax_platforms themselves; calling this before first device use
    restores the user's env-var choice (e.g. JAX_PLATFORMS=cpu for tests)."""
    import os

    env = os.environ.get("JAX_PLATFORMS")
    if env:
        try:
            jax.config.update("jax_platforms", env)
        except Exception:
            pass


def make_mesh(
    data: int = -1,
    fsdp: int = 1,
    tensor: int = 1,
    seq: int = 1,
    pipe: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'fsdp', 'seq', 'pipe', 'tensor') mesh over the devices.

    The 'seq' axis is context parallelism for the long-sequence (192^3+)
    configs: activations shard over tokens, and attention all-gathers KV
    over the axis inside a shard_map (ops/attention.py). The 'pipe' axis is
    GPipe-style pipeline parallelism over the transformer trunks
    (parallel/pipeline.py). seq=pipe=1 (the defaults) reproduce the previous
    layouts exactly.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data == -1:
        assert n % (fsdp * seq * pipe * tensor) == 0, (
            n, fsdp, seq, pipe, tensor,
        )
        data = n // (fsdp * seq * pipe * tensor)
    total = data * fsdp * seq * pipe * tensor
    assert total <= n, (
        f"mesh {data}x{fsdp}x{seq}x{pipe}x{tensor} needs more than {n} devices"
    )
    dev_array = np.asarray(devices[:total]).reshape(
        data, fsdp, seq, pipe, tensor
    )
    return Mesh(dev_array, MESH_AXES)


def mesh_from_config(config, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    return make_mesh(
        data=config.PARALLEL.DATA,
        fsdp=config.PARALLEL.FSDP,
        tensor=config.PARALLEL.TENSOR,
        seq=getattr(config.PARALLEL, "SEQ", 1),
        pipe=getattr(config.PARALLEL, "PIPE", 1),
        devices=devices,
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batches shard over both data and fsdp axes (fsdp also consumes batch)."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def shard_batch(arr: np.ndarray, mesh: Mesh, dtype=None):
    """Place a host batch on the mesh with the batch axis sharded, padding the
    batch to a multiple of the data x fsdp mesh size by repeating the last
    item (the same duplicate-padding DistributedSampler applies at dataset
    tails).

    Single-host: a straight device_put. Multi-host: each process contributes
    its LOCAL batch (loaders are already per-process sharded via
    distributed_indices) and the global array is assembled with
    ``jax.make_array_from_process_local_data`` — the global batch size is
    local x process_count.

    Returns (device_array, n_real_local) — consumers that aggregate
    per-sample outputs (metrics, predictions) slice back to ``n_real_local``.
    """
    arr = np.asarray(arr)
    if dtype is not None:
        arr = arr.astype(dtype)
    n = arr.shape[0]

    if jax.process_count() > 1:
        # pad the local shard to a multiple of the per-process device count
        local_devices = max(
            1, (mesh.shape["data"] * mesh.shape["fsdp"]) // jax.process_count()
        )
        rem = (-n) % local_devices
        if rem:
            arr = np.concatenate([arr, np.repeat(arr[-1:], rem, axis=0)], axis=0)
        return (
            jax.make_array_from_process_local_data(batch_sharding(mesh), arr),
            n,
        )

    divisor = mesh.shape["data"] * mesh.shape["fsdp"]
    rem = (-n) % divisor
    if rem:
        pad = np.repeat(arr[-1:], rem, axis=0)
        arr = np.concatenate([arr, pad], axis=0)
    return jax.device_put(arr, batch_sharding(mesh)), n


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Rules: (regex over 'path/to/param', PartitionSpec). First match wins.
# Tensor-parallel axes follow the Megatron pattern: column-parallel on the
# qkv/mlp-in projections, row-parallel on the output projections. The fsdp
# axis shards the remaining (non-tensor) large dimension, ZeRO-3 style.
_DEFAULT_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*attn/qkv/kernel$", P("fsdp", "tensor")),
    (r".*attn/proj/kernel$", P("tensor", "fsdp")),
    (r".*mlp/linear1/kernel$", P("fsdp", "tensor")),
    (r".*mlp/linear2/kernel$", P("tensor", "fsdp")),
    (r".*patch_embedding/kernel$", P(None, "tensor")),
    (r".*decoder_embed/kernel$", P(None, "tensor")),
    (r".*decoder_pred/kernel$", P("tensor", None)),
    (r".*last_layer/weight_v$", P("tensor", None)),  # 65536-proto DINO head
    (r".*mlp_\d+/kernel$", P(None, "tensor")),       # DINO head MLP
    (r".*position_embeddings$", P()),
    (r".*kernel$", P(None, "fsdp")),
)


def _spec_for(path: str, rules: Sequence[Tuple[str, P]]) -> P:
    for pattern, spec in rules:
        if re.match(pattern, path):
            return spec
    return P()


def _clamp_spec(spec: P, shape: Tuple[int, ...], mesh: Mesh) -> P:
    """Drop sharding on axes the tensor can't be evenly divided along."""
    if len(spec) > len(shape):
        return P()
    out = []
    for dim, axis in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if axis is None:
            out.append(None)
            continue
        size = mesh.shape[axis] if isinstance(axis, str) else int(
            np.prod([mesh.shape[a] for a in axis])
        )
        out.append(axis if dim % size == 0 and dim >= size else None)
    return P(*out)


def param_shardings(
    params: Any, mesh: Mesh, rules: Sequence[Tuple[str, P]] = _DEFAULT_RULES
) -> Any:
    """Map a parameter pytree to NamedShardings by path-based rules."""

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    shardings = []
    for path, leaf in flat:
        path_str = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )
        spec = _spec_for(path_str, rules)
        spec = _clamp_spec(spec, getattr(leaf, "shape", ()), mesh)
        shardings.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, shardings)
