"""Attention compute op.

Single entry point for scaled-dot-product attention so the model code is
independent of the kernel backend. The reference routes all attention through
``torch.nn.functional.scaled_dot_product_attention`` (reference:
src/models/attentionblock.py:61); here the default is XLA's fused attention
(``jax.nn.dot_product_attention``), with a Pallas flash-attention kernel
selectable for long sequences (see ops/flash_attention.py).

Sequence lengths in this workload are short (512 patch tokens + CLS +
registers), so XLA's fusion of QK^T -> softmax -> PV into MXU-friendly blocks
is already near roofline; the Pallas path exists for the high-resolution
(e.g. 192^3 -> 4096 tokens) stretch configs.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional

import jax

# "xla" | "pallas" | None (auto: pallas on TPU, xla elsewhere).
# On TPU the fused custom-VJP Pallas kernel recomputes attention
# probabilities in the backward pass instead of streaming the stored [T, T]
# residual through HBM — measured 1.45x on the full ViT-B MAE train step
# (175 ms -> 121 ms at batch 32). On CPU the Pallas path runs interpreted
# (tests only), so XLA stays the default there.
_BACKEND = None
_MESH = None


def set_attention_backend(name: Optional[str]) -> Optional[str]:
    """Set the backend ("xla" | "pallas" | None = auto). Returns the PREVIOUS
    raw value so callers that flip the backend temporarily can restore the
    exact prior state (including auto) instead of pinning a concrete one."""
    global _BACKEND
    assert name in ("xla", "pallas", None), name
    prev = _BACKEND
    _BACKEND = name
    return prev


def get_attention_backend() -> str:
    if _BACKEND is None:
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return _BACKEND


# Sequences shorter than this use XLA even under the pallas backend (the
# per-(b,h)-program kernels are launch-bound at tiny T). Configurable via
# PARALLEL.PALLAS_MIN_T (engines call set_pallas_min_t) or the
# HEADCT_PALLAS_MIN_T env var, which is read at CALL time — importing this
# module before setting the env no longer freezes the threshold.
import os as _os

_PALLAS_MIN_T: Optional[int] = None


def set_pallas_min_t(n: Optional[int]) -> Optional[int]:
    """Set the Pallas/XLA crossover sequence length (None = env/default).
    Returns the previous raw value for save/restore."""
    global _PALLAS_MIN_T
    prev = _PALLAS_MIN_T
    _PALLAS_MIN_T = None if n is None else int(n)
    return prev


def pallas_min_t() -> int:
    if _PALLAS_MIN_T is not None:
        return _PALLAS_MIN_T
    return int(_os.environ.get("HEADCT_PALLAS_MIN_T", "192"))

_CTX = threading.local()
_UNSET = object()


@contextlib.contextmanager
def attention_mesh(mesh):
    """Scope the device mesh for the Pallas attention path.

    GSPMD cannot partition a pallas_call — without a mesh, a sharded batch
    gets ALL-GATHERED around the kernel (verified in tests). With a mesh, the
    kernel is shard_map-ped: batch over ('data','fsdp'), heads over 'tensor'
    (the Megatron head split), and — when the mesh has a 'seq' axis > 1 —
    tokens over 'seq' with the KV all-gathered inside (context parallelism
    for the long-sequence configs).

    The mesh is read at TRACE time, so the engines enter this context
    *inside* their jitted step functions — every trace and retrace sees the
    mesh captured in that step's closure, regardless of what was built or
    traced in between (two meshes in one process, eval steps built after
    init traces, etc.). ``mesh=None`` explicitly selects the unsharded
    single-device path (init traces on batch-1 samples)."""
    prev = getattr(_CTX, "mesh", _UNSET)
    _CTX.mesh = mesh
    try:
        yield
    finally:
        if prev is _UNSET:
            _CTX.mesh = _UNSET
        else:
            _CTX.mesh = prev


def set_attention_mesh(mesh) -> None:
    """Process-global fallback used when no attention_mesh() scope is active
    (scripts / notebooks driving bare models). Engines use the scoped context
    manager instead."""
    global _MESH
    _MESH = mesh


def _current_mesh():
    ctx = getattr(_CTX, "mesh", _UNSET)
    return _MESH if ctx is _UNSET else ctx


def _pallas_sharded(q, k, v, scale):
    from headct_foundation_tpu.ops.flash_attention import (
        VMEM_PATH_MAX_T,
        blocked_fused_attention,
        fused_attention,
    )

    # Whole-sequence VMEM kernel for short square T; blocked streaming kernel
    # (both with custom VJPs — fully differentiable) beyond it, and for
    # rectangular (Tq != Tk) cross-attention (the VMEM path is square-only).
    if q.shape[1] == k.shape[1] and q.shape[1] <= VMEM_PATH_MAX_T:
        kernel = fused_attention
    else:
        kernel = blocked_fused_attention

    mesh = _current_mesh()
    if mesh is None or all(int(s) == 1 for s in mesh.shape.values()):
        return kernel(q, k, v, scale)

    from jax.sharding import PartitionSpec as P

    seq = int(mesh.shape.get("seq", 1))
    if seq > 1:
        # Context parallelism: tokens shard over the 'seq' axis, each device
        # runs its Q shard against the KV all-gathered over ICI inside the
        # shard_map (at ViT scales — <= tens of k tokens — gathered KV is
        # tiny, so the KV-all-gather layout beats a ring by keeping every
        # step a single large MXU-friendly kernel; AD through all_gather
        # gives the dK/dV reduce-scatter for free). Tq and Tk pad
        # independently to multiples of the axis; kv_len masks the padded
        # keys inside the kernel, and the padded Q rows are sliced off
        # (their cotangent is zero, so they contribute nothing to the
        # backward). Rectangular (Tq != Tk) inputs are supported: each
        # length pads on its own and the real Tk is what kv_len masks to.
        import jax.numpy as jnp

        B, Tq, H, D = q.shape
        Tk = k.shape[1]
        tq_pad = -(-Tq // seq) * seq
        tk_pad = -(-Tk // seq) * seq
        if tq_pad != Tq:
            q = jnp.pad(q, ((0, 0), (0, tq_pad - Tq), (0, 0), (0, 0)))
        if tk_pad != Tk:
            padw = ((0, 0), (0, tk_pad - Tk), (0, 0), (0, 0))
            k, v = jnp.pad(k, padw), jnp.pad(v, padw)
        spec = P(("data", "fsdp"), "seq", "tensor", None)

        def body(ql, kl, vl):
            kf = jax.lax.all_gather(kl, "seq", axis=1, tiled=True)
            vf = jax.lax.all_gather(vl, "seq", axis=1, tiled=True)
            return blocked_fused_attention(ql, kf, vf, scale, Tk)

        out = jax.shard_map(
            body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            check_vma=False,
        )(q, k, v)
        return out[:, :Tq] if tq_pad != Tq else out

    spec = P(("data", "fsdp"), None, "tensor", None)
    fn = jax.shard_map(
        lambda q, k, v: kernel(q, k, v, scale),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
) -> jax.Array:
    """Multi-head attention over [B, T, H, D] tensors (BTHD layout).

    Args:
      q: queries [B, Tq, H, D].
      k: keys    [B, Tk, H, D].
      v: values  [B, Tk, H, D].
      scale: softmax scale; defaults to 1/sqrt(D).

    Returns:
      [B, Tq, H, D] attention output in q.dtype.
    """
    if get_attention_backend() == "pallas" and q.shape[1] >= pallas_min_t():
        # Differentiable at any T: whole-sequence VMEM kernel for short
        # sequences, blocked streaming kernel (custom VJP, Dao alg. 4) for
        # long ones — the 192^3/4096-token stretch config trains on Pallas.
        # Below _PALLAS_MIN_T the per-(batch, head)-program kernel is
        # launch-latency bound and XLA's fused attention wins (measured:
        # 2.0 vs 2.6 ms fwd+bwd at [32, 129, 12, 64] — the MAE encoder's
        # masked sequence); the crossover is between 129 and 513.
        return _pallas_sharded(q, k, v, scale)
    return jax.nn.dot_product_attention(q, k, v, scale=scale)
