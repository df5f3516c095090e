"""EXPERIMENT (negative result — NOT on the production path).

Token-major (transpose-free) whole-sequence VMEM attention. Measured on the
real chip (tools/bench_tm_attention.py, 2026-08-19), bit-identical numerics
at every shape, and a consistent LOSS vs the production [B*H, T, D] kernels:
0.89x at MAE-encoder T=129, 0.89x at DINO-student T=517 (9.86 -> 11.08 ms
fwd+bwd), 0.88x at ViT-96 T=513. The whole-slab backward cannot compile at
T>=513 (Mosaic stack-allocates each dot_general result before any scratch
copy and does not reuse slots across the unrolled head loop: H x [T, T]
temporaries = 21.4-24.8 MB vs the 16 MB/core budget); the shipped
head-group-split backward grid (lane blocks at 128-multiples, see
_head_split) fits VMEM for D=64 shapes and produced the T>=513 numbers.
The MAE decoder (H=16, D=48) fits no split: (16/S)*48 % 128 == 0 only for
S<=2, whose stack estimate exceeds budget.

Conclusion (4th layout experiment to reach it, and the decisive one): the
~8% "data formatting" step-profile share around attention (HLO copy.633/
636/561 — qkv-output relayout + BTHD<->[B*H,T,D] copies) is NOT recoverable
by ingesting the model layout directly — head panels at odd 64-lane offsets
cost an in-VMEM Mosaic relayout per access that exceeds the HBM copies it
replaces. Do not retry layout-motivated attention kernels on this model
family; D=128-head models would be the only candidate.

The production VMEM kernels in ops/flash_attention.py take [B*H, T, D]
operands, so every call pays 3 forward + 5 backward full-tensor HBM
transpose copies ([B, T, H, D] <-> [B*H, T, D] via swapaxes) — the
"data formatting" share of the step profile (tools/op_profile.py: 18.4% of
the MAE B=32 step together with patchify). These kernels instead consume the
model's native token-major layout directly: operands are reshaped (FREE —
the reshape merges the two contiguous trailing dims) to [B, T, H*D], the
grid is one program per batch element, and each program statically loops
over heads, slicing [T, D] head panels out of the resident [T, H*D] VMEM
slab. Head panels at odd offsets cost an in-VMEM relayout, which replaces
an HBM round trip — VMEM bandwidth is an order of magnitude above HBM.

Same math as the [B*H, T, D] kernels: exact-T slabs (no padding — Mosaic
accepts block dims equal to the array dim), operand-dtype MXU dots with f32
accumulation, f32 softmax, backward recomputes P = exp(s*QK^T - lse) from
(q, k, lse) instead of storing probabilities (reference contract:
torch F.scaled_dot_product_attention, src/models/attentionblock.py:61).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _tm_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, nheads):
    # refs: q/k/v/o [1, T, H*D]; lse [1, H, T] f32. One batch element per
    # program; static loop over heads, each head a [T, D] lane panel.
    hd = q_ref.shape[2]
    d = hd // nheads
    for h in range(nheads):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale                                      # [T, T] f32
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / jnp.maximum(l, 1e-30)
        # direct panel store (vs list+concat: keeps peak VMEM ~2 slabs lower)
        o_ref[0, :, sl] = o.astype(o_ref.dtype)
        lse_ref[0, h] = (m + jnp.log(jnp.maximum(l, 1e-30)))[:, 0]


def _tm_bwd_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
                   dq_ref, dk_ref, dv_ref, s_scr, p_scr, pl_scr,
                   *, scale, nheads):
    # ALL per-head [T, T] temporaries are routed through explicit VMEM
    # scratch refs (f32 s/dp share s_scr, f32 p in p_scr, and the low-
    # precision operand casts of p and dS share pl_scr): Mosaic's stack
    # allocator does not reuse stack slots across the unrolled head loop,
    # so any [T, T] value left to the stack multiplies by nheads and blows
    # the ~16 MB/core VMEM budget at the decoder shape (measured: 22.4 MB
    # stack without scratch, 21.4 MB with f32-only scratch; T=513, H=16).
    hd = q_ref.shape[2]
    d = hd // nheads
    for h in range(nheads):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        o = o_ref[0, :, sl].astype(jnp.float32)
        do = do_ref[0, :, sl]
        do_f32 = do.astype(jnp.float32)
        lse = lse_ref[0, h][:, None]

        s_scr[...] = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        p_scr[...] = jnp.exp(s_scr[...] - lse)          # [T, T] f32
        pl_scr[...] = p_scr[...].astype(pl_scr.dtype)
        dv = jax.lax.dot_general(
            pl_scr[...], do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # P^T dO
        dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)
        s_scr[...] = jax.lax.dot_general(               # dp reuses s's buffer
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # dO V^T
        delta = jnp.sum(do_f32 * o, axis=1, keepdims=True)
        pl_scr[...] = (p_scr[...] * (s_scr[...] - delta)).astype(pl_scr.dtype)
        dq = scale * jax.lax.dot_general(
            pl_scr[...], k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk = scale * jax.lax.dot_general(
            pl_scr[...], q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # dS^T Q
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention_tm(q, k, v, scale=None):
    """Differentiable fused attention, token-major ingestion.

    Same contract as flash_attention.fused_attention ([B, T, H, D] in/out,
    T <= VMEM_PATH_MAX_T) but without the [B*H, T, D] HBM transposes.
    """
    o, _ = _tm_fwd_impl(q, k, v, scale)
    return o


def _tm_fwd_impl(q, k, v, scale):
    B, T, H, D = q.shape
    s = float(D) ** -0.5 if scale is None else scale
    qf = q.reshape(B, T, H * D)   # free: trailing dims are contiguous
    kf = k.reshape(B, T, H * D)
    vf = v.reshape(B, T, H * D)
    spec = pl.BlockSpec((1, T, H * D), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, H, T), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    o, lse = pl.pallas_call(
        functools.partial(_tm_fwd_kernel, scale=s, nheads=H),
        grid=(B,),
        in_specs=[spec, spec, spec],
        out_specs=(spec, lse_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, H * D), q.dtype),
            jax.ShapeDtypeStruct((B, H, T), jnp.float32),
        ),
        interpret=jax.default_backend() == "cpu",
    )(qf, kf, vf)
    return o.reshape(B, T, H, D), (qf, kf, vf, o, lse)


def _tm_fwd(q, k, v, scale):
    out, res = _tm_fwd_impl(q, k, v, scale)
    return out, (res, (out.shape[2], out.shape[3]))


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _head_split(T: int, H: int, D: int) -> int:
    """Smallest S (largest head group) splitting the H heads into S
    lane-blocked backward programs per batch element such that the per-
    program VMEM footprint fits. The lane block (H//S)*D must be a multiple
    of 128 (Mosaic lane-dim blocking rule); the stack estimate charges the
    two bf16 [T, T] operand casts per unrolled head (Mosaic does not reuse
    stack slots across the unrolled loop) plus the f32 scratch and the 9
    blocked refs, all at (8/16, 128)-tile-rounded sizes."""
    budget = 13 * 1024 * 1024
    t_f32 = _round_up(T, 8) * _round_up(T, 128) * 4
    t_bf16 = _round_up(T, 16) * _round_up(T, 128) * 2
    for s_split in range(1, H + 1):
        if H % s_split:
            continue
        hs = H // s_split
        if (hs * D) % 128:
            continue
        refs = 9 * _round_up(T, 8) * hs * D * 2
        need = refs + 2 * t_f32 + hs * 2 * t_bf16
        if need <= budget:
            return s_split
    raise ValueError(f"no head split fits VMEM for T={T} H={H} D={D}")


def _tm_bwd(scale, residuals, g):
    (qf, kf, vf, o, lse), (H, D) = residuals
    B, T, HD = qf.shape
    s = float(D) ** -0.5 if scale is None else scale
    gf = g.reshape(B, T, HD)
    # Head-group-split grid: (B*S,) programs, program i handles batch i//S,
    # heads [(i%S)*H/S, ...). Lane blocks at 128-multiples slice for free;
    # within a program the unrolled head loop runs over H//S heads.
    S = _head_split(T, H, D)
    Hs = H // S
    spec = pl.BlockSpec((1, T, Hs * D), lambda i: (i // S, 0, i % S),
                        memory_space=pltpu.VMEM)
    # lse reshaped [B, H, T] -> [B*S, Hs, T] (free: leading-dim split) so
    # the block's sublane dim equals the array dim (Mosaic blocking rule).
    lse = lse.reshape(B * S, Hs, T)
    lse_spec = pl.BlockSpec((1, Hs, T), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_tm_bwd_kernel, scale=s, nheads=Hs),
        grid=(B * S,),
        in_specs=[spec, spec, spec, spec, spec, lse_spec],
        out_specs=(spec, spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, HD), qf.dtype),
            jax.ShapeDtypeStruct((B, T, HD), kf.dtype),
            jax.ShapeDtypeStruct((B, T, HD), vf.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((T, T), jnp.float32),
            pltpu.VMEM((T, T), jnp.float32),
            pltpu.VMEM((T, T), qf.dtype),
        ],
        interpret=jax.default_backend() == "cpu",
    )(qf, kf, vf, o, gf, lse)
    shp = (B, T, H, D)
    return dq.reshape(shp), dk.reshape(shp), dv.reshape(shp)


fused_attention_tm.defvjp(_tm_fwd, _tm_bwd)
