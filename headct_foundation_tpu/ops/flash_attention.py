"""Pallas TPU flash attention.

Blocked online-softmax attention (Dao et al., arXiv 2205.14135) for the ViT
attention path — the TPU counterpart of the reference's
``F.scaled_dot_product_attention`` flash path (reference:
src/models/attentionblock.py:61).

Two custom-VJP kernel families, dispatched by sequence length
(ops/attention.py picks XLA below PALLAS_MIN_T=192, where per-(b,h)-program
kernels are launch-bound):

* whole-sequence VMEM path (T <= 1024): each program holds exact-T Q/K/V
  slabs and the [T, T] f32 score matrix entirely in VMEM — scores never
  touch HBM, and the backward recomputes them from (q, k, lse). This is the
  production path for the flagship 513/517-token ViT shapes (measured 1.5x
  XLA fwd+bwd there).
* blocked path (T beyond VMEM): grid (batch x heads, q-blocks); each program
  streams KV blocks with a running (max, sum, accumulator) triple, so peak
  VMEM is O(BLOCK_Q x BLOCK_K + BLOCK_Q x D) regardless of T — for the
  high-resolution stretch configs (192^3 -> 4096 tokens) where materialized
  scores would cost 64 MB per head. Sequences pad to the block size with
  additive -inf masking from in-kernel iota, so any (Tq, Tk) works,
  including the rectangular shapes of the context-parallel ('seq' axis)
  path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Block-size overrides for the blocked (long-T) path. None = T-aware auto,
# measured by tools/sweep_blocked_attention.py on v5e at the 192^3 MAE shapes:
# fwd+bwd per call (B=2): T=1025 3.01 ms @ (256,512) vs 4.04 @ (128,128);
# T=4097 9.58 ms @ (512,512) vs 27.6 @ (128,128) — 2.9x. Larger KV blocks
# amortize the online-softmax rescale and keep the MXU on 512-wide dots.
BLOCK_Q: Optional[int] = None
BLOCK_K: Optional[int] = None
_NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Whole-sequence in-VMEM attention (short sequences)
#
# At T ~ 513, XLA's attention is HBM-bound on the materialized [T, T] score
# matrix (for ViT-B MAE decoder shapes thats ~400 MB of fp32 traffic per
# layer). Here each (batch*head) program holds Q, K, V (~200 KB) AND the
# score matrix (~1 MB fp32) entirely in VMEM: scores never touch HBM.
# ---------------------------------------------------------------------------

def _vmem_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale):
    # Dots keep the INPUT dtype as operands (bf16 training inputs hit the
    # MXU at full bf16 rate; fp32 test inputs keep full precision) and
    # accumulate in f32; softmax is always f32. Each program handles a
    # BLOCK of (batch*head) rows (unrolled python loop): fewer, larger DMA
    # transfers amortize per-program launch latency. No key-padding mask:
    # this path runs exact-T blocks (t_pad == T by construction in
    # _fused_fwd_impl), so every score column is real.
    for bh in range(q_ref.shape[0]):
        q = q_ref[bh]
        k = k_ref[bh]
        v = v_ref[bh]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / jnp.maximum(l, 1e-30)
        o_ref[bh] = o.astype(o_ref.dtype)
        lse_ref[bh, 0] = (m + jnp.log(jnp.maximum(l, 1e-30)))[:, 0]


def _vmem_bwd_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
                     dq_ref, dk_ref, dv_ref, *, scale):
    # Operand-dtype dots with f32 accumulation; probabilities/ds are
    # computed in f32 and cast back to the operand dtype before the MXU.
    # Blocked over (batch*head) rows like the forward kernel; exact-T
    # blocks, so no key-padding mask (see _vmem_fwd_kernel).
    for bh in range(q_ref.shape[0]):
        q = q_ref[bh]
        k = k_ref[bh]
        v = v_ref[bh]
        o = o_ref[bh].astype(jnp.float32)
        do = do_ref[bh]
        do_f32 = do.astype(jnp.float32)
        lse = lse_ref[bh, 0][:, None]

        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        p = jnp.exp(s - lse)  # [T, T] f32, exact softmax probabilities
        p_op = p.astype(q.dtype)

        dv = jax.lax.dot_general(
            p_op, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # P^T dO
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # dO V^T
        delta = jnp.sum(do_f32 * o, axis=1, keepdims=True)
        ds = (p * (dp - delta)).astype(q.dtype)
        dq = scale * jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dk = scale * jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # dS^T Q
        dq_ref[bh] = dq.astype(dq_ref.dtype)
        dk_ref[bh] = dk.astype(dk_ref.dtype)
        dv_ref[bh] = dv.astype(dv_ref.dtype)


def _prep_bhtd(x, B, H, T, D, t_pad):
    x = jnp.swapaxes(x, 1, 2).reshape(B * H, T, D)
    if t_pad != T:
        x = jnp.pad(x, ((0, 0), (0, t_pad - T), (0, 0)))
    return x


def _unprep(x, B, H, T, D):
    return jnp.swapaxes(x[:, :T, :].reshape(B, H, T, D), 1, 2)


# Sequences up to this length take the whole-sequence VMEM path
# (scores [T_pad, T_pad] fp32 must fit VMEM: 1024^2 x 4B = 4 MB).
VMEM_PATH_MAX_T = 1024


# ---------------------------------------------------------------------------
# Differentiable fused attention (custom VJP, whole-sequence VMEM path)
#
# XLA's attention backward stores the [T, T] probability matrix as a residual
# and streams it back through HBM; here the backward kernel RECOMPUTES
# P = exp(s QK^T - lse) from (q, k, lse) in VMEM and emits dq/dk/dv in one
# pass — the classic flash-attention backward, specialized to sequences whose
# score matrix fits VMEM.
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention(q, k, v, scale=None):
    """Differentiable fused attention [B, T, H, D] (T <= VMEM_PATH_MAX_T)."""
    o, _ = _fused_fwd_impl(q, k, v, scale)
    return o


def _bh_block(bh_total: int, t_pad: int) -> int:
    """Rows of the flattened (batch*head) dim per program: larger blocks
    amortize per-program launch/DMA latency. Both bounds are MEASURED perf
    choices, not compile-safety guards — hb=4 compiles at every VMEM-path
    size (probed on v5e at T=700 and T=1024, the path max; Mosaic reuses
    the row loop's stack slots, unlike an unrolled head loop — see
    tools/experimental_tm_attention.py). The cap of 4: hb>=8 VMEM-crashes
    at T>=513 (tools/sweep_vmem_attention.py). The 768 boundary: hb=4 wins
    below it (T=700: 3.61 vs 3.77 ms fwd+bwd; T=513/517: sweep optimum)
    and hb=1 wins at the top (T=1024: 4.11 vs 4.20)."""
    if t_pad >= 768:
        return 1
    for hb in (4, 2, 1):
        if bh_total % hb == 0:
            return hb
    return 1


def _fused_fwd_impl(q, k, v, scale):
    B, T, H, D = q.shape
    s = float(D) ** -0.5 if scale is None else scale
    # Exact-T blocks: Mosaic allows block dims EQUAL to the array dim without
    # divisibility, and each program reads whole [T, D] slabs — so the VMEM
    # path runs unpadded. vs the old round_up(T, 128): kills the full-size
    # HBM pad+slice copies around every call AND ~20% wasted score rows at
    # the ViT shapes (T=513/517 padded to 640). Measured on v5e
    # (bench_attention, fwd+bwd): DINO-student [64,517,12,64] 15.1 -> 9.85 ms
    # (1.53x), MAE decoder [32,513,16,48] 5.7 -> 3.91 ms (1.46x); full steps:
    # MAE 270.6 -> 292.5 vol/s/chip, DINO B=16 50.6 -> 58.0.
    t_pad = T
    qp = _prep_bhtd(q, B, H, T, D, t_pad)
    kp = _prep_bhtd(k, B, H, T, D, t_pad)
    vp = _prep_bhtd(v, B, H, T, D, t_pad)
    hb = _bh_block(B * H, t_pad)
    spec = pl.BlockSpec((hb, t_pad, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((hb, 1, t_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    o, lse = pl.pallas_call(
        functools.partial(_vmem_fwd_kernel, scale=s),
        grid=(B * H // hb,),
        in_specs=[spec, spec, spec],
        out_specs=(spec, lse_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, t_pad, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, 1, t_pad), jnp.float32),
        ),
        interpret=jax.default_backend() == "cpu",
    )(qp, kp, vp)
    return _unprep(o, B, H, T, D), (qp, kp, vp, o, lse)


def _fused_fwd(q, k, v, scale):
    out, res = _fused_fwd_impl(q, k, v, scale)
    B, T, H, D = q.shape
    return out, (res, (B, T, H, D))


def _fused_bwd(scale, residuals, g):
    (qp, kp, vp, o, lse), (B, T, H, D) = residuals
    s = float(D) ** -0.5 if scale is None else scale
    t_pad = qp.shape[1]
    gp = _prep_bhtd(g, B, H, T, D, t_pad)
    hb = _bh_block(B * H, t_pad)
    spec = pl.BlockSpec((hb, t_pad, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((hb, 1, t_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_vmem_bwd_kernel, scale=s),
        grid=(B * H // hb,),
        in_specs=[spec, spec, spec, spec, spec, lse_spec],
        out_specs=(spec, spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, t_pad, D), qp.dtype),
            jax.ShapeDtypeStruct((B * H, t_pad, D), kp.dtype),
            jax.ShapeDtypeStruct((B * H, t_pad, D), vp.dtype),
        ),
        interpret=jax.default_backend() == "cpu",
    )(qp, kp, vp, o, gp, lse)
    return (
        _unprep(dq, B, H, T, D),
        _unprep(dk, B, H, T, D),
        _unprep(dv, B, H, T, D),
    )


fused_attention.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Differentiable BLOCKED flash attention (custom VJP, long sequences)
#
# For T beyond the VMEM whole-sequence path (4096 tokens at 192^3 resolution),
# the forward kernel streams KV blocks with online softmax and emits the
# per-row logsumexp; the backward recomputes probabilities blockwise from
# (q, k, lse) — Dao et al. algorithm 4 — in two kernels: one accumulating
# dk/dv per KV block, one accumulating dq per Q block. No [T, T] tensor ever
# exists in HBM in either direction.
# ---------------------------------------------------------------------------

def _blocked_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                        scale: float, block_k: int, t_real: int):
    # Operand-dtype dots (bf16 at full MXU rate), f32 accumulate/softmax.
    q = q_ref[0]                                    # [BQ, D]
    bq, d = q.shape
    t_padded = k_ref.shape[1]
    num_kv = t_padded // block_k

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        kv_pos = i * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
        s = jnp.where(kv_pos < t_real, s, _NEG_INF)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc

    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m0, l0, acc0))

    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    lse_ref[0, 0] = (m + jnp.log(jnp.maximum(l, 1e-30)))[:, 0]


def _blocked_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                        dk_ref, dv_ref, *, scale: float, block_q: int,
                        t_real: int):
    """One program per (batch*head, KV block): accumulate dk/dv over Q blocks.

    Padding correctness: padded KV rows are masked to -inf scores (p = 0);
    padded Q rows carry do = 0 and delta = 0, so their dv contribution is 0
    and ds = p * (0 - 0) = 0 — no explicit Q mask needed.
    """
    kv_idx = pl.program_id(1)
    k_blk = k_ref[0]                                # [BK, D]
    v_blk = v_ref[0]
    bk, d = k_blk.shape
    t_padded = q_ref.shape[1]
    num_q = t_padded // block_q
    kv_pos = kv_idx * bk + jax.lax.broadcasted_iota(jnp.int32, (bk, 1), 0)

    def body(i, carry):
        dk_acc, dv_acc = carry
        q_blk = q_ref[0, pl.ds(i * block_q, block_q), :]
        do_blk = do_ref[0, pl.ds(i * block_q, block_q), :]
        lse = lse_ref[0, 0, pl.ds(i * block_q, block_q)][None, :]   # [1, BQ]
        delta = delta_ref[0, 0, pl.ds(i * block_q, block_q)][None, :]
        s_t = scale * jax.lax.dot_general(
            k_blk, q_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                           # [BK, BQ] f32
        s_t = jnp.where(kv_pos < t_real, s_t, _NEG_INF)
        p_t = jnp.exp(s_t - lse)
        dv_acc = dv_acc + jax.lax.dot_general(
            p_t.astype(do_blk.dtype), do_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp_t = jax.lax.dot_general(
            v_blk, do_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                           # [BK, BQ] f32
        ds_t = (p_t * (dp_t - delta)).astype(q_blk.dtype)
        dk_acc = dk_acc + scale * jax.lax.dot_general(
            ds_t, q_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk_acc, dv_acc

    zeros = jnp.zeros((bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_q, body, (zeros, zeros))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _blocked_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                       dq_ref, *, scale: float, block_k: int, t_real: int):
    """One program per (batch*head, Q block): accumulate dq over KV blocks."""
    q_blk = q_ref[0]                                # [BQ, D]
    do_blk = do_ref[0]
    lse = lse_ref[0, 0][:, None]                    # [BQ, 1]
    delta = delta_ref[0, 0][:, None]
    bq, d = q_blk.shape
    t_padded = k_ref.shape[1]
    num_kv = t_padded // block_k

    def body(i, dq_acc):
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = scale * jax.lax.dot_general(
            q_blk, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        kv_pos = i * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
        s = jnp.where(kv_pos < t_real, s, _NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do_blk, v_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - delta)).astype(k_blk.dtype)
        return dq_acc + scale * jax.lax.dot_general(
            ds, k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dq = jax.lax.fori_loop(0, num_kv, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def blocked_fused_attention(q, k, v, scale=None, kv_len=None):
    """Differentiable blocked flash attention for long sequences.

    q is [B, Tq, H, D]; k/v are [B, Tk, H, D] — rectangular (Tq != Tk)
    shapes are supported, which is what the context-parallel path needs
    (each device holds a token shard of Q against the all-gathered KV;
    see ops/attention.py). ``kv_len`` (static int) optionally marks the
    REAL key/value length when the caller padded Tk (e.g. to a multiple of
    the 'seq' mesh axis): positions >= kv_len are masked to -inf so padded
    keys carry zero probability. Defaults to Tk.
    """
    o, _ = _blocked_fwd_impl(q, k, v, scale, kv_len)
    return o


def _blocked_block_sizes(Tq: int, Tk: Optional[int] = None):
    """(block_q, block_k, t_pad_q, t_pad_k) for the blocked grids.

    Auto defaults from the sweep (see BLOCK_Q note): the shorter stretch
    sequences prefer the smaller Q block (less padding at T just past a
    power of two), the 4k+ ones the square 512 block. Q and KV pad
    independently to their own block so the (t_pad // block) grids tile
    each sequence exactly. Never clamp blocks to T: a clamp like
    min(bq, round_up(T, 8)) yields non-dividing block sizes (T=300 -> 304)
    whose grid silently drops the tail rows.
    """
    Tk = Tq if Tk is None else Tk
    bq = BLOCK_Q if BLOCK_Q else (256 if Tq <= 2048 else 512)
    bk = BLOCK_K if BLOCK_K else 512
    return bq, bk, _round_up(Tq, bq), _round_up(Tk, bk)


def _blocked_fwd_impl(q, k, v, scale, kv_len=None):
    B, Tq, H, D = q.shape
    Tk = k.shape[1]
    t_real = Tk if kv_len is None else int(kv_len)
    # kv_len > Tk would UN-mask the kernel's own zero-padded rows (score 0,
    # not -inf), silently giving them probability mass — fail loudly instead.
    assert 1 <= t_real <= Tk, (t_real, Tk)
    s = float(D) ** -0.5 if scale is None else scale
    block_q, block_k, t_pad_q, t_pad_k = _blocked_block_sizes(Tq, Tk)
    qp = _prep_bhtd(q, B, H, Tq, D, t_pad_q)
    kp = _prep_bhtd(k, B, H, Tk, D, t_pad_k)
    vp = _prep_bhtd(v, B, H, Tk, D, t_pad_k)

    grid = (B * H, t_pad_q // block_q)
    qo_spec = pl.BlockSpec(
        (1, block_q, D), lambda bh, i: (bh, i, 0), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (1, t_pad_k, D), lambda bh, i: (bh, 0, 0), memory_space=pltpu.VMEM
    )
    lse_spec = pl.BlockSpec(
        (1, 1, block_q), lambda bh, i: (bh, 0, i), memory_space=pltpu.VMEM
    )
    o, lse = pl.pallas_call(
        functools.partial(
            _blocked_fwd_kernel, scale=s, block_k=block_k, t_real=t_real
        ),
        grid=grid,
        in_specs=[qo_spec, kv_spec, kv_spec],
        out_specs=(qo_spec, lse_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, t_pad_q, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, 1, t_pad_q), jnp.float32),
        ),
        interpret=jax.default_backend() == "cpu",
    )(qp, kp, vp)
    return _unprep(o, B, H, Tq, D), (qp, kp, vp, o, lse)


def _blocked_fwd(q, k, v, scale, kv_len):
    out, res = _blocked_fwd_impl(q, k, v, scale, kv_len)
    B, Tq, H, D = q.shape
    return out, (res, (B, Tq, k.shape[1], H, D))


def _blocked_bwd(scale, kv_len, residuals, g):
    (qp, kp, vp, o, lse), (B, Tq, Tk, H, D) = residuals
    t_real = Tk if kv_len is None else int(kv_len)
    s = float(D) ** -0.5 if scale is None else scale
    block_q, block_k, t_pad_q, t_pad_k = _blocked_block_sizes(Tq, Tk)
    gp = _prep_bhtd(g, B, H, Tq, D, t_pad_q)
    # delta_i = dO_i . O_i (padded rows: dO = 0 -> delta = 0)
    delta = jnp.sum(gp.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = delta[:, None, :]                         # [BH, 1, t_pad_q]

    q_full_spec = pl.BlockSpec(
        (1, t_pad_q, D), lambda bh, j: (bh, 0, 0), memory_space=pltpu.VMEM
    )
    full_row = pl.BlockSpec(
        (1, 1, t_pad_q), lambda bh, j: (bh, 0, 0), memory_space=pltpu.VMEM
    )
    kv_blk_spec = pl.BlockSpec(
        (1, block_k, D), lambda bh, j: (bh, j, 0), memory_space=pltpu.VMEM
    )
    dk, dv = pl.pallas_call(
        functools.partial(
            _blocked_dkv_kernel, scale=s, block_q=block_q, t_real=t_real
        ),
        grid=(B * H, t_pad_k // block_k),
        in_specs=[q_full_spec, kv_blk_spec, kv_blk_spec, q_full_spec,
                  full_row, full_row],
        out_specs=(kv_blk_spec, kv_blk_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, t_pad_k, D), kp.dtype),
            jax.ShapeDtypeStruct((B * H, t_pad_k, D), vp.dtype),
        ),
        interpret=jax.default_backend() == "cpu",
    )(qp, kp, vp, gp, lse, delta)

    q_blk_spec = pl.BlockSpec(
        (1, block_q, D), lambda bh, i: (bh, i, 0), memory_space=pltpu.VMEM
    )
    kv_full_spec = pl.BlockSpec(
        (1, t_pad_k, D), lambda bh, i: (bh, 0, 0), memory_space=pltpu.VMEM
    )
    row_blk = pl.BlockSpec(
        (1, 1, block_q), lambda bh, i: (bh, 0, i), memory_space=pltpu.VMEM
    )
    dq = pl.pallas_call(
        functools.partial(
            _blocked_dq_kernel, scale=s, block_k=block_k, t_real=t_real
        ),
        grid=(B * H, t_pad_q // block_q),
        in_specs=[q_blk_spec, kv_full_spec, kv_full_spec, q_blk_spec, row_blk,
                  row_blk],
        out_specs=q_blk_spec,
        out_shape=jax.ShapeDtypeStruct((B * H, t_pad_q, D), qp.dtype),
        interpret=jax.default_backend() == "cpu",
    )(qp, kp, vp, gp, lse, delta)

    return (
        _unprep(dq, B, H, Tq, D),
        _unprep(dk, B, H, Tk, D),
        _unprep(dv, B, H, Tk, D),
    )


blocked_fused_attention.defvjp(_blocked_fwd, _blocked_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
) -> jax.Array:
    """Flash attention over [B, T, H, D] tensors (BTHD layout, matching
    jax.nn.dot_product_attention). Public entry: dispatches to the SAME
    custom-VJP kernels the models train on (fused_attention for VMEM-size
    sequences, blocked_fused_attention beyond) — one forward implementation
    to keep correct, and tests comparing this path against XLA exercise the
    production kernels. Rectangular (Tq != Tk) inputs always take the
    blocked kernel (the whole-sequence VMEM path is square-only)."""
    if q.shape[1] == k.shape[1] and q.shape[1] <= VMEM_PATH_MAX_T:
        return fused_attention(q, k, v, scale)
    return blocked_fused_attention(q, k, v, scale)
