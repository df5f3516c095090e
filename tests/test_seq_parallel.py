"""Context parallelism: rectangular blocked attention + the 'seq' mesh axis.

The long-sequence (192^3 -> 4096-token) configs can shard tokens over a
'seq' mesh axis: each device runs its Q shard against the KV all-gathered
inside a shard_map (ops/attention.py), using the blocked Pallas kernel's
rectangular (Tq != Tk) support. These tests pin, on the 8-device CPU mesh:
(a) the rectangular kernel's forward and backward against XLA, (b) kv_len
masking of caller-padded keys, and (c) the end-to-end seq-parallel path —
values AND grads — against the unsharded XLA reference.
"""

import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from headct_foundation_tpu.ops.flash_attention import blocked_fused_attention


def _rand(rng, *shape):
    return jnp.asarray(rng.randn(*shape), dtype=jnp.float32)


@contextlib.contextmanager
def _pallas_attention(min_t):
    """Force the pallas backend + crossover, restoring the prior raw values
    (set_* return the previous setting — including None = auto)."""
    from headct_foundation_tpu.ops.attention import (
        set_attention_backend,
        set_pallas_min_t,
    )

    prev_backend = set_attention_backend("pallas")
    prev_min_t = set_pallas_min_t(min_t)
    try:
        yield
    finally:
        set_attention_backend(prev_backend)
        set_pallas_min_t(prev_min_t)


@pytest.mark.parametrize("tq,tk", [(100, 300), (300, 100), (513, 70)])
def test_rectangular_blocked_attention_matches_xla(tq, tk):
    """Cross-attention shapes (Tq != Tk): forward and all three grads."""
    rng = np.random.RandomState(0)
    B, H, D = 2, 3, 32
    q = _rand(rng, B, tq, H, D)
    k = _rand(rng, B, tk, H, D)
    v = _rand(rng, B, tk, H, D)
    w = _rand(rng, B, tq, H, D)

    def loss_ours(q, k, v):
        return jnp.sum(blocked_fused_attention(q, k, v, None) * w)

    def loss_xla(q, k, v):
        return jnp.sum(jax.nn.dot_product_attention(q, k, v) * w)

    np.testing.assert_allclose(
        np.asarray(blocked_fused_attention(q, k, v, None)),
        np.asarray(jax.nn.dot_product_attention(q, k, v)),
        atol=2e-5, rtol=1e-4,
    )
    g1 = jax.grad(loss_ours, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3,
            err_msg=f"d{name} mismatch (tq={tq}, tk={tk})",
        )


def test_blocked_attention_kv_len_masks_padded_keys():
    """kv_len must make caller-padded keys invisible: attention over
    garbage-padded KV with kv_len=t equals XLA over the real prefix, in
    both the forward and the backward (dk/dv of the padded tail = 0)."""
    rng = np.random.RandomState(1)
    B, T, H, D, PAD = 2, 70, 2, 16, 58
    q = _rand(rng, B, T, H, D)
    k = _rand(rng, B, T, H, D)
    v = _rand(rng, B, T, H, D)
    w = _rand(rng, B, T, H, D)
    # Garbage (NOT zero) padding: only the kernel's -inf mask can hide it.
    kp = jnp.concatenate([k, 7.0 + _rand(rng, B, PAD, H, D)], axis=1)
    vp = jnp.concatenate([v, 7.0 + _rand(rng, B, PAD, H, D)], axis=1)

    out = blocked_fused_attention(q, kp, vp, None, T)
    ref = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)

    def loss_ours(q, kp, vp):
        return jnp.sum(blocked_fused_attention(q, kp, vp, None, T) * w)

    def loss_xla(q, k, v):
        return jnp.sum(jax.nn.dot_product_attention(q, k, v) * w)

    dq, dkp, dvp = jax.grad(loss_ours, argnums=(0, 1, 2))(q, kp, vp)
    dq2, dk2, dv2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq2),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dkp[:, :T]), np.asarray(dk2),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dvp[:, :T]), np.asarray(dv2),
                               atol=5e-4, rtol=1e-3)
    assert float(jnp.abs(dkp[:, T:]).max()) == 0.0
    assert float(jnp.abs(dvp[:, T:]).max()) == 0.0


def test_seq_parallel_attention_matches_xla():
    """End-to-end 'seq'-axis path: data2 x seq2 x tensor2 mesh, T=71 (odd,
    so the pad-to-axis branch triggers), values and grads vs unsharded XLA."""
    from headct_foundation_tpu.ops.attention import (
        attention_mesh,
        dot_product_attention,
    )
    from headct_foundation_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=2, seq=2, tensor=2)
    rng = np.random.RandomState(2)
    B, T, H, D = 4, 71, 4, 16
    q = _rand(rng, B, T, H, D)
    k = _rand(rng, B, T, H, D)
    v = _rand(rng, B, T, H, D)
    w = _rand(rng, B, T, H, D)

    with _pallas_attention(16), attention_mesh(mesh):
        out = dot_product_attention(q, k, v)
        g = jax.grad(
            lambda q, k, v: jnp.sum(dot_product_attention(q, k, v) * w),
            argnums=(0, 1, 2),
        )(q, k, v)

    ref = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
    g_ref = jax.grad(
        lambda q, k, v: jnp.sum(jax.nn.dot_product_attention(q, k, v) * w),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b, name in zip(g, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3,
            err_msg=f"d{name} mismatch on the seq-parallel path",
        )


def test_seq_parallel_keeps_tokens_sharded():
    """Under jit on a seq mesh, the attention output must come back with the
    token axis sharded over 'seq' (context parallelism would be pointless if
    the wrapper gathered tokens)."""
    from headct_foundation_tpu.ops.attention import (
        attention_mesh,
        dot_product_attention,
    )
    from headct_foundation_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=2, seq=4)
    rng = np.random.RandomState(3)
    B, T, H, D = 2, 64, 2, 16  # T divisible by seq: no pad/slice at the end
    q = _rand(rng, B, T, H, D)

    with _pallas_attention(16):
        def f(q):
            with attention_mesh(mesh):
                return dot_product_attention(q, q, q)

        out = jax.jit(f)(q)
        spec = out.sharding.spec
        assert len(spec) >= 2 and spec[1] == "seq", spec


@pytest.mark.parametrize("mesh_kw", [dict(data=2, seq=2), dict(data=4)])
def test_sharded_rectangular_attention_matches_xla(mesh_kw):
    """Rectangular (Tq != Tk) cross-attention through the SHARDED wrapper:
    regression for two dispatch bugs — (a) the seq-axis branch derived pads
    and kv_len from Tq only (silently masking keys past Tq), (b) the non-seq
    branch routed rectangular shapes to the square-only VMEM kernel (opaque
    reshape crash). Tq=6, Tk=64: Tq != Tk, Tq not divisible by seq=2 pads,
    and Tq <= VMEM_PATH_MAX_T so (b)'s old dispatch would have picked the
    square kernel."""
    from headct_foundation_tpu.ops.attention import (
        attention_mesh,
        dot_product_attention,
    )
    from headct_foundation_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(**mesh_kw)
    rng = np.random.RandomState(5)
    B, Tq, Tk, H, D = 4, 7, 64, 2, 16
    q = _rand(rng, B, Tq, H, D)
    k = _rand(rng, B, Tk, H, D)
    v = _rand(rng, B, Tk, H, D)

    with _pallas_attention(4), attention_mesh(mesh):
        out = dot_product_attention(q, k, v)
    ref = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_blocked_attention_rejects_oversized_kv_len():
    """kv_len > Tk would un-mask the kernel's own zero padding (score 0, not
    -inf) and silently leak probability mass — it must fail loudly."""
    rng = np.random.RandomState(6)
    q = _rand(rng, 1, 8, 1, 16)
    k = _rand(rng, 1, 8, 1, 16)
    with pytest.raises(AssertionError):
        blocked_fused_attention(q, k, k, None, 9)


def test_set_attention_backend_returns_previous_for_restore():
    """Temporary backend flips must be restorable to the exact prior raw
    state, including None (= auto) — a dryrun/test that pins 'xla' on exit
    would silently disable the Pallas kernels for the rest of the process."""
    import headct_foundation_tpu.ops.attention as att

    orig = att._BACKEND
    try:
        prev = att.set_attention_backend("pallas")
        assert prev == orig
        assert att.set_attention_backend(prev) == "pallas"
        assert att._BACKEND == orig
        p1 = att.set_pallas_min_t(7)
        assert att.set_pallas_min_t(p1) == 7
    finally:
        att._BACKEND = orig


def test_mesh_seq_axis_defaults_compatible():
    """seq=1 meshes keep the previous device layout and axis semantics."""
    from headct_foundation_tpu.parallel.mesh import MESH_AXES, make_mesh

    mesh = make_mesh(data=4, fsdp=2)
    assert mesh.shape["seq"] == 1
    assert tuple(mesh.axis_names) == MESH_AXES
    m2 = make_mesh(data=2, seq=2, tensor=2)
    assert m2.shape == {"data": 2, "fsdp": 1, "seq": 2, "pipe": 1, "tensor": 2}
