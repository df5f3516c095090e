"""Pallas kernel correctness (interpreter-compatible on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from headct_foundation_tpu.ops.flash_attention import flash_attention
from headct_foundation_tpu.ops.lion_kernel import lion_update_leaf


def _ref_attention(q, k, v, scale=None):
    return np.asarray(jax.nn.dot_product_attention(q, k, v, scale=scale))


@pytest.mark.parametrize("t", [64, 128, 129, 513])
def test_flash_attention_matches_xla(t):
    rng = np.random.RandomState(0)
    B, H, D = 2, 3, 32
    q = jnp.asarray(rng.randn(B, t, H, D), dtype=jnp.float32)
    k = jnp.asarray(rng.randn(B, t, H, D), dtype=jnp.float32)
    v = jnp.asarray(rng.randn(B, t, H, D), dtype=jnp.float32)
    ours = np.asarray(flash_attention(q, k, v))
    ref = _ref_attention(q, k, v)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_flash_attention_custom_scale():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, 70, 2, 16), dtype=jnp.float32)
    k = jnp.asarray(rng.randn(1, 70, 2, 16), dtype=jnp.float32)
    v = jnp.asarray(rng.randn(1, 70, 2, 16), dtype=jnp.float32)
    ours = np.asarray(flash_attention(q, k, v, scale=0.5))
    ref = _ref_attention(q, k, v, scale=0.5)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_lion_kernel_matches_formula():
    rng = np.random.RandomState(2)
    shape = (700,)  # non-multiple of block to exercise padding
    p = jnp.asarray(rng.randn(*shape), dtype=jnp.float32)
    g = jnp.asarray(rng.randn(*shape), dtype=jnp.float32)
    m = jnp.asarray(rng.randn(*shape), dtype=jnp.float32)
    lr, wd, b1, b2 = 0.01, 0.1, 0.9, 0.99

    delta, m_new = lion_update_leaf(p, g, m, jnp.asarray(lr), jnp.asarray(wd), b1, b2)

    ref_update = np.sign(np.asarray(m) * b1 + (1 - b1) * np.asarray(g))
    ref_delta = -lr * wd * np.asarray(p) - lr * ref_update
    ref_m = np.asarray(m) * b2 + (1 - b2) * np.asarray(g)
    np.testing.assert_allclose(np.asarray(delta), ref_delta, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m_new), ref_m, atol=1e-6)


def test_fused_attention_grads_match_xla():
    from headct_foundation_tpu.ops.flash_attention import fused_attention

    rng = np.random.RandomState(3)
    B, T, H, D = 2, 129, 3, 32
    q = jnp.asarray(rng.randn(B, T, H, D), dtype=jnp.float32)
    k = jnp.asarray(rng.randn(B, T, H, D), dtype=jnp.float32)
    v = jnp.asarray(rng.randn(B, T, H, D), dtype=jnp.float32)
    w = jnp.asarray(rng.randn(B, T, H, D), dtype=jnp.float32)  # cotangent mix

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, None) * w)

    def loss_xla(q, k, v):
        return jnp.sum(jax.nn.dot_product_attention(q, k, v) * w)

    o1 = np.asarray(fused_attention(q, k, v, None))
    o2 = np.asarray(jax.nn.dot_product_attention(q, k, v))
    np.testing.assert_allclose(o1, o2, atol=2e-5, rtol=1e-4)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3,
            err_msg=f"d{name} mismatch",
        )


@pytest.mark.parametrize("t", [192, 300])
def test_blocked_fused_attention_grads_match_xla(t):
    """Blocked (long-T) flash attention: forward AND backward vs XLA,
    including sequence lengths that exercise block padding (auto blocks are
    (256, 512) here, so Q pads to 256/512 and KV to 512 with partial tails
    that the -inf iota mask must cover in Q and KV)."""
    from headct_foundation_tpu.ops.flash_attention import blocked_fused_attention

    rng = np.random.RandomState(4)
    B, H, D = 2, 2, 32
    q = jnp.asarray(rng.randn(B, t, H, D), dtype=jnp.float32)
    k = jnp.asarray(rng.randn(B, t, H, D), dtype=jnp.float32)
    v = jnp.asarray(rng.randn(B, t, H, D), dtype=jnp.float32)
    w = jnp.asarray(rng.randn(B, t, H, D), dtype=jnp.float32)

    o1 = np.asarray(blocked_fused_attention(q, k, v, None))
    o2 = np.asarray(jax.nn.dot_product_attention(q, k, v))
    np.testing.assert_allclose(o1, o2, atol=2e-5, rtol=1e-4)

    def loss_blocked(q, k, v):
        return jnp.sum(blocked_fused_attention(q, k, v, None) * w)

    def loss_xla(q, k, v):
        return jnp.sum(jax.nn.dot_product_attention(q, k, v) * w)

    g1 = jax.grad(loss_blocked, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3,
            err_msg=f"d{name} mismatch",
        )


def test_blocked_block_sizes_tile_the_padded_sequence():
    """The (t_pad // block) grids must tile t_pad EXACTLY for every T and
    every override: a block that does not divide t_pad silently drops the
    tail rows (regression: clamping blocks to round_up(T, 8) gave 304 at
    T=300)."""
    import headct_foundation_tpu.ops.flash_attention as fa

    for t in (100, 300, 513, 1025, 2048, 2049, 4097, 8191):
        for tk in (None, 70, 4096):
            bq, bk, tq_pad, tk_pad = fa._blocked_block_sizes(t, tk)
            assert tq_pad >= t and tk_pad >= (tk or t)
            assert tq_pad % bq == 0 and tk_pad % bk == 0, (t, tk, bq, bk)
    orig_q, orig_k = fa.BLOCK_Q, fa.BLOCK_K
    try:
        for ov in ((128, 128), (512, 1024), (1024, 512)):
            fa.BLOCK_Q, fa.BLOCK_K = ov
            for t in (300, 1025, 4097):
                bq, bk, tq_pad, tk_pad = fa._blocked_block_sizes(t)
                assert tq_pad % bq == 0 and tk_pad % bk == 0, (ov, t)
    finally:
        fa.BLOCK_Q, fa.BLOCK_K = orig_q, orig_k


def test_long_sequence_dispatch_uses_blocked_kernel():
    """dot_product_attention at T>1024 must route to the differentiable
    blocked Pallas kernel (the 192^3/4096-token stretch-config train path)."""
    from headct_foundation_tpu.ops.attention import (
        dot_product_attention,
        set_attention_backend,
        set_attention_mesh,
    )

    set_attention_backend("pallas")
    set_attention_mesh(None)
    try:
        rng = np.random.RandomState(5)
        B, T, H, D = 1, 1100, 2, 16
        q = jnp.asarray(rng.randn(B, T, H, D), dtype=jnp.float32)

        def loss(q):
            return jnp.sum(dot_product_attention(q, q, q) ** 2)

        g = jax.grad(loss)(q)  # must be differentiable end to end
        g_ref = jax.grad(
            lambda q: jnp.sum(jax.nn.dot_product_attention(q, q, q) ** 2)
        )(q)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(g_ref), atol=1e-3, rtol=1e-3
        )
    finally:
        set_attention_backend("xla")
        set_attention_mesh(None)


def test_pallas_attention_shards_without_allgather():
    """GSPMD can't partition pallas_call; the mesh-registered shard_map
    wrapper must keep the batch sharded (no all-gather in the HLO)."""
    from headct_foundation_tpu.ops.attention import (
        dot_product_attention,
        set_attention_backend,
        set_attention_mesh,
    )
    from headct_foundation_tpu.parallel.mesh import batch_sharding, make_mesh

    mesh = make_mesh(data=8)
    set_attention_backend("pallas")
    set_attention_mesh(mesh)
    try:
        # T >= _PALLAS_MIN_T so the pallas shard_map path is exercised
        B, T, H, D = 16, 256, 4, 32
        qn = np.random.RandomState(0).randn(B, T, H, D).astype(np.float32)
        q = jax.device_put(qn, batch_sharding(mesh))
        f = jax.jit(
            lambda q: dot_product_attention(q, q, q),
            in_shardings=(batch_sharding(mesh),),
        )
        out = f(q)
        assert out.sharding.spec == jax.sharding.PartitionSpec(("data", "fsdp"))
        hlo = f.lower(q).compile().as_text()
        assert "all-gather" not in hlo
        ref = np.asarray(
            jax.nn.dot_product_attention(
                jnp.asarray(qn), jnp.asarray(qn), jnp.asarray(qn)
            )
        )
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
    finally:
        set_attention_backend("xla")
        set_attention_mesh(None)


@pytest.mark.slow
def test_192_config_trains_on_blocked_pallas_path(monkeypatch, tmp_path):
    """The shipped 192^3 stretch recipe (configs/mae/mae_HeadCT_192.yaml)
    routes BOTH its attention shapes — 1025-token masked encoder and
    4097-token decoder — through the blocked Pallas kernel in a real train
    step. Model width is shrunk for CPU (the geometry that decides dispatch
    — INPUT_SIZE/PATCH_SIZE/MASK_RATIO — is the recipe's own); the blocked
    kernel's numerics/grads are covered by the parity tests above, so here
    it is observed at the dispatch seam and delegated to XLA."""
    import os

    from headct_foundation_tpu.config import default_config
    from headct_foundation_tpu.engines import mae_engine
    from headct_foundation_tpu.ops import attention as attn_mod
    from headct_foundation_tpu.ops import flash_attention as fa
    from headct_foundation_tpu.parallel.mesh import make_mesh

    cfg = default_config()
    cfg.merge_from_file(
        os.path.join(os.path.dirname(__file__), "..",
                     "configs/mae/mae_HeadCT_192.yaml")
    )
    for section in (("ENCODER", 2), ("DECODER", 1)):
        prefix, depth = section
        setattr(cfg.MAE, f"{prefix}_DEPTH", depth)
        setattr(cfg.MAE, f"{prefix}_EMBED_DIM", 48)  # % 6 == 0: 3D sincos
        setattr(cfg.MAE, f"{prefix}_MLP_DIM", 96)
        setattr(cfg.MAE, f"{prefix}_NUM_HEADS", 4)
    cfg.MAE.IN_CHANS = 1
    cfg.MODEL.IN_CHANS = 1

    seen_t = []

    def _spy(q, k, v, scale=None):
        seen_t.append(q.shape[1])
        return jax.nn.dot_product_attention(q, k, v, scale=scale)

    monkeypatch.setattr(fa, "blocked_fused_attention", _spy)
    monkeypatch.setattr(attn_mod, "set_attention_backend", lambda n: None)
    monkeypatch.setattr(attn_mod, "get_attention_backend", lambda: "pallas")

    # 1-device mesh: on this 1-core host, 8 virtual-device threads running
    # the heavy 192^3 step timeshare one core and can miss XLA CPU's
    # hardcoded 40 s collective-rendezvous deadline (the grad psum aborts
    # the process: "Termination timeout for all reduce ... Exiting to
    # ensure a consistent program state"). Dispatch-to-blocked-kernel is
    # what this test observes, and it is mesh-size-independent; the
    # multi-device step itself is covered by the (light) graft dryrun and
    # engine tests.
    mesh = make_mesh(data=1)
    rng = jax.random.PRNGKey(0)
    state, _, _ = mae_engine.create_train_state(
        cfg, mesh, rng, total_steps=4, num_warmup_steps=1
    )
    train_step = mae_engine.make_train_step(mesh)
    batch = mae_engine._to_device_batch(
        np.random.RandomState(0).randn(1, 1, 192, 192, 192).astype(np.float32),
        mesh,
    )
    state, metrics = train_step(state, batch, rng)
    assert np.isfinite(float(jax.device_get(metrics["loss"])))
    # decoder: 4096 patch tokens + CLS; encoder: 1024 kept tokens + CLS
    assert 4097 in seen_t, seen_t
    assert 1025 in seen_t, seen_t
    assert all(t > fa.VMEM_PATH_MAX_T for t in seen_t), seen_t


def test_bh_block_policy():
    # Pins the measured (batch*head)-block policy: hb=4 below 768 (sweep
    # optimum at T=513/517; measured faster at T=700), hb=1 from 768 up
    # (measured faster at T=1024); cap at 4 because hb>=8 VMEM-crashes at
    # T>=513. Both boundaries are perf choices — hb=4 compiles at every
    # VMEM-path size (probed at T=700/1024 on v5e).
    from headct_foundation_tpu.ops.flash_attention import _bh_block

    assert _bh_block(384, 513) == 4
    assert _bh_block(384, 700) == 4
    assert _bh_block(384, 767) == 4
    assert _bh_block(384, 768) == 1
    assert _bh_block(384, 1024) == 1
    # non-divisible (batch*head) totals fall through to smaller blocks
    assert _bh_block(6, 513) == 2
    assert _bh_block(5, 513) == 1
