import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from headct_foundation_tpu.models import (
    AttentionBlock,
    AttentionClassifier,
    DINOHead,
    LinearClassifier,
    MaskedAutoencoderViT,
    PatchEmbeddingBlock,
    RMSNorm,
    ViT,
    patchify3d,
    unpatchify3d,
)

KEY = jax.random.PRNGKey(0)


def test_patchify_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 24, 24, 24).astype(np.float32))
    p = patchify3d(x, (12, 12, 12))
    assert p.shape == (2, 8, 12 * 12 * 12 * 3)
    x2 = unpatchify3d(p, (12, 12, 12), (3, 24, 24, 24))
    np.testing.assert_array_equal(np.asarray(x2), np.asarray(x))


def test_patchify_matches_torch_reference_order():
    """Cross-check token/feature ordering against the documented reference
    permute (mae.py:167-168): reshape(B,C,gh,ph,gw,pw,gd,pd).permute(0,2,4,6,3,5,7,1)."""
    x = np.random.RandomState(1).randn(1, 2, 6, 6, 6).astype(np.float32)
    t = torch.from_numpy(x)
    B, C = 1, 2
    gh = gw = gd = 2
    ph = pw = pd = 3
    ref = (
        t.reshape(B, C, gh, ph, gw, pw, gd, pd)
        .permute(0, 2, 4, 6, 3, 5, 7, 1)
        .reshape(B, gh * gw * gd, ph * pw * pd * C)
        .numpy()
    )
    ours = np.asarray(patchify3d(jnp.asarray(x), (3, 3, 3)))
    np.testing.assert_array_equal(ours, ref)


def test_patch_embed_equals_conv3d():
    """The reshape+matmul embed must equal a stride=kernel Conv3d."""
    rng = np.random.RandomState(2)
    x = rng.randn(2, 3, 24, 24, 24).astype(np.float32)
    conv_w = rng.randn(16, 3, 12, 12, 12).astype(np.float32) * 0.02
    conv_b = rng.randn(16).astype(np.float32)

    # torch conv path (flatten(2).transpose like reference patch_embedding.py:152)
    t = torch.nn.functional.conv3d(torch.from_numpy(x), torch.from_numpy(conv_w),
                                   torch.from_numpy(conv_b), stride=12)
    ref = t.flatten(2).transpose(-1, -2).numpy()  # [B, L, 16]

    m = PatchEmbeddingBlock(
        img_size=(24, 24, 24), patch_size=(12, 12, 12), in_channels=3,
        hidden_size=16, pos_embed="none",
    )
    params = m.init(KEY, jnp.asarray(x))["params"]
    # convert conv weight [O,C,ph,pw,pd] -> matmul layout [(ph,pw,pd,C), O]
    kernel = conv_w.transpose(2, 3, 4, 1, 0).reshape(-1, 16)
    params = dict(params)
    params["kernel"] = jnp.asarray(kernel)
    params["bias"] = jnp.asarray(conv_b)
    out = m.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3, rtol=1e-3)


def test_rmsnorm_matches_torch_formula():
    x = np.random.RandomState(3).randn(4, 8).astype(np.float32)
    m = RMSNorm(dim=8)
    params = m.init(KEY, jnp.asarray(x))
    out = np.asarray(m.apply(params, jnp.asarray(x)))
    t = torch.from_numpy(x)
    ref = (t * torch.rsqrt(t.pow(2).mean(-1, keepdim=True) + 1e-6)).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_attention_block_shapes():
    m = AttentionBlock(hidden_size=64, mlp_dim=128, num_heads=4)
    x = jnp.zeros((2, 10, 64))
    params = m.init(KEY, x)
    y = m.apply(params, x)
    assert y.shape == (2, 10, 64)


@pytest.mark.parametrize("registers", [0, 4])
def test_vit_forward(registers):
    m = ViT(
        in_chans=3, img_size=24, patch_size=12, hidden_size=48, mlp_dim=96,
        num_layers=2, num_heads=4, pos_embed="sincos",
        num_register_tokens=registers, qkv_bias=True,
    )
    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 24, 24, 24), dtype=jnp.float32)
    params = m.init(KEY, x)
    out, hidden = m.apply(params, x)
    assert out.shape == (2, 1 + registers + 8, 48)
    assert len(hidden) == 2
    assert hidden[0].shape == out.shape


def test_vit_dynamic_resolution():
    m = ViT(in_chans=1, img_size=24, patch_size=12, hidden_size=48, mlp_dim=96,
            num_layers=1, num_heads=4, pos_embed="sincos")
    x24 = jnp.zeros((1, 1, 24, 24, 24))
    params = m.init(KEY, x24)
    x36 = jnp.zeros((1, 1, 36, 36, 36))
    out, _ = m.apply(params, x36)
    assert out.shape == (1, 1 + 27, 48)


def test_mae_forward_and_loss_finite():
    m = MaskedAutoencoderViT(
        input_size=24, patch_size=12, mask_ratio=0.75, in_chans=3,
        pos_embed="sincos", encoder_depth=2, encoder_embed_dim=48,
        encoder_mlp_dim=96, encoder_num_heads=4, decoder_depth=1,
        decoder_embed_dim=36, decoder_mlp_dim=72, decoder_num_heads=4,
        use_bias=True,
    )
    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 24, 24, 24), dtype=jnp.float32)
    params = m.init({"params": KEY, "mask": jax.random.PRNGKey(1)}, x)
    loss, _, _ = m.apply(params, x, rngs={"mask": jax.random.PRNGKey(2)})
    assert np.isfinite(float(loss))


def test_mae_loss_only_masked_patches():
    """If pred == target everywhere, loss is 0; if pred differs only on kept
    (unmasked) patches, loss stays 0."""
    m = MaskedAutoencoderViT(
        input_size=24, patch_size=12, mask_ratio=0.5, in_chans=1,
        pos_embed="sincos", encoder_depth=1, encoder_embed_dim=48,
        encoder_mlp_dim=96, encoder_num_heads=4, decoder_depth=1,
        decoder_embed_dim=36, decoder_mlp_dim=72, decoder_num_heads=4,
    )
    x = jnp.asarray(np.random.RandomState(0).randn(1, 1, 24, 24, 24), dtype=jnp.float32)
    variables = m.init({"params": KEY, "mask": jax.random.PRNGKey(1)}, x)

    target = m.apply(variables, x, method=m.patchify)
    mask = jnp.zeros((1, 8))
    mask = mask.at[0, :4].set(1.0)
    loss_exact = m.apply(variables, x, target, mask, method=m.forward_loss)
    assert float(loss_exact) == 0.0
    # perturb an unmasked patch -> still zero
    pred = target.at[0, 5].add(10.0)
    loss_kept = m.apply(variables, x, pred, mask, method=m.forward_loss)
    assert float(loss_kept) == 0.0
    # perturb a masked patch -> positive
    pred = target.at[0, 0].add(10.0)
    loss_masked = m.apply(variables, x, pred, mask, method=m.forward_loss)
    assert float(loss_masked) > 0.0


def test_dino_head_output():
    m = DINOHead(in_dim=32, out_dim=128, nlayers=3, hidden_dim=64, bottleneck_dim=16)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 32), dtype=jnp.float32)
    params = m.init(KEY, x)
    out = m.apply(params, x)
    assert out.shape == (4, 128)
    # weight-normalized last layer with g=1: logits are cosine similarities
    # scaled by ||bottleneck feature|| = 1, so bounded by 1.
    assert float(jnp.max(jnp.abs(out))) <= 1.0 + 1e-5


def test_linear_classifier():
    m = LinearClassifier(dim=16, num_classes=2)
    x = jnp.asarray(np.random.RandomState(0).randn(8, 16), dtype=jnp.float32)
    variables = m.init(KEY, x)
    out, updates = m.apply(variables, x, use_running_average=False,
                           mutable=["batch_stats"])
    assert out.shape == (8, 2)
    out_eval = m.apply(variables, x, use_running_average=True)
    assert out_eval.shape == (8, 2)


def test_attention_classifier():
    m = AttentionClassifier(dim=24, num_classes=2, num_heads=4, num_queries=2)
    x = jnp.asarray(np.random.RandomState(0).randn(3, 10, 24), dtype=jnp.float32)
    variables = m.init(KEY, x)
    out, _ = m.apply(variables, x, use_running_average=False, mutable=["batch_stats"])
    assert out.shape == (3, 2)


def test_remat_grads_match_no_remat():
    """PARALLEL.REMAT (MLP-only remat) must be a pure memory/flops trade:
    gradients identical to the unrematerialized model."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from headct_foundation_tpu.models.vit import ViT

    x = jnp.asarray(
        np.random.RandomState(0).randn(2, 1, 24, 24, 24), jnp.float32
    )
    kwargs = dict(in_chans=1, img_size=24, patch_size=12, hidden_size=32,
                  mlp_dim=64, num_layers=2, num_heads=4, qkv_bias=True)
    m_remat = ViT(remat=True, **kwargs)
    m_plain = ViT(remat=False, **kwargs)
    params = m_remat.init(jax.random.PRNGKey(0), x)["params"]

    def loss(m):
        return lambda p: jnp.sum(m.apply({"params": p}, x, False)[0] ** 2)

    g1 = jax.grad(loss(m_remat))(params)
    g2 = jax.grad(loss(m_plain))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_remat_with_dropout_traces():
    """Regression: remat_mlp must keep `deterministic` static — with a
    traced flag, nn.Dropout's python branch crashes whenever
    dropout_rate > 0 (TracerBoolConversionError)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from headct_foundation_tpu.models.vit import ViT

    m = ViT(in_chans=1, img_size=24, patch_size=12, hidden_size=32,
            mlp_dim=64, num_layers=1, num_heads=4, qkv_bias=True,
            remat=True, dropout_rate=0.1)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 1, 24, 24, 24),
                    jnp.float32)
    params = m.init({"params": jax.random.PRNGKey(0),
                     "dropout": jax.random.PRNGKey(1)}, x, False)["params"]

    def loss(p):
        out, _ = m.apply({"params": p}, x, False,
                         rngs={"dropout": jax.random.PRNGKey(2)})
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(params)  # must trace and differentiate
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


def test_mae_loss_dtype_bfloat16_close_to_f32():
    """MAE.LOSS_DTYPE='bfloat16' (bandwidth experiment): same loss to bf16
    tolerance; default 'float32' math unchanged (covered by parity oracle)."""
    import jax
    import jax.numpy as jnp

    from headct_foundation_tpu.models.mae import MaskedAutoencoderViT

    kw = dict(
        input_size=24, patch_size=12, mask_ratio=0.75, in_chans=1,
        pos_embed="learnable", encoder_depth=1, encoder_embed_dim=48,
        encoder_mlp_dim=96, encoder_num_heads=4, decoder_depth=1,
        decoder_embed_dim=48, decoder_mlp_dim=96, decoder_num_heads=4,
        use_bias=True,
    )
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, 1, 24, 24, 24), jnp.float32
    )
    rng = jax.random.PRNGKey(0)
    losses = {}
    for ldt in ("float32", "bfloat16"):
        for npx in (False, True):
            m = MaskedAutoencoderViT(loss_dtype=ldt, norm_pix_loss=npx, **kw)
            params = m.init({"params": jax.random.PRNGKey(1), "mask": rng}, x)[
                "params"
            ]
            loss, _, _ = m.apply(
                {"params": params}, x, deterministic=True, mask_rng=rng
            )
            losses[(ldt, npx)] = float(loss)
    for npx in (False, True):
        f32, bf16 = losses[("float32", npx)], losses[("bfloat16", npx)]
        assert abs(f32 - bf16) / max(abs(f32), 1e-6) < 2e-2, (f32, bf16)


def test_torch_batchnorm_matches_torch_semantics():
    """TorchBatchNorm: torch normalizes with the BIASED batch variance but
    stores the UNBIASED (Bessel-corrected) one into running_var — flax's
    nn.BatchNorm stores the biased one, which would skew eval-time outputs of
    self-trained classifiers by n/(n-1) (reference BN modules:
    src/models/classifier.py:18, src/models/dino_head.py:17-22)."""
    import torch

    from headct_foundation_tpu.models.layers import TorchBatchNorm

    rs = np.random.RandomState(0)
    for shape in [(8, 16), (3, 10, 16)]:  # 2D and token-sequence inputs
        x = rs.randn(*shape).astype(np.float32)
        m = TorchBatchNorm(use_running_average=False, momentum=0.9,
                           epsilon=1e-6, use_bias=False, use_scale=False)
        v = m.init(KEY, jnp.asarray(x))
        tbn = torch.nn.BatchNorm1d(16, affine=False, eps=1e-6)
        tbn.train()
        tx = torch.from_numpy(x if x.ndim == 2 else x.transpose(0, 2, 1))
        ty = tbn(tx).detach().numpy()
        ty = ty if x.ndim == 2 else ty.transpose(0, 2, 1)
        y, upd = m.apply(v, jnp.asarray(x), mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y), ty, atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(upd["batch_stats"]["mean"]), tbn.running_mean.numpy(),
            atol=1e-6,
        )
        np.testing.assert_allclose(  # the unbiased update rule
            np.asarray(upd["batch_stats"]["var"]), tbn.running_var.numpy(),
            atol=1e-5, rtol=1e-5,
        )
        tbn.eval()
        ty_e = tbn(tx).detach().numpy()
        ty_e = ty_e if x.ndim == 2 else ty_e.transpose(0, 2, 1)
        m2 = TorchBatchNorm(use_running_average=True, momentum=0.9,
                            epsilon=1e-6, use_bias=False, use_scale=False)
        y_e = m2.apply(
            {"params": {}, "batch_stats": upd["batch_stats"]}, jnp.asarray(x)
        )
        np.testing.assert_allclose(np.asarray(y_e), ty_e, atol=2e-5)


def test_torch_batchnorm_guards():
    """Train-mode n==1 raises like torch ('Expected more than 1 value per
    channel'); init with axis_name set must NOT trace collectives (flax's
    nn.BatchNorm skips the sync while initializing)."""
    from headct_foundation_tpu.models.layers import TorchBatchNorm

    m = TorchBatchNorm(use_running_average=False)
    v1 = m.init(KEY, jnp.ones((1, 16)))  # shape-only init is allowed
    with pytest.raises(ValueError, match="1 value per channel"):
        m.apply(v1, jnp.ones((1, 16)), mutable=["batch_stats"])

    # init outside any named-axis context succeeds even with axis_name set
    m2 = TorchBatchNorm(use_running_average=False, axis_name="data")
    v = m2.init(KEY, jnp.ones((4, 16)))
    assert set(v["batch_stats"]) == {"mean", "var"}
