"""End-to-end numeric parity against torch oracles implementing the
reference formulas (SURVEY.md §2.3-2.4).

Three levels, each one a regression net for a different failure class:

* full MAE (encoder + masking + decoder + masked MSE) — catches patchify
  order, mask/restore gather, decoder pos-embed, and loss-masking bugs;
* DINO head (weight-norm last layer, L2-normalized bottleneck) — catches
  weight_g/weight_v import and normalization bugs;
* full pipeline (synthetic NIfTI -> preprocessing -> CLS embedding, JAX
  on-device preprocessing vs torch + scipy host path) — catches window-order,
  resize-mode, and eps regressions at the embedding-cosine level
  (BASELINE.json's >=0.999 cosine north star).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from headct_foundation_tpu.models.mae import MaskedAutoencoderViT
from headct_foundation_tpu.utils.torch_interop import merge_params, torch_to_tree

from tests.test_torch_interop import OracleBlock, OracleViT


# ---------------------------------------------------------------------------
# Oracle MAE: reference formulas (reference: src/models/mae.py:150-316)
# ---------------------------------------------------------------------------

class OracleMAE(nn.Module):
    def __init__(self, in_chans=2, img=24, patch=12, dim=48, mlp=96,
                 enc_layers=2, heads=4, dec_dim=36, dec_mlp=72, dec_layers=1,
                 dec_heads=4, norm_pix=False):
        super().__init__()
        self.patch = patch
        self.in_chans = in_chans
        self.norm_pix = norm_pix
        g = img // patch
        L = g ** 3

        class PE(nn.Module):
            def __init__(self):
                super().__init__()
                self.patch_embeddings = nn.Conv3d(in_chans, dim, patch, stride=patch)
                self.position_embeddings = nn.Parameter(torch.randn(1, L, dim) * 0.02)

            def forward(self, x):
                x = self.patch_embeddings(x).flatten(2).transpose(-1, -2)
                return x + self.position_embeddings

        self.patch_embedding = PE()
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.blocks = nn.ModuleList(
            [OracleBlock(dim, mlp, heads, qkv_bias=True) for _ in range(enc_layers)]
        )
        self.norm = nn.LayerNorm(dim, eps=1e-6)

        self.decoder_embed = nn.Linear(dim, dec_dim)
        self.mask_token = nn.Parameter(torch.randn(1, 1, dec_dim) * 0.02)
        self.decoder_cls_token = nn.Parameter(torch.randn(1, 1, dec_dim) * 0.02)
        self.decoder_pos_embed = nn.Parameter(torch.randn(1, L, dec_dim) * 0.02)
        self.decoder_blocks = nn.ModuleList(
            [OracleBlock(dec_dim, dec_mlp, dec_heads, qkv_bias=True)
             for _ in range(dec_layers)]
        )
        self.decoder_norm = nn.LayerNorm(dec_dim, eps=1e-6)
        self.decoder_pred = nn.Linear(dec_dim, patch ** 3 * in_chans)

    def patchify(self, x):
        # reference permute order (src/models/mae.py:150-192)
        B, C, H, W, D = x.shape
        p = self.patch
        gh, gw, gd = H // p, W // p, D // p
        x = x.reshape(B, C, gh, p, gw, p, gd, p)
        x = x.permute(0, 2, 4, 6, 3, 5, 7, 1)
        return x.reshape(B, gh * gw * gd, p ** 3 * C)

    def forward(self, x, ids_shuffle, len_keep):
        ids_restore = torch.argsort(ids_shuffle, dim=1)
        ids_keep = ids_shuffle[:, :len_keep]
        L = ids_shuffle.shape[1]

        # encoder (reference: mae.py:220-242)
        tok = self.patch_embedding(x)
        tok = torch.gather(
            tok, 1, ids_keep[:, :, None].expand(-1, -1, tok.shape[-1])
        )
        mask = torch.ones(x.shape[0], L)
        mask[:, :len_keep] = 0
        mask = torch.gather(mask, 1, ids_restore)
        cls = self.cls_token.expand(tok.shape[0], -1, -1)
        tok = torch.cat([cls, tok], dim=1)
        for blk in self.blocks:
            tok = blk(tok)
        latent = self.norm(tok)

        # decoder (reference: mae.py:244-275)
        y = self.decoder_embed(latent)
        n_mask = L + 1 - y.shape[1]
        mask_tokens = self.mask_token.expand(y.shape[0], n_mask, -1)
        y_ = torch.cat([y[:, 1:, :], mask_tokens], dim=1)
        y_ = torch.gather(
            y_, 1, ids_restore[:, :, None].expand(-1, -1, y.shape[-1])
        )
        y = torch.cat([y[:, :1, :], y_], dim=1)
        dec_pe = torch.cat([self.decoder_cls_token, self.decoder_pos_embed], dim=1)
        y = y + dec_pe
        for blk in self.decoder_blocks:
            y = blk(y)
        pred = self.decoder_pred(self.decoder_norm(y))[:, 1:, :]

        # masked MSE (reference: mae.py:277-301)
        target = self.patchify(x)
        if self.norm_pix:
            mean = target.mean(dim=-1, keepdim=True)
            # torch default (unbiased=True) — exactly the reference's
            # target.var(dim=-1) at src/models/mae.py:292
            var = target.var(dim=-1, keepdim=True)
            target = (target - mean) / torch.sqrt(var + 1e-6)
        loss = ((pred - target) ** 2).mean(dim=-1)
        loss = (loss * mask).sum() / mask.sum()
        return loss, pred, latent, mask


@pytest.mark.parametrize("norm_pix", [False, True])
def test_full_mae_parity_with_torch_oracle(monkeypatch, norm_pix):
    monkeypatch.setenv("HEADCT_EXACT_GELU", "1")
    torch.manual_seed(0)
    oracle = OracleMAE(norm_pix=norm_pix).eval()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    tree = torch_to_tree(sd)["params"]

    model = MaskedAutoencoderViT(
        input_size=24, patch_size=12, mask_ratio=0.75, in_chans=2,
        dropout_rate=0.0, pos_embed="learnable", encoder_depth=2,
        encoder_embed_dim=48, encoder_mlp_dim=96, encoder_num_heads=4,
        decoder_depth=1, decoder_embed_dim=36, decoder_mlp_dim=72,
        decoder_num_heads=4, norm_pix_loss=norm_pix, use_bias=True,
    )
    x_np = np.random.RandomState(0).randn(2, 2, 24, 24, 24).astype(np.float32)
    rng = jax.random.PRNGKey(7)
    init = model.init({"params": jax.random.PRNGKey(0), "mask": rng},
                      jnp.asarray(x_np))["params"]
    merged, missing, unexpected = merge_params(init, tree)
    assert not missing, missing
    assert not unexpected, unexpected

    # reproduce OUR mask exactly: the model draws uniform(mask_rng, [N, L])
    # and argsorts (ops/masking.py); feed the oracle the same shuffle
    noise = np.asarray(jax.random.uniform(rng, (2, 8)))
    ids_shuffle = np.argsort(noise, axis=1, kind="stable")
    len_keep = int(8 * (1 - 0.75))

    with torch.no_grad():
        ref_loss, ref_pred, ref_latent, _ = oracle(
            torch.from_numpy(x_np), torch.from_numpy(ids_shuffle), len_keep
        )

    loss, _, _ = model.apply(
        {"params": merged}, jnp.asarray(x_np), deterministic=True, mask_rng=rng
    )
    latent, mask, ids_restore = model.apply(
        {"params": merged}, jnp.asarray(x_np), rng, True,
        method=MaskedAutoencoderViT.forward_encoder,
    )
    pred = model.apply(
        {"params": merged}, latent, ids_restore, True,
        method=MaskedAutoencoderViT.forward_decoder,
    )

    np.testing.assert_allclose(
        np.asarray(latent), ref_latent.numpy(), atol=3e-4, rtol=1e-3
    )
    p1, p2 = np.asarray(pred), ref_pred.numpy()
    cos = np.sum(p1 * p2) / (np.linalg.norm(p1) * np.linalg.norm(p2))
    assert cos > 0.9999, cos
    np.testing.assert_allclose(p1, p2, atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(
        float(loss), float(ref_loss), rtol=2e-4, atol=2e-5
    )


# ---------------------------------------------------------------------------
# Oracle DINO head (reference: src/models/dino_head.py:7-41)
# ---------------------------------------------------------------------------

class OracleDINOHead(nn.Module):
    def __init__(self, in_dim=16, out_dim=32, hidden=24, bottleneck=8):
        super().__init__()
        self.mlp = nn.Sequential(
            nn.Linear(in_dim, hidden), nn.GELU(),
            nn.Linear(hidden, hidden), nn.GELU(),
            nn.Linear(hidden, bottleneck),
        )
        self.last_layer = nn.utils.weight_norm(
            nn.Linear(bottleneck, out_dim, bias=False)
        )
        self.last_layer.weight_g.data.fill_(1.0)  # frozen gain

    def forward(self, x):
        x = self.mlp(x)
        x = F.normalize(x, dim=-1, p=2)
        return self.last_layer(x)


def test_dino_head_numeric_parity(monkeypatch):
    monkeypatch.setenv("HEADCT_EXACT_GELU", "1")
    from headct_foundation_tpu.models import DINOHead

    torch.manual_seed(1)
    oracle = OracleDINOHead().eval()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    tree = torch_to_tree(sd)["params"]

    head = DINOHead(in_dim=16, out_dim=32, nlayers=3, hidden_dim=24,
                    bottleneck_dim=8, use_bn=False, norm_last_layer=True)
    x_np = np.random.RandomState(1).randn(5, 16).astype(np.float32)
    init = head.init(jax.random.PRNGKey(0), jnp.zeros((1, 16)))["params"]
    merged, missing, unexpected = merge_params(init, tree)
    assert not missing, missing
    assert not unexpected, unexpected

    with torch.no_grad():
        ref = oracle(torch.from_numpy(x_np)).numpy()
    ours = np.asarray(head.apply({"params": merged}, jnp.asarray(x_np)))
    cos = np.sum(ours * ref) / (np.linalg.norm(ours) * np.linalg.norm(ref))
    assert cos > 0.9999, cos
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# Full pipeline: NIfTI -> preprocessing -> CLS embedding, ours vs torch
# ---------------------------------------------------------------------------

def test_full_pipeline_embedding_cosine(monkeypatch, tmp_path):
    """BASELINE north-star-shaped check: the same scan through (a) our
    ON-DEVICE preprocessing + JAX ViT and (b) scipy host preprocessing +
    a torch ViT carrying the SAME weights must agree to cosine >= 0.999.
    Catches window-order, resize-mode, interpolation, and eps regressions
    anywhere in the inference chain."""
    monkeypatch.setenv("HEADCT_EXACT_GELU", "1")
    from headct_foundation_tpu.data.device_preprocess import DevicePreprocessor
    from headct_foundation_tpu.data.nifti import save_nifti
    from headct_foundation_tpu.data.transforms import extract_feature_preprocess
    from headct_foundation_tpu.models import ViT
    from headct_foundation_tpu.utils.torch_interop import tree_to_torch

    rng = np.random.RandomState(3)
    vol = (rng.rand(40, 36, 30) * 3000 - 1000).astype(np.float32)
    path = str(tmp_path / "scan.nii.gz")
    save_nifti(path, vol, np.diag([1.5, 1.25, 2.0, 1.0]))

    our = ViT(
        in_chans=3, img_size=24, patch_size=12, hidden_size=48, mlp_dim=96,
        num_layers=2, num_heads=4, pos_embed="learnable", qkv_bias=True,
    )
    params = jax.device_get(
        our.init(jax.random.PRNGKey(2), jnp.zeros((1, 3, 24, 24, 24)))["params"]
    )
    oracle = OracleViT(in_chans=3, img=24, patch=12, dim=48, mlp=96,
                       layers=2, heads=4).eval()
    oracle.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in tree_to_torch(params).items()}
    )

    # torch + scipy host path
    host_vol = extract_feature_preprocess(path, (24, 24, 24), 3)
    with torch.no_grad():
        ref_cls = oracle(torch.from_numpy(host_vol[None]))[:, 0, :].numpy()

    # ours: on-device preprocessing feeding the JAX ViT directly
    dev_vol = DevicePreprocessor((24, 24, 24), 3)(path)
    out, _ = our.apply({"params": jax.tree.map(jnp.asarray, params)}, dev_vol[None])
    our_cls = np.asarray(out[:, 0, :])

    cos = float(
        np.sum(our_cls * ref_cls)
        / (np.linalg.norm(our_cls) * np.linalg.norm(ref_cls))
    )
    assert cos >= 0.999, cos
    np.testing.assert_allclose(our_cls, ref_cls, atol=1e-3, rtol=1e-2)
