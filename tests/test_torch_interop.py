"""Checkpoint import parity: torch state_dicts -> our trees, with an
end-to-end numeric check against a torch oracle ViT implementing the
documented reference architecture (SURVEY.md §2.3)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from headct_foundation_tpu.models import ViT
from headct_foundation_tpu.utils.torch_interop import (
    merge_params,
    strip_prefixes,
    torch_to_tree,
)


# ---- torch oracle: pre-norm ViT block per the documented formulas ----
class OracleBlock(nn.Module):
    def __init__(self, dim, mlp_dim, heads, qkv_bias):
        super().__init__()
        self.att_norm = nn.LayerNorm(dim)
        self.ffn_norm = nn.LayerNorm(dim)
        self.heads = heads

        class Attn(nn.Module):
            def __init__(self):
                super().__init__()
                self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
                self.proj = nn.Linear(dim, dim)

            def forward(self, x):
                B, N, C = x.shape
                qkv = self.qkv(x).reshape(B, N, 3, heads, C // heads).permute(2, 0, 3, 1, 4)
                q, k, v = qkv[0], qkv[1], qkv[2]
                y = F.scaled_dot_product_attention(q, k, v)
                return self.proj(y.transpose(1, 2).reshape(B, N, C))

        class Mlp(nn.Module):
            def __init__(self):
                super().__init__()
                self.linear1 = nn.Linear(dim, mlp_dim)
                self.linear2 = nn.Linear(mlp_dim, dim)

            def forward(self, x):
                return self.linear2(F.gelu(self.linear1(x)))

        self.attn = Attn()
        self.mlp = Mlp()

    def forward(self, x):
        x = x + self.attn(self.att_norm(x))
        x = x + self.mlp(self.ffn_norm(x))
        return x


class OracleViT(nn.Module):
    def __init__(self, in_chans=2, img=24, patch=12, dim=48, mlp=96, layers=2, heads=4):
        super().__init__()

        class PE(nn.Module):
            def __init__(self):
                super().__init__()
                self.patch_embeddings = nn.Conv3d(in_chans, dim, patch, stride=patch)
                n = (img // patch) ** 3
                self.position_embeddings = nn.Parameter(torch.randn(1, n, dim) * 0.02)

            def forward(self, x):
                x = self.patch_embeddings(x).flatten(2).transpose(-1, -2)
                return x + self.position_embeddings

        self.patch_embedding = PE()
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.blocks = nn.ModuleList(
            [OracleBlock(dim, mlp, heads, qkv_bias=True) for _ in range(layers)]
        )
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        x = self.patch_embedding(x)
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1)
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)


def test_vit_forward_parity_with_torch_oracle(monkeypatch):
    monkeypatch.setenv("HEADCT_EXACT_GELU", "1")  # match torch's erf GELU
    torch.manual_seed(0)
    oracle = OracleViT().eval()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    tree = torch_to_tree(sd)["params"]

    our = ViT(
        in_chans=2, img_size=24, patch_size=12, hidden_size=48, mlp_dim=96,
        num_layers=2, num_heads=4, pos_embed="learnable", qkv_bias=True,
    )
    x_np = np.random.RandomState(0).randn(2, 2, 24, 24, 24).astype(np.float32)
    init_params = our.init(jax.random.PRNGKey(0), jnp.asarray(x_np))["params"]
    merged, missing, unexpected = merge_params(init_params, tree)
    assert not missing, missing
    assert not unexpected, unexpected

    with torch.no_grad():
        ref = oracle(torch.from_numpy(x_np)).numpy()
    ours, _ = our.apply({"params": merged}, jnp.asarray(x_np))
    ours = np.asarray(ours)

    assert ours.shape == ref.shape
    cos = np.sum(ours * ref) / (np.linalg.norm(ours) * np.linalg.norm(ref))
    assert cos > 0.9999, cos
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_prefix_strip():
    sd = {"module.backbone.blocks.0.attn.qkv.weight": 1, "_orig_mod.norm.weight": 2}
    out = strip_prefixes(sd)
    assert set(out) == {"blocks.0.attn.qkv.weight", "norm.weight"}


def test_dino_head_sequential_mapping():
    # no-BN layout: Linears at 0, 2, 4
    sd = {
        "mlp.0.weight": np.zeros((8, 4), np.float32),
        "mlp.0.bias": np.zeros((8,), np.float32),
        "mlp.2.weight": np.zeros((8, 8), np.float32),
        "mlp.2.bias": np.zeros((8,), np.float32),
        "mlp.4.weight": np.zeros((3, 8), np.float32),
        "mlp.4.bias": np.zeros((3,), np.float32),
        "last_layer.weight_g": np.ones((16, 1), np.float32),
        "last_layer.weight_v": np.zeros((16, 3), np.float32),
    }
    tree = torch_to_tree(sd)["params"]
    assert set(tree) == {"mlp_0", "mlp_1", "mlp_2", "last_layer"}
    assert tree["mlp_0"]["kernel"].shape == (4, 8)
    assert tree["last_layer"]["weight_v"].shape == (16, 3)

    # BN layout: Linear 0,3,6; BN 1,4
    sd_bn = {
        "mlp.0.weight": np.zeros((8, 4), np.float32),
        "mlp.1.weight": np.zeros((8,), np.float32),
        "mlp.1.bias": np.zeros((8,), np.float32),
        "mlp.1.running_mean": np.zeros((8,), np.float32),
        "mlp.1.running_var": np.ones((8,), np.float32),
        "mlp.1.num_batches_tracked": np.zeros((), np.int64),
        "mlp.3.weight": np.zeros((8, 8), np.float32),
        "mlp.4.running_mean": np.zeros((8,), np.float32),
        "mlp.4.running_var": np.ones((8,), np.float32),
        "mlp.6.weight": np.zeros((3, 8), np.float32),
    }
    out = torch_to_tree(sd_bn)
    assert set(out["params"]) == {"mlp_0", "mlp_bn_0", "mlp_1", "mlp_2"}
    assert set(out["batch_stats"]) == {"mlp_bn_0", "mlp_bn_1"}
    assert out["params"]["mlp_bn_0"]["scale"].shape == (8,)


def test_merge_reports_shape_mismatch():
    target = {"a": np.zeros((2, 2)), "b": np.zeros(3)}
    source = {"a": np.ones((2, 2)), "b": np.ones(4), "c": np.ones(1)}
    merged, missing, unexpected = merge_params(target, source)
    np.testing.assert_array_equal(merged["a"], 1)
    np.testing.assert_array_equal(merged["b"], 0)  # mismatched shape skipped
    assert any("b" in u for u in unexpected)
    assert any("c" in u for u in unexpected)


def test_tree_to_torch_roundtrip():
    """Export our ViT params to torch convention and re-import: identical."""
    from headct_foundation_tpu.utils.torch_interop import tree_to_torch

    our = ViT(
        in_chans=3, img_size=24, patch_size=12, hidden_size=48, mlp_dim=96,
        num_layers=2, num_heads=4, pos_embed="learnable", qkv_bias=True,
    )
    x = jnp.zeros((1, 3, 24, 24, 24))
    params = jax.device_get(our.init(jax.random.PRNGKey(1), x)["params"])

    sd = tree_to_torch(params)
    # torch-convention names present
    assert "patch_embedding.patch_embeddings.weight" in sd
    assert sd["patch_embedding.patch_embeddings.weight"].shape == (48, 3, 12, 12, 12)
    assert "blocks.0.attn.qkv.weight" in sd
    assert sd["blocks.0.attn.qkv.weight"].shape == (144, 48)

    back = torch_to_tree(sd)["params"]
    merged, missing, unexpected = merge_params(params, back)
    assert not missing, missing
    assert not unexpected, unexpected
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(merged)[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(pa))


def test_tree_to_torch_dino_head_roundtrip():
    from headct_foundation_tpu.models import DINOHead
    from headct_foundation_tpu.utils.torch_interop import tree_to_torch

    head = DINOHead(in_dim=16, out_dim=32, nlayers=3, hidden_dim=8,
                    bottleneck_dim=4)
    params = jax.device_get(
        head.init(jax.random.PRNGKey(0), jnp.zeros((1, 16)))["params"]
    )
    sd = tree_to_torch(params)
    assert "mlp.0.weight" in sd and "mlp.2.weight" in sd and "mlp.4.weight" in sd
    assert "last_layer.weight_v" in sd
    back = torch_to_tree(sd)["params"]
    merged, missing, unexpected = merge_params(params, back)
    assert not missing and not unexpected, (missing, unexpected)


def test_merge_params_non_cubic_pos_embed_stays_strict_false():
    """Regression: a shape-mismatched pos-embed whose token count is not a
    cubic grid (e.g. CLS-inclusive 513 = 8^3 + 1 from foreign tooling) must
    be reported as unexpected, not crash the whole load."""
    target = {"position_embeddings": np.zeros((1, 27, 8), np.float32)}
    source = {"position_embeddings": np.ones((1, 513, 8), np.float32)}
    merged, missing, unexpected = merge_params(target, source)
    assert any("position_embeddings" in u for u in unexpected)
    np.testing.assert_array_equal(merged["position_embeddings"], 0)

    # cubic-grid mismatches still interpolate (8 -> 27 tokens)
    src_cube = {"position_embeddings": np.ones((1, 8, 8), np.float32)}
    merged2, _, unexpected2 = merge_params(target, src_cube)
    assert not unexpected2
    assert merged2["position_embeddings"].shape == (1, 27, 8)


def test_bn_dino_head_export_roundtrip():
    """BN-layout DINO head ([Linear, BN, GELU]* -> Linears at mlp.0/3/6, BNs
    at mlp.1/4): tree_to_torch must use the stride-3 Sequential indexing —
    regression for mlp_1 landing on the GELU slot (mlp.2) and mlp_2
    colliding with mlp_bn_1 at mlp.4."""
    import jax
    import jax.numpy as jnp

    from headct_foundation_tpu.models.dino_head import DINOHead
    from headct_foundation_tpu.utils.torch_interop import (
        torch_to_tree,
        tree_to_torch,
    )

    head = DINOHead(in_dim=16, out_dim=32, use_bn=True, nlayers=3,
                    hidden_dim=24, bottleneck_dim=8)
    variables = head.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 16)), use_running_average=False
    )
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables.get("batch_stats", {}))

    sd = tree_to_torch(params, batch_stats=stats)
    # Linear weights at Sequential indices 0/3/6; BN at 1/4 with weight,
    # bias AND running stats; nothing on the GELU slots (2/5)
    assert "mlp.0.weight" in sd and "mlp.3.weight" in sd and "mlp.6.weight" in sd
    for bn in ("mlp.1", "mlp.4"):
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            assert f"{bn}.{leaf}" in sd, (bn, leaf, sorted(sd))
    assert not any(k.startswith(("mlp.2.", "mlp.5.")) for k in sd), sorted(sd)
    # Linear weight must be the kernel transpose, not a BN scale
    np.testing.assert_allclose(
        sd["mlp.3.weight"], np.asarray(params["mlp_1"]["kernel"]).T
    )

    # full round trip back through the importer
    back = torch_to_tree(sd)
    jax.tree.map(
        np.testing.assert_allclose, back["params"], params
    )
    jax.tree.map(
        np.testing.assert_allclose, back["batch_stats"], stats
    )


# ---- checkpoint classification: content routing without code execution ----

def test_classify_checkpoint_routes_by_content(tmp_path):
    import pickle

    from headct_foundation_tpu.utils.torch_interop import classify_checkpoint

    # ours: plain pickle of a nested numpy dict with 'params'
    ours = tmp_path / "ours.pt"  # extension deliberately misleading
    payload = {"params": {"w": np.arange(4, dtype=np.float32)}, "epoch": 3}
    with open(ours, "wb") as f:
        pickle.dump(payload, f)
    is_torch, loaded = classify_checkpoint(str(ours))
    assert not is_torch
    np.testing.assert_array_equal(loaded["params"]["w"], payload["params"]["w"])
    assert loaded["epoch"] == 3

    # torch zip checkpoint
    tz = tmp_path / "torch_zip.ckpt"
    torch.save({"state_dict": {"w": torch.zeros(2)}}, str(tz))
    assert classify_checkpoint(str(tz)) == (True, None)

    # legacy (non-zip) torch pickle: needs torch globals -> classified torch
    tl = tmp_path / "torch_legacy.ckpt"
    torch.save({"state_dict": {"w": torch.zeros(2)}}, str(tl),
               _use_new_zipfile_serialization=False)
    assert classify_checkpoint(str(tl)) == (True, None)


def test_classify_checkpoint_never_executes_foreign_pickles(tmp_path):
    """A malicious pickle must be classified (as non-native) WITHOUT its
    payload running (ADVICE r3: plain pickle.load here was arbitrary code
    execution during classification)."""
    import pickle

    from headct_foundation_tpu.utils.torch_interop import classify_checkpoint

    sentinel = tmp_path / "pwned"

    class Evil:
        def __reduce__(self):
            import os

            return (os.system, (f"touch {sentinel}",))

    evil_path = tmp_path / "evil.ckpt"
    with open(evil_path, "wb") as f:
        pickle.dump({"params": Evil()}, f)

    is_torch, loaded = classify_checkpoint(str(evil_path))
    assert is_torch and loaded is None  # routed to the torch importer
    assert not sentinel.exists(), "classification executed pickle payload"
