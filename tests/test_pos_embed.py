import numpy as np
import pytest
import torch

from headct_foundation_tpu.models.pos_embed import (
    build_sincos_position_embedding,
    interpolate_pos_embed,
    nth_root,
)


def _torch_sincos_3d(grid_size, embed_dim, temperature=10000.0):
    """Independent torch implementation of the documented reference formula
    (SURVEY.md §2.3: dim/6 sin/cos per axis, temp 10000, h/w arange swap)."""
    h, w, d = grid_size
    gh = torch.arange(w, dtype=torch.float32)
    gw = torch.arange(h, dtype=torch.float32)
    gd = torch.arange(d, dtype=torch.float32)
    gh, gw, gd = torch.meshgrid(gh, gw, gd, indexing="ij")
    pos_dim = embed_dim // 6
    omega = 1.0 / (temperature ** (torch.arange(pos_dim, dtype=torch.float32) / pos_dim))
    out_h = torch.einsum("m,d->md", gh.flatten(), omega)
    out_w = torch.einsum("m,d->md", gw.flatten(), omega)
    out_d = torch.einsum("m,d->md", gd.flatten(), omega)
    return torch.cat(
        [out_w.sin(), out_w.cos(), out_h.sin(), out_h.cos(), out_d.sin(), out_d.cos()],
        dim=1,
    )[None]


@pytest.mark.parametrize("grid", [(8, 8, 8), (4, 6, 5)])
def test_sincos_matches_reference_formula(grid):
    emb = build_sincos_position_embedding(grid, 768, 3)
    ref = _torch_sincos_3d(grid, 768).numpy()
    assert emb.shape == (1, np.prod(grid), 768)
    np.testing.assert_allclose(emb, ref, atol=2e-6)


def test_sincos_2d_shape():
    emb = build_sincos_position_embedding((4, 4), 64, 2)
    assert emb.shape == (1, 16, 64)
    # first position is all (sin 0, cos 0) pairs
    np.testing.assert_allclose(emb[0, 0, :16], 0.0, atol=1e-7)
    np.testing.assert_allclose(emb[0, 0, 16:32], 1.0, atol=1e-7)


def test_nth_root():
    assert nth_root(512, 3) == 8
    assert nth_root(511, 3) == 7
    assert nth_root(64, 2) == 8


def test_interpolate_identity():
    pe = np.random.RandomState(0).randn(1, 8**3 + 1, 30).astype(np.float32)
    out = interpolate_pos_embed(pe, num_extra_tokens=1, new_num_patches=512)
    np.testing.assert_array_equal(np.asarray(out), pe)


def test_interpolate_matches_torch_trilinear():
    rng = np.random.RandomState(1)
    pe = rng.randn(1, 4**3 + 1, 12).astype(np.float32)
    out = np.asarray(interpolate_pos_embed(pe, num_extra_tokens=1, new_num_patches=8**3))
    assert out.shape == (1, 8**3 + 1, 12)
    # extra token untouched
    np.testing.assert_array_equal(out[:, 0], pe[:, 0])
    # grid tokens match torch trilinear align_corners=False
    t = torch.from_numpy(pe[:, 1:]).reshape(1, 4, 4, 4, 12).permute(0, 4, 1, 2, 3)
    t = torch.nn.functional.interpolate(t, size=(8, 8, 8), mode="trilinear",
                                        align_corners=False)
    t = t.permute(0, 2, 3, 4, 1).reshape(1, -1, 12).numpy()
    np.testing.assert_allclose(out[:, 1:], t, atol=1e-5)
