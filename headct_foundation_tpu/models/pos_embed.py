"""3D sin-cos positional embeddings and resolution interpolation.

Numerically matches the reference implementation (reference:
src/utils/pos_embed.py:10-85), including its axis quirk for 3D grids where
``grid_h = arange(w)`` and ``grid_w = arange(h)`` before the meshgrid, and the
channel concatenation order [sin(w), cos(w), sin(h), cos(h), sin(d), cos(d)]
(reference: src/utils/pos_embed.py:54-78). For the cubic grids used throughout
(8x8x8 patches of a 96^3 volume) the quirk is a no-op, but we reproduce it so
embeddings match bit-for-bit on non-cubic grids too.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


def _to_tuple(x: Union[int, Sequence[int]], n: int) -> Tuple[int, ...]:
    if isinstance(x, (int, np.integer)):
        return (int(x),) * n
    t = tuple(int(v) for v in x)
    assert len(t) == n, f"expected {n} dims, got {t}"
    return t


def build_sincos_position_embedding(
    grid_size: Union[int, Sequence[int]],
    embed_dim: int,
    spatial_dims: int = 3,
    temperature: float = 10000.0,
) -> np.ndarray:
    """Fixed sin-cos position embedding of shape [1, prod(grid), embed_dim].

    Computed in float64 numpy then cast to float32, matching the fp32 torch
    reference to ~1e-7.
    """
    if spatial_dims == 2:
        h, w = _to_tuple(grid_size, 2)
        assert embed_dim % 4 == 0, "embed_dim must be divisible by 4 for 2D sincos"
        pos_dim = embed_dim // 4
        omega = 1.0 / (temperature ** (np.arange(pos_dim, dtype=np.float64) / pos_dim))
        gh, gw = np.meshgrid(np.arange(h, dtype=np.float64),
                             np.arange(w, dtype=np.float64), indexing="ij")
        out_h = np.einsum("m,d->md", gh.flatten(), omega)
        out_w = np.einsum("m,d->md", gw.flatten(), omega)
        emb = np.concatenate(
            [np.sin(out_h), np.cos(out_h), np.sin(out_w), np.cos(out_w)], axis=1
        )
    elif spatial_dims == 3:
        h, w, d = _to_tuple(grid_size, 3)
        assert embed_dim % 6 == 0, "embed_dim must be divisible by 6 for 3D sincos"
        pos_dim = embed_dim // 6
        omega = 1.0 / (temperature ** (np.arange(pos_dim, dtype=np.float64) / pos_dim))
        # Reference quirk: the first meshgrid axis ranges over `w`, the second
        # over `h` (reference: src/utils/pos_embed.py:54-56).
        gh, gw, gd = np.meshgrid(
            np.arange(w, dtype=np.float64),
            np.arange(h, dtype=np.float64),
            np.arange(d, dtype=np.float64),
            indexing="ij",
        )
        out_h = np.einsum("m,d->md", gh.flatten(), omega)
        out_w = np.einsum("m,d->md", gw.flatten(), omega)
        out_d = np.einsum("m,d->md", gd.flatten(), omega)
        emb = np.concatenate(
            [
                np.sin(out_w), np.cos(out_w),
                np.sin(out_h), np.cos(out_h),
                np.sin(out_d), np.cos(out_d),
            ],
            axis=1,
        )
    else:
        raise NotImplementedError(f"spatial_dims={spatial_dims} not implemented")
    return emb[None].astype(np.float32)


def nth_root(n: int, k: int) -> int:
    """Greatest integer x with x**k <= n (reference: src/utils/pos_embed.py:87-95)."""
    x = int(n ** (1.0 / k))
    while (x + 1) ** k <= n:
        x += 1
    while x**k > n:
        x -= 1
    return x


def interpolate_pos_embed(
    pos_embed: jax.Array,
    num_extra_tokens: int,
    new_num_patches: int = None,
    spatial_dims: int = 3,
    new_grid: tuple = None,
) -> jax.Array:
    """Interpolate a [1, T, C] position embedding to a new grid.

    Used both at checkpoint load when the stored grid differs from the model's
    (reference: src/utils/pos_embed.py:102-153) and inside the forward pass for
    dynamic-resolution inputs (reference: src/utils/pos_embed.py:164-218).
    Extra (CLS/register) tokens pass through unchanged. Trilinear/bicubic with
    half-pixel centers (torch ``align_corners=False`` == jax.image 'linear').

    The SOURCE grid must be cubic (a count alone cannot disambiguate grids;
    stored embeds are built for cubic ``img_size``). The target is cubic when
    given as ``new_num_patches``; pass ``new_grid=(gh, gw, gd)`` for non-cubic
    dynamic-resolution targets — a non-cubic grid whose count happens to be a
    perfect cube would otherwise be silently mis-assigned.
    """
    embed_dim = pos_embed.shape[-1]
    orig_num_patches = pos_embed.shape[-2] - num_extra_tokens
    orig_size = nth_root(orig_num_patches, spatial_dims)
    if orig_size**spatial_dims != orig_num_patches:
        raise ValueError(
            f"interpolate_pos_embed requires a cubic source grid; got "
            f"{orig_num_patches} patches (not a perfect {spatial_dims}-cube)"
        )
    if new_grid is not None:
        new_grid = tuple(int(g) for g in new_grid)
        if len(new_grid) != spatial_dims:
            raise ValueError(f"new_grid {new_grid} vs spatial_dims {spatial_dims}")
    else:
        if new_num_patches is None:
            raise ValueError("pass new_num_patches or new_grid")
        new_size = nth_root(new_num_patches, spatial_dims)
        if new_size**spatial_dims != new_num_patches:
            raise ValueError(
                f"target count {new_num_patches} is not a perfect "
                f"{spatial_dims}-cube; pass new_grid=(gh, gw, gd) instead"
            )
        new_grid = (new_size,) * spatial_dims
    if new_grid == (orig_size,) * spatial_dims:
        return pos_embed

    extra = pos_embed[:, :num_extra_tokens]
    tokens = pos_embed[:, num_extra_tokens:]
    grid_shape = (orig_size,) * spatial_dims
    tokens = tokens.reshape((1,) + grid_shape + (embed_dim,))
    new_shape = (1,) + new_grid + (embed_dim,)
    tokens = jax.image.resize(tokens, new_shape, method="linear")
    tokens = tokens.reshape(1, int(np.prod(new_grid)), embed_dim)
    return jnp.concatenate([extra, tokens], axis=1)
