"""Feature-extraction API (reference surface: notebooks/extract_feature_sample.ipynb).

Reproduces the notebook flow (SURVEY.md §3.4):

  1. build a bare ViT (96^3, patch 12, ViT-B, 3 channels, sincos),
  2. load pretrained weights with module./backbone./_orig_mod. prefix
     stripping and strict=False (notebook cell 3),
  3. preprocess NIfTI files with the notebook's transform ORDER — resize
     BEFORE windowing (cell 7; note this differs from training's
     loading_transforms, which windows before resize),
  4. forward -> (last_layer_out [B, 513, 768], all_layers_out: 12 x same)
     (cell 12); CLS = last_layer_out[:, 0, :]; optional LinearClassifier
     logits (cells 16-17).

Also provides batched embedding extraction for retrieval evaluation
(eval/retrieval.py).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from headct_foundation_tpu.data.transforms import extract_feature_preprocess
from headct_foundation_tpu.models.vit import ViT
from headct_foundation_tpu.utils.torch_interop import load_pretrained_into


class FeatureExtractor:
    """Bare ViT feature extractor with notebook-parity preprocessing."""

    def __init__(
        self,
        checkpoint_path: Optional[str] = None,
        img_size: int = 96,
        patch_size: int = 12,
        in_chans: int = 3,
        hidden_size: int = 768,
        mlp_dim: int = 3072,
        num_layers: int = 12,
        num_heads: int = 12,
        pos_embed: str = "sincos",
        num_register_tokens: int = 0,
        qkv_bias: bool = True,
        norm_layer: str = "layernorm",
        dtype=jnp.float32,
        rng: Optional[jax.Array] = None,
    ):
        self.img_size = img_size
        self.in_chans = in_chans
        self.model = ViT(
            in_chans=in_chans,
            img_size=img_size,
            patch_size=patch_size,
            hidden_size=hidden_size,
            mlp_dim=mlp_dim,
            num_layers=num_layers,
            num_heads=num_heads,
            pos_embed=pos_embed,
            classification=False,
            num_register_tokens=num_register_tokens,
            qkv_bias=qkv_bias,
            norm_layer=norm_layer,
            dtype=dtype,
        )
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        sample = jnp.zeros((1, in_chans, img_size, img_size, img_size), dtype)
        self.params = self.model.init(rng, sample)["params"]
        if checkpoint_path:
            self.params = jax.tree.map(
                jnp.asarray,
                load_pretrained_into(
                    jax.device_get(self.params), checkpoint_path,
                    norm_layer=norm_layer,
                ),
            )
        self._forward = jax.jit(
            lambda params, x: self.model.apply({"params": params}, x)
        )
        self._device_prep = None

    def preprocess(self, nifti_path: str):
        """NIfTI path -> [C, R, R, R] float32 (notebook transform order:
        resize BEFORE windowing).

        Default: the ON-DEVICE pipeline (data/device_preprocess.py) — the
        1 mm CUBIC resample, crop+area-resize and windowing run as TPU
        matmuls and the result stays device-resident for the forward pass;
        ~10x lower latency than the host paths and exact scipy resample
        parity. HEADCT_DEVICE_PREPROCESS=0 falls back to the host paths:
        native C++ when built (linear resample), else python/scipy (cubic,
        HEADCT_NATIVE=0)."""
        import os

        if os.environ.get("HEADCT_DEVICE_PREPROCESS", "1") != "0":
            if self._device_prep is None:
                from headct_foundation_tpu.data.device_preprocess import (
                    DevicePreprocessor,
                )

                self._device_prep = DevicePreprocessor(
                    (self.img_size,) * 3, self.in_chans
                )
            return self._device_prep(nifti_path)
        if os.environ.get("HEADCT_NATIVE", "1") != "0":
            from headct_foundation_tpu.data.native_loader import (
                load_and_preprocess_native,
                native_available,
            )

            if native_available():
                return load_and_preprocess_native(
                    nifti_path, (self.img_size,) * 3, self.in_chans, order=1
                ).astype(np.float32)
        return extract_feature_preprocess(
            nifti_path, (self.img_size,) * 3, self.in_chans
        )

    def __call__(
        self, x: np.ndarray
    ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        """[B, C, R, R, R] -> (last_layer_out [B, T, C], all_layers_out).
        Device-resident inputs (from the on-device preprocessor) are consumed
        in place — no host round trip."""
        if not isinstance(x, jax.Array):
            x = jnp.asarray(np.asarray(x, dtype=np.float32))
        elif x.dtype != jnp.float32:
            x = x.astype(jnp.float32)
        if x.ndim == 4:
            x = x[None]
        return self._forward(self.params, x)

    def extract_from_files(
        self, paths: Sequence[str], batch_size: int = 8, prefetch: int = 2,
        workers: int = 3,
    ) -> np.ndarray:
        """NIfTI paths -> CLS embeddings [N, hidden].

        Pipelined: ``workers`` background threads decode + preprocess scans
        ahead of the consumer (the gzip inflate is the dominant host cost;
        on a remote-attached chip the per-scan H2D/RTTs also overlap each
        other) while the main thread dispatches scan i's device forward and
        fetches batch i-1's result — throughput is the MAX of the pipeline
        stages instead of their sum. Results keep path order. ``prefetch``
        bounds the look-ahead window in batches."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        feats = []
        batch: List[np.ndarray] = []
        pending = []  # (device_out, n) — fetch AFTER dispatching the next batch

        def _flush():
            if not batch:
                return
            vols = jnp.stack([jnp.asarray(b) for b in batch])  # device or host
            n = len(batch)
            if n < batch_size:  # pad to the compiled batch shape
                vols = jnp.concatenate(
                    [vols, jnp.repeat(vols[-1:], batch_size - n, axis=0)]
                )
            out, _ = self(vols)
            pending.append((out, n))
            batch.clear()

        def _drain(keep_last: bool = False):
            while len(pending) > (1 if keep_last else 0):
                out, n = pending.pop(0)
                feats.append(np.asarray(out[:n, 0, :]))

        window = max(1, prefetch) * batch_size
        path_iter = iter(paths)
        futures: "deque" = deque()
        with ThreadPoolExecutor(
            max_workers=max(1, workers), thread_name_prefix="headct-extract"
        ) as pool:

            def _top_up():
                while len(futures) < window:
                    p = next(path_iter, None)
                    if p is None:
                        return
                    futures.append(pool.submit(self.preprocess, p))

            _top_up()
            while futures:
                batch.append(futures.popleft().result())
                _top_up()
                if len(batch) == batch_size:
                    _flush()                # dispatch batch k (async) ...
                    _drain(keep_last=True)  # ... fetch batch k-1 meanwhile
            _flush()
            _drain()
        if feats:
            return np.concatenate(feats, axis=0)
        # keep the [N, hidden] contract for empty inputs (consumers build
        # similarity matrices from the second axis)
        return np.zeros((0, self.model.hidden_size), np.float32)

    def cls_embedding(self, x: np.ndarray) -> np.ndarray:
        out, _ = self(x)
        return np.asarray(out[:, 0, :])

    def attention_maps(self, x: np.ndarray) -> List[np.ndarray]:
        """Per-layer post-softmax attention matrices for visualization
        (reference ``save_attn`` surface, src/models/attentionblock.py:36,
        62-64). Returns ``num_layers`` arrays of shape [B, H, T, T]."""
        x = jnp.asarray(np.asarray(x, dtype=np.float32))
        if x.ndim == 4:
            x = x[None]
        model = self.model.clone(save_attn=True)
        _, inter = model.apply(
            {"params": self.params}, x, mutable=["intermediates"]
        )
        maps = []
        blocks = inter["intermediates"]
        for i in range(self.model.num_layers):
            # sow stores a tuple of values per call; one call per forward
            maps.append(np.asarray(blocks[f"blocks_{i}"]["attn"]["att_mat"][0]))
        return maps

    @property
    def token_grid(self) -> Tuple[int, int, int]:
        """Patch-token grid (tokens per spatial axis)."""
        ps = self.model.patch_size
        ps = (ps,) * 3 if isinstance(ps, int) else tuple(ps)
        return tuple(self.img_size // p for p in ps)

    def cls_attention_volume(
        self, x: np.ndarray, layer: int = -1, head: Optional[int] = None
    ) -> np.ndarray:
        """CLS→patch attention of one layer, upsampled to volume resolution.

        [B or none, C, R, R, R] -> [B, R, R, R] float32 in [0, 1-ish]: the
        CLS query row of the chosen layer's post-softmax attention (mean over
        heads, or one ``head``), reshaped onto the patch-token grid and
        nearest-neighbor-upsampled so it overlays the input volume directly
        (visualization surface of the reference's ``save_attn`` buffers)."""
        maps = self.attention_maps(x)
        grid = self.token_grid
        att = cls_attention_grid(
            maps, grid, num_register_tokens=self.model.num_register_tokens,
            layer=layer, head=head,
        )
        reps = [self.img_size // g for g in grid]
        for axis, r in enumerate(reps):
            att = np.repeat(att, r, axis=axis + 1)
        return att


def cls_attention_grid(
    att_maps: Sequence[np.ndarray],
    grid: Sequence[int],
    num_register_tokens: int = 0,
    layer: int = -1,
    head: Optional[int] = None,
) -> np.ndarray:
    """Per-layer [B, H, T, T] attention stacks -> [B, *grid] CLS→patch maps.

    Token layout matches ViT.__call__: [CLS, registers..., patches...], so
    the CLS query row is sliced past itself and the register tokens before
    reshaping onto the spatial patch grid."""
    m = np.asarray(att_maps[layer])  # [B, H, T, T]
    skip = 1 + int(num_register_tokens)
    cls_row = m[:, :, 0, skip:]  # [B, H, P]
    att = cls_row.mean(axis=1) if head is None else cls_row[:, head]
    grid = tuple(int(g) for g in grid)
    assert att.shape[1] == int(np.prod(grid)), (att.shape, grid)
    return att.reshape(att.shape[0], *grid).astype(np.float32)


def build_extractor_from_config(config, checkpoint_path: Optional[str] = None,
                                **kwargs) -> FeatureExtractor:
    return FeatureExtractor(
        checkpoint_path=checkpoint_path,
        img_size=config.VIT.INPUT_SIZE,
        patch_size=config.VIT.PATCH_SIZE,
        in_chans=config.VIT.IN_CHANS,
        hidden_size=config.VIT.HIDDEN_SIZE,
        mlp_dim=config.VIT.MLP_DIM,
        num_layers=config.VIT.NUM_LAYERS,
        num_heads=config.VIT.NUM_HEADS,
        pos_embed=config.VIT.POS_EMBED,
        num_register_tokens=config.VIT.NUM_REGISTER_TOKENS,
        qkv_bias=config.VIT.USE_BIAS,
        norm_layer=config.VIT.NORM_LAYER,
        **kwargs,
    )
