"""Render per-layer CLS attention maps over head-CT volume slices.

The reference ships this surface as notebooks/visualization_sample.ipynb on
top of the ``save_attn`` buffers (reference: src/models/attentionblock.py:
36-66); here the same maps come from ``FeatureExtractor.attention_maps`` /
``cls_attention_volume`` and are drawn as heatmap overlays on the mid
axial/coronal/sagittal slices of the preprocessed volume.

Usage:
  python examples/visualize_attention.py [--scan path.nii.gz]
      [--checkpoint ckpt] [--layers 3 7 11] [--head N] [--out attn.png]

With no --scan, a synthetic head-like phantom is generated so the example
runs end-to-end out of the box.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synthetic_head_scan(out_dir: str, size: int = 160) -> str:
    """Write a crude head phantom NIfTI: an ellipsoidal 'skull' shell of
    bone HU around soft-tissue 'brain' with a bright lesion blob."""
    from headct_foundation_tpu.data.nifti import save_nifti

    rng = np.random.RandomState(0)
    g = np.linspace(-1, 1, size)
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    r = np.sqrt(xx**2 + yy**2 + (zz * 1.3) ** 2)
    vol = np.full((size, size, size), -1000.0, np.float32)  # air
    vol[r < 0.92] = 900.0                                   # skull shell
    vol[r < 0.82] = 35.0                                    # brain parenchyma
    vol[r < 0.82] += rng.randn(*vol[r < 0.82].shape).astype(np.float32) * 4
    lesion = np.sqrt((xx - 0.3) ** 2 + (yy + 0.2) ** 2 + (zz - 0.1) ** 2) < 0.12
    vol[lesion & (r < 0.82)] = 75.0                         # acute blood
    vol = np.round(vol)
    path = os.path.join(out_dir, "phantom.nii.gz")
    save_nifti(path, vol, np.diag([1.0, 1.0, 1.0, 1.0]))
    return path


def render(vol_c, attn_by_layer, layers, out_path: str) -> None:
    """vol_c: [R, R, R] display channel; attn_by_layer: {layer: [R, R, R]}."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    R = vol_c.shape[0]
    mids = {"axial": 2, "coronal": 1, "sagittal": 0}
    fig, axes = plt.subplots(
        len(mids), len(layers), figsize=(3.2 * len(layers), 3.2 * len(mids)),
        squeeze=False,
    )
    for col, layer in enumerate(layers):
        att = attn_by_layer[layer]
        att = (att - att.min()) / max(att.max() - att.min(), 1e-12)
        for row, (name, axis) in enumerate(mids.items()):
            sl = [slice(None)] * 3
            sl[axis] = R // 2
            ax = axes[row][col]
            ax.imshow(vol_c[tuple(sl)].T, cmap="gray", origin="lower")
            ax.imshow(att[tuple(sl)].T, cmap="inferno", alpha=0.45,
                      origin="lower")
            ax.set_xticks([])
            ax.set_yticks([])
            if row == 0:
                ax.set_title(f"layer {layer}")
            if col == 0:
                ax.set_ylabel(name)
    fig.suptitle("CLS attention over volume slices")
    fig.tight_layout()
    fig.savefig(out_path, dpi=140)
    plt.close(fig)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan", default=None, help="NIfTI path (default: phantom)")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--layers", type=int, nargs="+", default=[3, 7, 11])
    ap.add_argument("--head", type=int, default=None,
                    help="single attention head (default: mean over heads)")
    ap.add_argument("--out", default="attention_maps.png")
    args = ap.parse_args()

    from headct_foundation_tpu.feature_extraction import FeatureExtractor

    scan = args.scan
    tmp = None
    if scan is None:
        tmp = tempfile.mkdtemp(prefix="headct_attn_")
        scan = synthetic_head_scan(tmp)
        print(f"no --scan given; synthesized phantom at {scan}")

    extractor = FeatureExtractor(checkpoint_path=args.checkpoint)
    vol = np.asarray(extractor.preprocess(scan))  # [C, R, R, R], notebook order
    attn = {
        layer: extractor.cls_attention_volume(vol[None], layer=layer,
                                              head=args.head)[0]
        for layer in args.layers
    }
    render(vol[0], attn, args.layers, args.out)
    print(f"wrote {args.out} (layers {args.layers}, "
          f"{'mean over heads' if args.head is None else f'head {args.head}'})")


if __name__ == "__main__":
    main()
