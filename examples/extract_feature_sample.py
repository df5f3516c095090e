"""Feature-extraction walkthrough (reference surface:
notebooks/extract_feature_sample.ipynb).

Builds the ViT-B/12 @ 96^3 encoder, loads pretrained weights (reference .pt
checkpoints work directly — module./backbone./_orig_mod. prefixes are
stripped, strict=False), preprocesses NIfTI scans with the notebook's
transform order, and extracts (last_layer_out, all_layers_out) + CLS features
with optional LinearClassifier logits.

Run:  python examples/extract_feature_sample.py scan1.nii.gz [scan2.nii.gz ...]
      [--checkpoint path/to/checkpoint.{pt,ckpt}]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _respect_platform_env():
    try:
        from headct_foundation_tpu.parallel.mesh import respect_jax_platforms_env

        respect_jax_platforms_env()
    except Exception:
        pass


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("scans", nargs="+", help="NIfTI files (.nii/.nii.gz)")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--classifier-checkpoint", default=None)
    args = ap.parse_args()

    from headct_foundation_tpu.feature_extraction import FeatureExtractor
    from headct_foundation_tpu.models.classifier import LinearClassifier

    # Cell 2: model hyper-parameters (96^3, patch 12, 768 dim, 12 layers,
    # 12 heads, 3 channels, sincos, conv patch embed).
    extractor = FeatureExtractor(
        checkpoint_path=args.checkpoint,
        img_size=96, patch_size=12, in_chans=3, hidden_size=768,
        mlp_dim=3072, num_layers=12, num_heads=12, pos_embed="sincos",
        qkv_bias=True,
    )
    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree.leaves(extractor.params)
    )
    print(f"encoder parameters: {n_params / 1e6:.1f}M")

    # Cells 7-12: preprocess + forward.
    vols = np.stack([extractor.preprocess(p) for p in args.scans])
    last_layer_out, all_layers_out = extractor(vols)
    print(f"last_layer_out: {last_layer_out.shape}")          # [B, 513, 768]
    print(f"all_layers_out: {len(all_layers_out)} x {all_layers_out[0].shape}")

    # Cells 16-17: CLS feature -> LinearClassifier logits.
    cls_feature = last_layer_out[:, 0, :]
    print(f"CLS features: {cls_feature.shape}")

    clf = LinearClassifier(dim=768, num_classes=2)
    variables = clf.init(jax.random.PRNGKey(0), cls_feature)
    if args.classifier_checkpoint:
        from headct_foundation_tpu.utils.torch_interop import (
            load_torch_state_dict,
            merge_params,
            torch_to_tree,
        )

        sd = load_torch_state_dict(args.classifier_checkpoint)
        tree = torch_to_tree(sd)
        params, _, _ = merge_params(variables["params"], tree["params"])
        stats, _, _ = merge_params(
            variables.get("batch_stats", {}), tree["batch_stats"]
        )
        variables = {"params": params, "batch_stats": stats}
    logits = clf.apply(variables, cls_feature, use_running_average=True)
    probs = jax.nn.softmax(logits, axis=-1)
    for path, p in zip(args.scans, np.asarray(probs)):
        print(f"{os.path.basename(path)}: P(positive) = {p[1]:.4f}")


if __name__ == "__main__":
    _respect_platform_env()
    main()
