"""Retrieval mAP evaluation CLI.

Embeds every scan in a labeled manifest with a frozen pretrained encoder and
reports per-pathology retrieval mAP (the reference's
images/mAP_{RSNA,CQ500}_Retrieval.png protocol; BASELINE.md).

Usage:
  python tools/eval_retrieval.py --cfg configs/downstream/vit_HeadCT_cq500.yaml \
      --csv datasets/cq500_test_label.csv --checkpoint model.ckpt \
      [--labels ICH IPH IVH SDH EDH SAH] [--batch-size 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def _respect_platform_env():
    try:
        from headct_foundation_tpu.parallel.mesh import respect_jax_platforms_env

        respect_jax_platforms_env()
    except Exception:
        pass


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--csv", required=True, help="manifest with img_path + label columns")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--labels", nargs="+", default=None,
                    help="label columns to evaluate (default: all non-path columns)")
    ap.add_argument("--batch-size", type=int, default=8)
    args = ap.parse_args()

    from headct_foundation_tpu.config import default_config
    from headct_foundation_tpu.eval.retrieval import retrieval_map_per_class
    from headct_foundation_tpu.feature_extraction import build_extractor_from_config

    cfg = default_config()
    cfg.merge_from_file(args.cfg)

    df = pd.read_csv(args.csv)
    label_cols = args.labels or [c for c in df.columns if c != "img_path"]

    extractor = build_extractor_from_config(cfg, checkpoint_path=args.checkpoint)
    feats = extractor.extract_from_files(list(df["img_path"]), batch_size=args.batch_size)

    label_dict = {c: df[c].to_numpy().astype(int) for c in label_cols}
    results = retrieval_map_per_class(feats, label_dict)
    print(json.dumps({f"mAP_{k}": round(v, 4) for k, v in results.items()}))


if __name__ == "__main__":
    _respect_platform_env()
    main()
