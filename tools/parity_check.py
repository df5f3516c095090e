"""One-command embedding-parity check against a reference checkpoint.

BASELINE.json north star: per-scan feature cosine similarity >= 0.999 vs the
reference's checkpoints. This tool runs that check the day real weights
exist (and today, against a synthetic oracle checkpoint):

  python tools/parity_check.py --checkpoint ref.pt --nifti-dir scans/ \
      [--threshold 0.999]

For every ``*.nii / *.nii.gz`` under --nifti-dir it computes
  (a) OUR chain:   on-device preprocessing -> JAX ViT CLS embedding, with the
      ``.pt`` imported through the content-routed loader (module./backbone./
      _orig_mod. prefix strip + strict=False — the reference's own import
      contract, reference: src/utils/misc.py:72-96, notebook cell 3);
  (b) the REFERENCE chain: torch ViT implementing the reference formulas
      (tests/test_torch_interop.OracleViT) carrying the SAME weights, with
      scipy host preprocessing (notebook cells 7-12) — or, with
      ``--ref-embeddings ref.npz``, embeddings computed by the actual
      reference code (keys = scan basenames),
and reports per-scan cosines + PASS/FAIL vs --threshold.

``--make-oracle-ckpt out.pt`` writes a randomly initialized
reference-format checkpoint for self-testing the tool end-to-end.
"""

from __future__ import annotations

import argparse
import glob
import importlib.util
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np


def _load_oracle_module():
    """Import the torch oracle used by the parity test suite (tests/ is not a
    package; load by file path)."""
    path = os.path.join(_ROOT, "tests", "test_torch_interop.py")
    spec = importlib.util.spec_from_file_location("headct_parity_oracle", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _scan_paths(nifti_dir: str):
    paths = sorted(
        glob.glob(os.path.join(nifti_dir, "**", "*.nii*"), recursive=True)
    )
    if not paths:
        raise SystemExit(f"no NIfTI files under {nifti_dir}")
    return paths


def make_oracle_ckpt(out_path: str, args) -> None:
    """Reference-format torch checkpoint ({'state_dict': ...} with torch
    naming) from a randomly initialized oracle — self-test fixture."""
    import torch

    mod = _load_oracle_module()
    torch.manual_seed(args.seed)
    oracle = mod.OracleViT(
        in_chans=args.in_chans, img=args.img_size, patch=args.patch_size,
        dim=args.hidden_size, mlp=args.mlp_dim, layers=args.num_layers,
        heads=args.num_heads,
    ).eval()
    torch.save({"state_dict": oracle.state_dict()}, out_path)
    print(f"wrote oracle checkpoint: {out_path}")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", help="reference .pt (or our .ckpt)")
    ap.add_argument("--nifti-dir", help="directory of *.nii / *.nii.gz scans")
    ap.add_argument("--threshold", type=float, default=0.999)
    ap.add_argument("--ref-embeddings",
                    help="npz of reference-computed embeddings keyed by scan "
                         "basename (skips the torch-oracle forward)")
    ap.add_argument("--report", help="write the JSON report here")
    ap.add_argument("--make-oracle-ckpt", metavar="OUT_PT",
                    help="write a synthetic reference-format checkpoint and exit")
    # model geometry (defaults = flagship ViT-B feature extractor, notebook
    # cell 3; registers require --ref-embeddings since the oracle has none)
    ap.add_argument("--img-size", type=int, default=96)
    ap.add_argument("--patch-size", type=int, default=12)
    ap.add_argument("--in-chans", type=int, default=3)
    ap.add_argument("--hidden-size", type=int, default=768)
    ap.add_argument("--mlp-dim", type=int, default=3072)
    ap.add_argument("--num-layers", type=int, default=12)
    ap.add_argument("--num-heads", type=int, default=12)
    ap.add_argument("--pos-embed", default="sincos",
                    choices=["sincos", "learnable"])
    ap.add_argument("--registers", type=int, default=0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.make_oracle_ckpt:
        make_oracle_ckpt(args.make_oracle_ckpt, args)
        return
    if not args.checkpoint or not args.nifti_dir:
        ap.error("--checkpoint and --nifti-dir are required")

    # torch numerics use the erf GELU; match it exactly on our side
    os.environ.setdefault("HEADCT_EXACT_GELU", "1")

    import jax.numpy as jnp

    from headct_foundation_tpu.feature_extraction import FeatureExtractor

    paths = _scan_paths(args.nifti_dir)

    extractor = FeatureExtractor(
        checkpoint_path=args.checkpoint,
        img_size=args.img_size, patch_size=args.patch_size,
        in_chans=args.in_chans, hidden_size=args.hidden_size,
        mlp_dim=args.mlp_dim, num_layers=args.num_layers,
        num_heads=args.num_heads, pos_embed=args.pos_embed,
        num_register_tokens=args.registers, qkv_bias=True,
        dtype=jnp.float32,
    )
    ours = extractor.extract_from_files(paths, batch_size=1)

    names = [os.path.basename(p) for p in paths]
    if args.ref_embeddings:
        ref_npz = np.load(args.ref_embeddings)
        refs = np.stack([np.asarray(ref_npz[n]).reshape(-1) for n in names])
    else:
        if args.registers:
            raise SystemExit(
                "--registers needs --ref-embeddings (the torch oracle has no "
                "register tokens)"
            )
        import torch

        from headct_foundation_tpu.data.transforms import (
            extract_feature_preprocess,
        )
        from headct_foundation_tpu.utils.torch_interop import (
            load_torch_state_dict, strip_prefixes, tree_to_torch,
        )

        mod = _load_oracle_module()
        oracle = mod.OracleViT(
            in_chans=args.in_chans, img=args.img_size, patch=args.patch_size,
            dim=args.hidden_size, mlp=args.mlp_dim, layers=args.num_layers,
            heads=args.num_heads,
        ).eval()
        from tools.export_torch import _to_torch_sd as _as_torch

        try:
            # independent import path: the raw .pt straight into the oracle
            oracle.load_state_dict(
                _as_torch(strip_prefixes(load_torch_state_dict(args.checkpoint))),
                strict=True,
            )
        except (RuntimeError, KeyError):
            # checkpoint lacks oracle keys (e.g. frozen sincos buffers not
            # saved): carry OUR loaded params into the oracle so both sides
            # share identical weights; preprocessing + forward still diverge
            import jax as _jax

            print("note: oracle weights routed through our importer "
                  "(checkpoint lacks a full torch state_dict)")
            oracle.load_state_dict(
                _as_torch(tree_to_torch(_jax.device_get(extractor.params))),
                strict=True,
            )
        refs = []
        for p in paths:
            vol = extract_feature_preprocess(
                p, (args.img_size,) * 3, args.in_chans
            )
            with torch.no_grad():
                refs.append(
                    oracle(torch.from_numpy(vol[None]))[:, 0, :].numpy()[0]
                )
        refs = np.stack(refs)

    cosines = {}
    for name, a, b in zip(names, ours, refs):
        cosines[name] = float(
            np.sum(a * b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        )
    values = np.array(list(cosines.values()))
    passed = bool((values >= args.threshold).all())
    report = {
        "checkpoint": args.checkpoint,
        "n_scans": len(paths),
        "threshold": args.threshold,
        "min_cosine": float(values.min()),
        "mean_cosine": float(values.mean()),
        "pass": passed,
        "per_scan": cosines,
    }
    if args.report:
        with open(args.report, "w") as f:
            json.dump(report, f, indent=2)
    for name, c in cosines.items():
        print(f"  {name}: cosine={c:.6f}")
    print(
        f"{'PASS' if passed else 'FAIL'}: min={values.min():.6f} "
        f"mean={values.mean():.6f} over {len(paths)} scans "
        f"(threshold {args.threshold})"
    )
    sys.exit(0 if passed else 1)


if __name__ == "__main__":
    try:
        from headct_foundation_tpu.parallel.mesh import respect_jax_platforms_env

        respect_jax_platforms_env()
    except Exception:
        pass
    main()
