"""One-command export of a framework checkpoint to a reference-loadable .pt.

The reference consumes checkpoints through ``load_model`` (reference:
src/utils/misc.py:72-96), which strips ``module./backbone./_orig_mod.``
prefixes and loads ``strict=False`` — so any torch ``state_dict`` in the
reference's naming convention (Linear.weight [out, in], Conv3d patch embed,
``blocks.<i>.*``) plugs straight into its ViT / MAE / DINO tooling. This
tool converts our flax param pytrees back to that convention via
``utils/torch_interop.tree_to_torch`` (the tested inverse of the import
path) and writes the reference's pickle layout {epoch, state_dict[, ...]}
(reference: src/utils/misc.py:35-52).

What gets exported per checkpoint kind (auto-detected from the param tree):

* MAE pretrain    -> full MaskedAutoencoderViT state_dict (encoder+decoder)
* DINO pretrain   -> student as {backbone.*, head.*} plus
                     momentum_model_state_dict for the teacher — the same
                     split the reference's DINO checkpoints carry
                     (reference: engine_pretrain_dino.py:284-295)
* downstream      -> backbone state_dict to <out>.pt and the classifier to
                     <out>_classifier.pt (reference saves them separately,
                     engine_downstream.py:387-409)

Usage:
  python tools/export_torch.py model_saved/latest_model.ckpt out.pt
  python tools/export_torch.py ckpt out.pt --part dino-teacher
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _to_torch_sd(np_sd):
    import torch

    return {
        k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in np_sd.items()
    }


def _prefixed(sd, prefix):
    return {f"{prefix}.{k}": v for k, v in sd.items()}


def detect_part(params) -> str:
    keys = set(str(k) for k in params)
    if {"backbone", "head"} <= keys:
        return "dino-student"
    if {"model", "classifier"} <= keys:
        return "downstream"
    if any(k.startswith("decoder") for k in keys):
        return "mae"
    return "vit"


def _unstack_if_pipelined(params):
    """Pipelined (PARALLEL.PIPE) checkpoints carry the trunk params stacked
    ('blocks' with a leading [L] layer axis, parallel/pipeline.py) — restore
    the reference's per-block naming before the torch mapping."""
    from headct_foundation_tpu.parallel.pipeline import unstack_if_pipelined

    params = unstack_if_pipelined(params)
    for sub in ("backbone", "model"):
        if sub in params and hasattr(params[sub], "keys"):
            params[sub] = unstack_if_pipelined(params[sub])
    return params


def export(ckpt_path: str, out_path: str, part: str = "auto",
           norm_layer: str = "layernorm") -> list:
    """Returns the list of files written."""
    import torch

    from headct_foundation_tpu.utils.checkpoint import load_checkpoint
    from headct_foundation_tpu.utils.torch_interop import tree_to_torch

    payload = load_checkpoint(ckpt_path)
    params = _unstack_if_pipelined(payload["params"])
    if part == "auto":
        part = detect_part(params)
    meta = {"epoch": payload.get("epoch", 0),
            "best_loss": payload.get("best_loss", 0.0)}
    written = []

    if part in ("mae", "vit"):
        sd = tree_to_torch(params, norm_layer=norm_layer)
        torch.save({**meta, "state_dict": _to_torch_sd(sd)}, out_path)
        written.append(out_path)
    elif part in ("dino-student", "dino-teacher"):
        src = params if part == "dino-student" else payload[
            "momentum_model_state_dict"
        ]
        stats_key = ("head_stats" if part == "dino-student"
                     else "teacher_head_stats")
        head_stats = payload.get(stats_key) or None
        sd = _prefixed(tree_to_torch(src["backbone"], norm_layer=norm_layer),
                       "backbone")
        sd.update(_prefixed(
            tree_to_torch(src["head"], norm_layer=norm_layer,
                          batch_stats=head_stats),
            "head",
        ))
        out = {**meta, "state_dict": _to_torch_sd(sd)}
        # a student export also carries the teacher, like the reference's
        # DINO checkpoints (engine_pretrain_dino.py:284-295)
        if part == "dino-student" and "momentum_model_state_dict" in payload:
            t = payload["momentum_model_state_dict"]
            tsd = _prefixed(tree_to_torch(t["backbone"], norm_layer=norm_layer),
                            "backbone")
            tsd.update(_prefixed(
                tree_to_torch(t["head"], norm_layer=norm_layer,
                              batch_stats=payload.get("teacher_head_stats")),
                "head",
            ))
            out["momentum_model_state_dict"] = _to_torch_sd(tsd)
        torch.save(out, out_path)
        written.append(out_path)
    elif part == "downstream":
        sd = tree_to_torch(params["model"], norm_layer=norm_layer)
        torch.save({**meta, "state_dict": _to_torch_sd(sd)}, out_path)
        written.append(out_path)
        clf_stats = payload.get("batch_stats") or None
        if isinstance(clf_stats, dict):
            clf_stats = clf_stats.get("classifier", clf_stats) or None
        csd = tree_to_torch(params["classifier"], norm_layer=norm_layer,
                            batch_stats=clf_stats)
        root, ext = os.path.splitext(out_path)
        cpath = f"{root}_classifier{ext or '.pt'}"
        torch.save({**meta, "state_dict": _to_torch_sd(csd)}, cpath)
        written.append(cpath)
    else:
        raise SystemExit(f"unknown --part {part}")
    return written


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ckpt", help="framework checkpoint (.ckpt pickle or orbax dir)")
    ap.add_argument("out", help="output .pt path")
    ap.add_argument(
        "--part", default="auto",
        choices=["auto", "mae", "vit", "dino-student", "dino-teacher",
                 "downstream"],
    )
    ap.add_argument("--norm-layer", default="layernorm",
                    choices=["layernorm", "rmsnorm"])
    args = ap.parse_args()
    for path in export(args.ckpt, args.out, args.part, args.norm_layer):
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
