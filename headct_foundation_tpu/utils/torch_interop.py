"""Import reference torch checkpoints into our parameter pytrees.

The reference saves torch pickles whose ``state_dict`` carries
``module./backbone./_orig_mod.`` prefixes and loads them with prefix-stripping
and ``strict=False`` (reference: src/utils/misc.py:72-96). This module
reproduces that contract against our flax trees:

* dotted torch names -> nested tree paths (``blocks.3.attn.qkv.weight`` ->
  ``blocks_3/attn/qkv/kernel``),
* layout conversions: torch ``Linear.weight`` [out, in] -> flax ``kernel``
  [in, out]; Conv3d patch-embed weight [O, C, ph, pw, pd] -> our matmul
  kernel [(ph pw pd C), O]; 1-D norm ``weight`` -> ``scale`` (layernorm) /
  ``weight`` (rmsnorm); BatchNorm running stats -> ``batch_stats``,
* ``merge_params`` — strict=False merge: copy where path+shape match, report
  missing/unexpected like torch's ``load_state_dict`` message.

Requires torch (CPU) only for unpickling ``.pt`` files.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

PREFIXES = ("module.", "backbone.", "_orig_mod.")


def load_torch_state_dict(path: str, key: str = "state_dict") -> Dict[str, np.ndarray]:
    """Load a reference .pt checkpoint and return {stripped_name: np.ndarray}."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload[key] if isinstance(payload, dict) and key in payload else payload
    out = {}
    for k, v in sd.items():
        name = k
        for p in PREFIXES:
            name = name.replace(p, "")
        if hasattr(v, "detach"):
            out[name] = v.detach().cpu().numpy()
    return out


def strip_prefixes(sd: Dict[str, Any]) -> Dict[str, Any]:
    out = {}
    for k, v in sd.items():
        for p in PREFIXES:
            k = k.replace(p, "")
        out[k] = v
    return out


def _nest(tree: Dict, path: List[str], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _convert_patch_embed(name_parts: List[str], value: np.ndarray):
    """patch_embedding.patch_embeddings.{weight,bias} -> kernel/bias."""
    leaf = name_parts[-1]
    if leaf == "weight":
        # [O, C, ph, pw, pd] -> [(ph, pw, pd, C), O] matching patchify3d's
        # (ph, pw, pd, c) feature order (models/patch_embed.py).
        o = value.shape[0]
        return ["patch_embedding", "kernel"], value.transpose(2, 3, 4, 1, 0).reshape(-1, o)
    if leaf == "bias":
        return ["patch_embedding", "bias"], value
    raise KeyError(name_parts)


def torch_to_tree(
    sd: Dict[str, np.ndarray], norm_layer: str = "layernorm"
) -> Dict[str, Any]:
    """Convert a stripped torch state_dict into our nested param/stats tree.

    Returns {"params": tree, "batch_stats": tree} — batch_stats only populated
    when BatchNorm running stats are present.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    # BN-in-head layout detection (DINO head Sequential indices shift)
    bn_layout = any(".running_mean" in k and "mlp." in k for k in sd)

    for name, value in sd.items():
        parts = name.split(".")
        leaf = parts[-1]

        if leaf == "num_batches_tracked":
            continue

        # ---- batch norm running stats ----
        if leaf in ("running_mean", "running_var"):
            path = _rename_module_path(parts[:-1], bn_layout)
            _nest(stats, path + ["mean" if leaf == "running_mean" else "var"], value)
            continue

        # ---- patch embedding conv ----
        if len(parts) >= 2 and parts[-2] == "patch_embeddings":
            path, v = _convert_patch_embed(parts, value)
            _nest(params, path, v)
            continue
        if parts[0] == "patch_embedding" and leaf == "position_embeddings":
            _nest(params, ["patch_embedding", "position_embeddings"], value)
            continue

        path = _rename_module_path(parts[:-1], bn_layout)

        # ---- leaves ----
        if leaf == "weight":
            if value.ndim == 2:  # Linear [out, in] -> kernel [in, out]
                _nest(params, path + ["kernel"], value.T)
            elif value.ndim == 1:  # norm weight
                if norm_layer == "rmsnorm":
                    _nest(params, path + ["weight"], value)
                else:
                    _nest(params, path + ["scale"], value)
            else:
                raise ValueError(f"Unhandled weight shape {value.shape} at {name}")
        elif leaf == "bias":
            _nest(params, path + ["bias"], value)
        elif leaf in ("weight_g", "weight_v"):
            _nest(params, path + [leaf], value)
        elif leaf in (
            "cls_token",
            "register_tokens",
            "mask_token",
            "decoder_cls_token",
            "decoder_pos_embed",
            "position_embeddings",
            "lora_matrix_A",
            "lora_matrix_B",
            "center",
        ):
            _nest(params, path + [leaf], value)
        else:
            # unknown leaf — keep verbatim so merge can still try
            _nest(params, path + [leaf], value)

    return {"params": params, "batch_stats": stats}


def _rename_module_path(
    parts: List[str], bn_layout: bool = False
) -> List[str]:
    """Map torch module paths to our tree naming.

    - blocks.N -> blocks_N; decoder_blocks.N -> decoder_blocks_N
    - DINO head Sequential: without BN the Linears sit at indices 0,2,4,...
      (GELU between) -> mlp_{idx//2}; with BN the pattern is
      [Linear, BN, GELU] so Linears sit at 0,3,6,... -> mlp_{idx//3} and BNs
      at 1,4,... -> mlp_bn_{idx//3}. ``bn_layout`` is decided by a pre-scan
      of the whole state dict for mlp running stats.
    - classification_head.0 -> classification_head
    """
    out: List[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in ("blocks", "decoder_blocks") and i + 1 < len(parts) and parts[i + 1].isdigit():
            out.append(f"{p}_{parts[i + 1]}")
            i += 2
            continue
        if p == "mlp" and i + 1 < len(parts) and parts[i + 1].isdigit():
            idx = int(parts[i + 1])
            if bn_layout:
                if idx % 3 == 0:
                    out.append(f"mlp_{idx // 3}")
                elif idx % 3 == 1:
                    out.append(f"mlp_bn_{idx // 3}")
                else:
                    raise KeyError(f"unexpected param at GELU slot mlp.{idx}")
            else:
                out.append(f"mlp_{idx // 2}")
            i += 2
            continue
        if p == "classification_head" and i + 1 < len(parts) and parts[i + 1].isdigit():
            out.append("classification_head")
            i += 2
            continue
        out.append(p)
        i += 1
    return out


# Position-embedding leaves that may be interpolated across grid sizes at
# load time instead of being dropped on shape mismatch (reference:
# main_pretrain_mae.py:132 calls interpolate_pos_embed before load_state_dict;
# src/utils/pos_embed.py:102-153). Both leaves store patch tokens only —
# CLS/register tokens live in separate parameters — so num_extra_tokens=0.
POS_EMBED_LEAVES = ("position_embeddings", "decoder_pos_embed")


def put_like(target: Any, source: Any) -> Any:
    """device_put a (merged) host tree onto ``target``'s shardings, cast to
    the template dtype: the jitted steps were compiled against the target
    state's avals, so a checkpoint from a different-precision run must not
    silently change them (same contract as checkpoint._restore_tree). The
    CLI mains use this for every merged-params warm start."""
    import jax

    return jax.tree.map(
        lambda t, n: jax.device_put(np.asarray(n, dtype=t.dtype), t.sharding),
        target, source,
    )


def merge_params(
    target: Any, source: Any
) -> Tuple[Any, List[str], List[str]]:
    """strict=False merge of ``source`` into ``target`` (both nested dicts /
    pytrees of arrays). Returns (merged, missing_keys, unexpected_keys).

    Position-embedding leaves whose token count differs from the target's
    (e.g. a 96^3-trained checkpoint loaded into a 192^3 model) are trilinearly
    interpolated to the target grid rather than discarded, matching the
    reference's checkpoint-time interpolation."""
    import jax

    missing: List[str] = []
    unexpected: List[str] = []

    def _walk(t: Any, s: Any, path: str):
        if isinstance(t, dict):
            merged = {}
            s = s if isinstance(s, dict) else {}
            for k, v in t.items():
                sub = f"{path}.{k}" if path else str(k)
                if k in s:
                    merged[k] = _walk(v, s[k], sub)
                else:
                    missing.append(sub)
                    merged[k] = v
            for k in s:
                if k not in t:
                    unexpected.append(f"{path}.{k}" if path else str(k))
            return merged
        # leaf
        src = np.asarray(s)
        tgt_shape = tuple(getattr(t, "shape", np.asarray(t).shape))
        if tuple(src.shape) != tgt_shape:
            leaf = path.rsplit(".", 1)[-1]
            def _is_cube(n: int) -> bool:
                r = round(float(n) ** (1.0 / 3.0))
                return r ** 3 == n

            if (
                leaf in POS_EMBED_LEAVES
                and src.ndim == 3
                and len(tgt_shape) == 3
                and src.shape[0] == tgt_shape[0] == 1
                and src.shape[-1] == tgt_shape[-1]
                # both token counts must be cubic grids — anything else
                # (e.g. a CLS-inclusive 8^3+1=513 embedding from foreign
                # tooling) stays strict=False: reported, not a crash
                and _is_cube(src.shape[1])
                and _is_cube(tgt_shape[-2])
            ):
                from headct_foundation_tpu.models.pos_embed import (
                    interpolate_pos_embed,
                )

                src = np.asarray(
                    interpolate_pos_embed(
                        jax.numpy.asarray(src, dtype=np.float32),
                        num_extra_tokens=0,
                        new_num_patches=tgt_shape[-2],
                    )
                )
            else:
                unexpected.append(f"{path} (shape {src.shape} != {tgt_shape})")
                return t
        dtype = getattr(t, "dtype", np.float32)
        return jax.numpy.asarray(src, dtype=dtype) if hasattr(t, "devices") else src.astype(dtype)

    merged = _walk(jax.device_get(target) if hasattr(target, "devices") else target, source, "")
    return merged, missing, unexpected


def tree_to_torch(
    params: Any, norm_layer: str = "layernorm", batch_stats: Any = None
) -> Dict[str, np.ndarray]:
    """Export our nested param tree to a torch-convention state_dict
    (the inverse of torch_to_tree): flax kernels transpose back to
    Linear.weight [out, in], the patch-embed matmul kernel folds back into a
    Conv3d weight [O, C, ph, pw, pd], norm scale -> weight, BN stats ->
    running_mean/var. Lets reference tooling consume checkpoints trained here.
    """
    out: Dict[str, np.ndarray] = {}

    # Sequential index stride for mlp_N Linears depends on the layout:
    # no-BN [Linear, GELU]* -> Linears at 0,2,4 (stride 2); with BN
    # [Linear, BN, GELU]* -> Linears at 0,3,6 (stride 3, BNs at 1,4 — the
    # mlp_bn_ mapping below). Mirrors torch_to_tree's bn_layout pre-scan.
    def _has_bn(tree: Any) -> bool:
        if not isinstance(tree, dict):
            return False
        return any(
            str(k).startswith("mlp_bn_") or _has_bn(v)
            for k, v in tree.items()
        )

    bn_layout = _has_bn(params) or _has_bn(batch_stats)
    mlp_stride = 3 if bn_layout else 2

    def _patch_kernel_to_conv(k: np.ndarray) -> np.ndarray:
        # [(ph pw pd C), O] -> [O, C, ph, pw, pd]; patch extent is cubic
        pd_c, o = k.shape
        # infer C from companion bias? caller passes via closure: we infer by
        # scanning plausible channel counts (1 or 3) then cube root.
        for c in (3, 1, 2, 4):
            vol = pd_c // c
            p = round(vol ** (1 / 3))
            if c * p * p * p == pd_c:
                return k.reshape(p, p, p, c, o).transpose(4, 3, 0, 1, 2)
        raise ValueError(f"cannot infer conv shape from kernel {k.shape}")

    def _walk(tree: Any, prefix: str, in_patch_embed: bool):
        for key, val in tree.items():
            name = str(key)
            dotted = f"{prefix}.{name}" if prefix else name
            if isinstance(val, dict):
                # blocks_3 -> blocks.3 ; mlp_1 -> mlp.<seq idx> (no-BN layout)
                torch_name = name
                for base in ("blocks", "decoder_blocks"):
                    if name.startswith(base + "_") and name[len(base) + 1:].isdigit():
                        torch_name = f"{base}.{name[len(base) + 1:]}"
                if name.startswith("mlp_") and name[4:].isdigit():
                    torch_name = f"mlp.{mlp_stride * int(name[4:])}"
                if name.startswith("mlp_bn_"):
                    torch_name = f"mlp.{3 * int(name[7:]) + 1}"
                new_prefix = f"{prefix}.{torch_name}" if prefix else torch_name
                _walk(val, new_prefix, in_patch_embed or name == "patch_embedding")
                continue

            arr = np.asarray(val)
            if in_patch_embed and name == "kernel":
                out[f"{prefix}.patch_embeddings.weight"] = _patch_kernel_to_conv(arr)
            elif in_patch_embed and name == "bias" and prefix.endswith("patch_embedding"):
                out[f"{prefix}.patch_embeddings.bias"] = arr
            elif name == "kernel":
                out[f"{prefix}.weight"] = arr.T
            elif name == "scale":
                out[f"{prefix}.weight"] = arr
            elif name == "mean":
                out[f"{prefix}.running_mean"] = arr
            elif name == "var":
                out[f"{prefix}.running_var"] = arr
            else:
                out[dotted] = arr

    _walk(params, "", False)
    if batch_stats:
        _walk(batch_stats, "", False)
    return out


class _NativeCheckpointUnpickler:
    """Restricted unpickler for classification: our checkpoints pickle ONLY
    nested dicts of numpy arrays and python scalars/strings, so any other
    global (torch storage reconstructors, arbitrary classes) proves the file
    is not ours — and, crucially, never gets imported or called. A plain
    ``pickle.load`` here would hand a malicious ``--model_load_path`` file
    arbitrary code execution merely to classify it."""

    _SAFE_GLOBALS = {
        ("numpy", "ndarray"),
        ("numpy", "dtype"),
        ("numpy.core.multiarray", "_reconstruct"),
        ("numpy._core.multiarray", "_reconstruct"),
        ("numpy.core.multiarray", "scalar"),
        ("numpy._core.multiarray", "scalar"),
        # pickle protocol >= 5 reduces C-contiguous arrays through
        # _frombuffer instead of _reconstruct
        ("numpy.core.numeric", "_frombuffer"),
        ("numpy._core.numeric", "_frombuffer"),
        # numpy arrays of the ML scalar dtypes (bfloat16 params saved by a
        # mixed-precision run) pickle through the ml_dtypes scalar classes —
        # dtype singletons, safe to resolve, and required so a legitimate
        # bf16-leaf native checkpoint isn't misrouted to the torch loader
        ("ml_dtypes", "bfloat16"),
        ("ml_dtypes", "float8_e4m3fn"),
        ("ml_dtypes", "float8_e5m2"),
        ("ml_dtypes", "float8_e4m3b11fnuz"),
        ("ml_dtypes", "int4"),
        ("ml_dtypes", "uint4"),
    }

    @classmethod
    def load(cls, fileobj):
        import pickle

        safe = cls._SAFE_GLOBALS

        class _Restricted(pickle.Unpickler):
            def find_class(self, module, name):
                # numpy.dtypes holds only dtype singletons (numpy >= 1.25
                # pickles dtypes through it) — safe as a module.
                if (module, name) in safe or module == "numpy.dtypes":
                    return super().find_class(module, name)
                raise pickle.UnpicklingError(
                    f"non-native global {module}.{name} in checkpoint"
                )

        return _Restricted(fileobj).load()


def _classify_checkpoint(path: str):
    """(is_torch, native_payload_or_None). torch.save produces a zip ('PK')
    or a legacy pickle needing torch's unpickler; our checkpoints are plain
    pickles of nested dicts. When the file IS ours, the loaded payload is
    returned so the caller doesn't unpickle a multi-GB state twice. The
    probe load is RESTRICTED (numpy-reconstruction globals only): anything
    needing other globals is classified as torch without executing it."""
    import os

    if os.path.isdir(path):  # orbax checkpoint directory
        return False, None
    with open(path, "rb") as f:
        head = f.read(4)
    if head[:2] == b"PK":
        return True, None
    import logging
    import pickle

    log = logging.getLogger("headct_foundation_tpu.checkpoint")
    try:
        with open(path, "rb") as f:
            payload = _NativeCheckpointUnpickler.load(f)
        ours = isinstance(payload, dict) and (
            "params" in payload
            or isinstance(payload.get("state_dict"), dict)
        )
        return (False, payload) if ours else (True, None)
    except pickle.UnpicklingError as e:
        # A global outside the safe set — torch checkpoints hit this on
        # their storage reconstructors. Log WHICH global decided the
        # routing so a legitimate native checkpoint with an unexpected
        # leaf type is diagnosable instead of silently torch-routed.
        log.info("classify_checkpoint: %s routed to the torch loader (%s)",
                 path, e)
        return True, None
    except Exception as e:
        # Not an unpickling rejection: truncated/corrupt file or IO error.
        # Still routed to the torch loader (its errors are descriptive),
        # but flagged louder — this is NOT the known torch-vs-native case.
        log.warning("classify_checkpoint: probe of %s failed with %s: %s — "
                    "treating as a torch checkpoint", path, type(e).__name__, e)
        return True, None


def _is_torch_checkpoint(path: str) -> bool:
    return _classify_checkpoint(path)[0]


# Public name: the CLI mains route --model_load_path by CONTENT (torch zip /
# legacy pickle -> params-only merge; our pickle or orbax dir -> full
# restore) — extension is meaningless (our checkpoints can be named *.pt
# via MODEL.SAVE_NAME, and orbax checkpoints are directories).
classify_checkpoint = _classify_checkpoint


def load_pretrained_into(
    params: Any,
    checkpoint_path: str,
    norm_layer: str = "layernorm",
    state_key: str = "state_dict",
    logger=None,
) -> Any:
    """High-level: reference .pt OR our .ckpt pickle -> merged params
    (reference load_model semantics, misc.py:72-96). Routed by content, not
    extension: our checkpoints are plain pickles of nested numpy dicts; torch
    checkpoints are zip archives (or legacy tar pickles) of tensors."""
    is_torch, payload = _classify_checkpoint(checkpoint_path)
    if is_torch:
        sd = load_torch_state_dict(checkpoint_path, key=state_key)
        tree = torch_to_tree(sd, norm_layer=norm_layer)["params"]
    else:
        if payload is None:  # orbax directory path
            from headct_foundation_tpu.utils.checkpoint import load_checkpoint

            payload = load_checkpoint(checkpoint_path)
        tree = payload.get(state_key, payload.get("params", payload))
        # our DINO checkpoints nest {'backbone', 'head'}; strip like the
        # reference strips 'backbone.' when loading into a bare ViT
        if isinstance(tree, dict) and set(tree) == {"backbone", "head"} and "backbone" not in params:
            tree = tree["backbone"]
    # Pipelined (PARALLEL.PIPE) checkpoints store the trunks STACKED
    # ('blocks' with a leading layer axis); per-block targets would merge
    # ZERO trunk weights from them (and vice versa) — adapt layouts first.
    from headct_foundation_tpu.parallel.pipeline import adapt_trunk_layout

    tree = adapt_trunk_layout(tree, params)
    merged, missing, unexpected = merge_params(params, tree)
    if logger:
        logger.info(
            f"Loaded pretrained weights from {checkpoint_path}: "
            f"{len(missing)} missing, {len(unexpected)} unexpected keys"
        )
        if missing:
            logger.info(f"missing: {missing[:10]}{'...' if len(missing) > 10 else ''}")
        if unexpected:
            logger.info(
                f"unexpected: {unexpected[:10]}{'...' if len(unexpected) > 10 else ''}"
            )
    return merged
