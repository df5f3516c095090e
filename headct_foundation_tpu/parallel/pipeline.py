"""GPipe-style pipeline parallelism over a 'pipe' mesh axis.

The reference has no pipeline parallelism (its only parallelism is
single-node DDP — reference: src/utils/misc.py:325-344); this is a TPU-native
extension for models whose layer stack outgrows one chip's HBM. The design is
the standard JAX SPMD pipeline recipe: the L homogeneous transformer blocks'
parameters are STACKED into one pytree with a leading [L] layer axis and
sharded over the 'pipe' mesh axis (each device holds L/S consecutive layers),
and activations flow stage-to-stage with ``lax.ppermute`` inside a
``shard_map`` under a fill-drain (GPipe) microbatch schedule:

    tick t:   stage 0 ingests microbatch t, every stage applies its local
              layers (a ``lax.scan`` over the stage's [L/S] stacked params),
              then sends its activation one hop down the 'pipe' axis.
    outputs:  the last stage emits microbatch t-(S-1) at tick t; after
              M + S - 1 ticks all M microbatches are done. The bubble
              fraction is (S-1)/(M+S-1).

Differentiability is free: reverse-mode AD through the scan + ppermute runs
the same schedule backwards (cotangents hop stage-to-stage in reverse), so
the pipelined trunk drops into a jitted ``value_and_grad`` train step
unchanged. Gradients of the stacked parameters come out 'pipe'-sharded —
each stage owns its layers' gradients and optimizer state (no cross-stage
parameter traffic at all; only the [mb, T, D] activation crosses ICI each
tick).

The pipeline composes with the 'data' axis (each data shard runs its own
microbatch stream; gradient averaging over 'data' happens in the surrounding
GSPMD jit as usual). 'fsdp'/'seq'/'tensor' must be 1 when 'pipe' > 1 — the
shard_map region is manual over every mesh axis, so in-stage tensor
parallelism would need hand-written collectives (a deliberate v1 boundary,
asserted loudly).
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def stack_layer_params(params: Dict[str, Any], prefix: str, n_layers: int):
    """Replace ``{prefix}_0 .. {prefix}_{n-1}`` subtrees of a flax params
    dict with one ``{prefix}`` subtree whose leaves carry a leading [n_layers]
    axis. The blocks must be homogeneous (identical subtree structure), which
    the ViT/MAE trunks are by construction."""
    subs = [params[f"{prefix}_{i}"] for i in range(n_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *subs)
    out = {k: v for k, v in params.items()
           if not re.fullmatch(rf"{re.escape(prefix)}_\d+", k)}
    out[prefix] = stacked
    return out


def unstack_layer_params(params: Dict[str, Any], prefix: str):
    """Inverse of :func:`stack_layer_params` (host-side; used by checkpoint
    interop/export so pipelined states keep the reference naming)."""
    stacked = params[prefix]
    n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    out = {k: v for k, v in params.items() if k != prefix}
    for i in range(n):
        out[f"{prefix}_{i}"] = jax.tree.map(lambda x: x[i], stacked)
    return out


def unstack_if_pipelined(params):
    """Restore the reference's per-block naming on a param tree that carries
    pipelined (stacked) trunks; per-block trees pass through unchanged. Used
    wherever a checkpoint of unknown layout meets per-block consumers
    (torch export, warm-starting an unpipelined model)."""
    if not hasattr(params, "keys"):
        return params
    out = dict(params)
    for prefix in ("blocks", "decoder_blocks"):
        if prefix in out and f"{prefix}_0" not in out:
            out = unstack_layer_params(out, prefix)
    return out


def adapt_trunk_layout(tree, target):
    """Convert a source param tree's trunk layout (stacked 'blocks' vs
    per-block 'blocks_i') to match ``target``'s before name-based merging —
    so pipelined checkpoints warm-start unpipelined models and vice versa
    instead of silently merging zero trunk weights. Non-dict inputs and
    prefixes absent from either side pass through untouched."""
    if not (hasattr(tree, "keys") and hasattr(target, "keys")):
        return tree
    tree = dict(tree)
    for prefix in ("blocks", "decoder_blocks"):
        src_stacked = prefix in tree and f"{prefix}_0" not in tree
        tgt_stacked = prefix in target and f"{prefix}_0" not in target
        if src_stacked and not tgt_stacked:
            tree = unstack_layer_params(tree, prefix)
        elif tgt_stacked and not src_stacked and f"{prefix}_0" in tree:
            n = 0
            while f"{prefix}_{n}" in tree:
                n += 1
            tree = stack_layer_params(tree, prefix, n)
    return tree


def pipeline_rules(base_rules=None) -> Tuple:
    """Sharding rules for stacked trunk params: the leading layer axis shards
    over 'pipe'; these must PRECEDE the default rules (which would otherwise
    match e.g. 'blocks/attn/qkv/kernel' and put the LAYER dim on 'fsdp')."""
    if base_rules is None:
        from headct_foundation_tpu.parallel.mesh import _DEFAULT_RULES

        base_rules = _DEFAULT_RULES
    return (
        (r"^(blocks|decoder_blocks)/", P("pipe")),
    ) + tuple(base_rules)


def _fold_layers(apply_fn: Callable, layers: Any, x: jnp.ndarray) -> jnp.ndarray:
    """Sequentially apply stacked layers [L, ...] to x via lax.scan."""

    def step(h, p):
        return apply_fn(p, h), None

    return jax.lax.scan(step, x, layers)[0]


def pipeline_apply(
    mesh: Mesh,
    stacked_params: Any,
    x: jnp.ndarray,
    apply_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    n_microbatches: int = 0,
    axis: str = "pipe",
) -> jnp.ndarray:
    """Apply a stacked layer trunk to ``x`` [B, T, D], pipelined over ``axis``.

    Semantically identical to folding ``apply_fn`` over the L layers in
    order; with S = mesh.shape[axis] > 1 the fold runs as an S-stage
    fill-drain pipeline over ``n_microbatches`` (default: S). Requirements
    (asserted): L % S == 0; the per-datashard batch divides n_microbatches;
    fsdp/seq/tensor mesh axes are 1.

    Fully differentiable — see module docstring.
    """
    S = int(mesh.shape.get(axis, 1)) if mesh is not None else 1
    if S == 1:
        return _fold_layers(apply_fn, stacked_params, x)

    for other in ("fsdp", "seq", "tensor"):
        assert int(mesh.shape.get(other, 1)) == 1, (
            f"pipeline parallelism is manual over every mesh axis; '{other}'"
            f"={mesh.shape[other]} would need in-stage collectives (v1 limit)"
        )
    L = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    assert L % S == 0, (L, S)
    M = n_microbatches or S

    from headct_foundation_tpu.ops.attention import attention_mesh

    x_spec = P(("data", "fsdp"), *([None] * (x.ndim - 1)))
    p_specs = jax.tree.map(lambda _: P(axis), stacked_params)

    def body(layers, xb):
        # layers: this stage's [L/S, ...] params; xb: this data-shard's batch.
        # Partial tail batches (drop_last=False loaders) pad up to a multiple
        # of M — shapes are static per trace, so this costs nothing on full
        # batches and only bubble compute on the tail trace.
        b = xb.shape[0]
        b_pad = -(-b // M) * M
        if b_pad != b:
            xb = jnp.pad(xb, ((0, b_pad - b),) + ((0, 0),) * (xb.ndim - 1))
        xs = xb.reshape((M, b_pad // M) + xb.shape[1:])
        stage = jax.lax.axis_index(axis)

        def tick(carry, t):
            act, ys = carry
            # Stage 0 ingests microbatch t (clamped in the drain phase, where
            # its compute is bubble); later stages consume the activation
            # ppermuted in by the previous tick.
            x_in = jnp.where(
                stage == 0,
                jax.lax.dynamic_index_in_dim(
                    xs, jnp.minimum(t, M - 1), 0, keepdims=False
                ),
                act,
            )
            y = _fold_layers(apply_fn, layers, x_in)
            # One hop down the line; no wraparound (stage 0 re-ingests from
            # xs, and ppermute fills non-receivers with zeros).
            act_next = jax.lax.ppermute(
                y, axis, [(i, i + 1) for i in range(S - 1)]
            )
            # The last stage finishes microbatch t-(S-1) at tick t.
            out_idx = jnp.clip(t - (S - 1), 0, M - 1)
            valid = jnp.logical_and(stage == S - 1, t >= S - 1)
            cur = jax.lax.dynamic_index_in_dim(ys, out_idx, 0, keepdims=False)
            ys = jax.lax.dynamic_update_index_in_dim(
                ys, jnp.where(valid, y, cur), out_idx, 0
            )
            return (act_next, ys), None

        # The trunk body runs per-device inside this shard_map: attention
        # must take its unsharded path (a nested shard_map cannot compile).
        with attention_mesh(None):
            (_, ys), _ = jax.lax.scan(
                tick,
                (jnp.zeros_like(xs[0]), jnp.zeros_like(xs)),
                jnp.arange(M + S - 1),
            )
        # out_specs carries no 'pipe' axis, so every pipe rank must hold the
        # same value: broadcast the last stage's outputs with a masked psum.
        ys = jax.lax.psum(jnp.where(stage == S - 1, ys, 0).astype(ys.dtype),
                          axis)
        return ys.reshape((b_pad,) + xb.shape[1:])[:b]

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(p_specs, x_spec),
        out_specs=x_spec,
        check_vma=False,
    )(stacked_params, x)
