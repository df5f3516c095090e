"""Ablation timing of the MAE train step: where do the milliseconds go?

Times scan-chained variants of the flagship MAE step (ViT-B, 96^3, patch 12,
batch 32) on the attached chip(s):

  full       forward + backward + optimizer update      (the BENCH step)
  fwd_bwd    forward + backward, no optimizer
  fwd        forward (loss) only
  encoder    encoder-only forward+backward (masking + 12 blocks)
  optimizer  optimizer update only (constant grads)

Every variant chains K steps inside one jitted lax.scan with a true value
dependency, so a single dispatch + value fetch bounds the timing (the remote
relay's async-completion signals are unreliable; see bench.py docstring).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/perf_breakdown.py [--batch 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SCAN_STEPS = 10
RUNS = 3


def _timed(fn, *args):
    """Best-of-RUNS wall time of fn(*args) with a value fetch."""
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[-1])  # compile + warm
    best = float("inf")
    for _ in range(RUNS):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[-1])
        best = min(best, time.perf_counter() - t0)
    return best / SCAN_STEPS


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--full-only", action="store_true",
                    help="time only the full train step (batch sweeps)")
    ap.add_argument("--attn", choices=["pallas", "xla"], default=None,
                    help="force the attention backend")
    args = ap.parse_args()

    if args.attn:
        from headct_foundation_tpu.ops.attention import set_attention_backend

        set_attention_backend(args.attn)

    from headct_foundation_tpu.config import default_config
    from headct_foundation_tpu.engines import mae_engine
    from headct_foundation_tpu.parallel.mesh import batch_sharding, make_mesh

    cfg = default_config()
    cfg_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs/mae/mae_HeadCT.yaml",
    )
    if os.path.exists(cfg_path):
        cfg.merge_from_file(cfg_path)
    cfg.TRAIN.GRAD_CLIP = 0.0
    cfg.PARALLEL.REMAT = bool(args.remat)

    n_chips = len(jax.devices())
    mesh = make_mesh(data=n_chips)
    rng = jax.random.PRNGKey(0)
    state, _, _ = mae_engine.create_train_state(
        cfg, mesh, rng, total_steps=10_000, num_warmup_steps=100
    )
    batch = jnp.asarray(
        np.random.RandomState(0).randn(
            args.batch * n_chips, cfg.MAE.IN_CHANS, 96, 96, 96
        ),
        jnp.bfloat16,
    )
    batch = jax.device_put(batch, batch_sharding(mesh))

    def loss_of(params, b, mask_rng):
        loss, _, _ = state.apply_fn(
            {"params": params}, b, deterministic=False, rngs={"mask": mask_rng}
        )
        return loss

    def encoder_loss(params, b, mask_rng):
        from headct_foundation_tpu.models.mae import MaskedAutoencoderViT

        model = mae_engine.build_mae_model(cfg)
        latent, _, _ = model.apply(
            {"params": params}, b, mask_rng, False,
            method=MaskedAutoencoderViT.forward_encoder,
        )
        return jnp.mean(latent.astype(jnp.float32) ** 2)

    results = {}

    def scan_jit(body):
        def run(st, b, r):
            return jax.lax.scan(lambda c, _: body(c, b, r), st, None, length=SCAN_STEPS)

        return jax.jit(run, in_shardings=(None, batch_sharding(mesh), None))

    # full step
    def full_body(st, b, r):
        mask_rng = jax.random.fold_in(r, st.step)
        loss, grads = jax.value_and_grad(loss_of)(st.params, b, mask_rng)
        return st.apply_gradients(grads=grads), loss

    results["full"] = _timed(scan_jit(full_body), state, batch, rng)

    if args.full_only:
        print(json.dumps({
            "batch_per_chip": args.batch,
            "remat": bool(args.remat),
            "ms_per_step": {"full": round(results["full"] * 1e3, 2)},
            "vols_per_s_per_chip_full": round(args.batch / results["full"], 1),
        }))
        return

    # forward+backward only: fold the grads back with a negligible scale to
    # carry a true dependency without an optimizer update
    def fwd_bwd_body(carry, b, r):
        params, i = carry
        mask_rng = jax.random.fold_in(r, i)
        loss, grads = jax.value_and_grad(loss_of)(params, b, mask_rng)
        params = jax.tree.map(lambda p, g: p + g.astype(p.dtype) * 1e-30, params, grads)
        return (params, i + 1), loss

    results["fwd_bwd"] = _timed(scan_jit(fwd_bwd_body), (state.params, 0), batch, rng)

    # forward only: loss feeds the next step's batch. Params are an ARGUMENT
    # (a closure would bake 600 MB of constants into the compile payload).
    def fwd_scan(params, b, r):
        def body(carry, _):
            prev, i = carry
            mask_rng = jax.random.fold_in(r, i)
            loss = loss_of(params, b + prev.astype(b.dtype) * 1e-30, mask_rng)
            return (loss, i + 1), loss

        return jax.lax.scan(body, (jnp.float32(0), 0), None, length=SCAN_STEPS)

    fwd_jit = jax.jit(fwd_scan, in_shardings=(None, batch_sharding(mesh), None))
    results["fwd"] = _timed(fwd_jit, state.params, batch, rng)

    # encoder-only forward+backward
    def enc_body(carry, b, r):
        params, i = carry
        mask_rng = jax.random.fold_in(r, i)
        loss, grads = jax.value_and_grad(encoder_loss)(params, b, mask_rng)
        params = jax.tree.map(lambda p, g: p + g.astype(p.dtype) * 1e-30, params, grads)
        return (params, i + 1), loss

    results["encoder_fwd_bwd"] = _timed(
        scan_jit(enc_body), (state.params, 0), batch, rng
    )

    # optimizer update only (grads passed as an argument, state carries)
    grads_const = jax.jit(
        lambda p: jax.tree.map(lambda x: jnp.full_like(x, 1e-8), p)
    )(state.params)

    def opt_scan(st, grads, b, r):
        del b, r

        def body(s, _):
            s2 = s.apply_gradients(grads=grads)
            return s2, s2.step.astype(jnp.float32)

        return jax.lax.scan(body, st, None, length=SCAN_STEPS)

    opt_jit = jax.jit(
        opt_scan, in_shardings=(None, None, batch_sharding(mesh), None)
    )
    results["optimizer"] = _timed(opt_jit, state, grads_const, batch, rng)

    vols = args.batch
    print(json.dumps({
        "batch_per_chip": args.batch,
        "ms_per_step": {k: round(v * 1e3, 2) for k, v in results.items()},
        "derived_ms": {
            "backward": round((results["fwd_bwd"] - results["fwd"]) * 1e3, 2),
            "optimizer_overhead_in_full": round(
                (results["full"] - results["fwd_bwd"]) * 1e3, 2
            ),
            "decoder_share_fwd_bwd": round(
                (results["fwd_bwd"] - results["encoder_fwd_bwd"]) * 1e3, 2
            ),
        },
        "vols_per_s_per_chip_full": round(vols / results["full"], 1),
    }))


if __name__ == "__main__":
    main()
