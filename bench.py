"""Benchmark: MAE 3D pretrain step throughput in volumes/sec/chip.

Runs the flagship config (ViT-B 3D, 96^3, patch 12, 3-channel, mask 0.75 —
configs/mae/mae_HeadCT.yaml) full training step on the available chip(s) and
prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "volumes/s/chip", "vs_baseline": N/B}

Baseline B = 3.1 volumes/s/GPU — the reference's measured pretrain step
throughput on A100s (BASELINE.md: DINO run wandb summary; the reference
publishes no MAE step time, this is its only measured pretrain throughput).

Measurement method: K sequential train steps are chained inside ONE jitted
``lax.scan`` and the per-step losses are fetched by value. A single dispatch +
single value fetch amortizes the remote-relay round trip across K steps, and
fetching actual loss values defeats the relay's unreliable async-completion
signals (block_until_ready can return before the chain finishes). The scan
carries a true sequential dependency (state_k feeds step k+1), so XLA cannot
skip or overlap steps.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_VOLS_PER_SEC_PER_CHIP = 3.1  # BASELINE.md, 4xA100 DINO run

# Per-chip batch size. 32 volumes of 96^3 x 3ch bf16 activations fit
# comfortably in v5e 16 GB HBM alongside the 151M-param model + AdamW state.
BATCH_PER_CHIP = 32
SCAN_STEPS = 10
MEASURE_RUNS = 3


def main() -> None:
    from headct_foundation_tpu.config import default_config
    from headct_foundation_tpu.engines import mae_engine
    from headct_foundation_tpu.parallel.mesh import batch_sharding, make_mesh

    cfg = default_config()
    cfg_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "configs/mae/mae_HeadCT.yaml")
    if os.path.exists(cfg_path):
        cfg.merge_from_file(cfg_path)
    else:
        cfg.MAE.PATCH_SIZE = 12
        cfg.MAE.USE_BIAS = True
    cfg.TRAIN.GRAD_CLIP = 0.0  # matches mae_HeadCT.yaml recipe

    n_chips = len(jax.devices())
    mesh = make_mesh(data=n_chips)
    rng = jax.random.PRNGKey(42)

    state, _, _ = mae_engine.create_train_state(
        cfg, mesh, rng, total_steps=10_000, num_warmup_steps=100
    )

    def multi_step(state, batch, rng):
        def body(st, _):
            step_rng = jax.random.fold_in(rng, st.step)
            mask_rng, drop_rng = jax.random.split(step_rng)

            def loss_fn(params):
                loss, _, _ = st.apply_fn(
                    {"params": params}, batch, deterministic=False,
                    rngs={"mask": mask_rng, "dropout": drop_rng},
                )
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(st.params)
            return st.apply_gradients(grads=grads), loss

        return jax.lax.scan(body, state, None, length=SCAN_STEPS)

    multi_step = jax.jit(
        multi_step, in_shardings=(None, batch_sharding(mesh), None),
        donate_argnums=(0,),
    )

    batch_np = np.random.RandomState(0).randn(
        BATCH_PER_CHIP * n_chips, cfg.MAE.IN_CHANS, 96, 96, 96
    ).astype(np.float32)
    batch = mae_engine._to_device_batch(batch_np, mesh)

    # compile + warmup run
    state, losses = multi_step(state, batch, rng)
    jax.device_get(losses)

    best_dt = float("inf")
    for _ in range(MEASURE_RUNS):
        t0 = time.perf_counter()
        state, losses = multi_step(state, batch, rng)
        final_loss = float(np.asarray(jax.device_get(losses))[-1])
        best_dt = min(best_dt, time.perf_counter() - t0)
    assert np.isfinite(final_loss), final_loss

    vols_per_sec_per_chip = BATCH_PER_CHIP * SCAN_STEPS / best_dt

    print(
        json.dumps(
            {
                "metric": "volumes/sec/chip (MAE 3D pretrain step)",
                "value": round(vols_per_sec_per_chip, 2),
                "unit": "volumes/s/chip",
                "vs_baseline": round(
                    vols_per_sec_per_chip / REFERENCE_VOLS_PER_SEC_PER_CHIP, 2
                ),
            }
        )
    )


def feature_latency() -> None:
    """p50 per-scan feature-extract latency (BASELINE.json's second metric):
    synthetic NIfTI -> notebook-order preprocessing -> ViT-B CLS embedding."""
    import tempfile

    from headct_foundation_tpu.data.nifti import save_nifti
    from headct_foundation_tpu.feature_extraction import FeatureExtractor

    tmp = tempfile.mkdtemp()
    rng = np.random.RandomState(0)
    paths = []
    for i in range(12):
        vol = (rng.rand(220, 220, 140) * 3000 - 1000).astype(np.float32)
        p = os.path.join(tmp, f"s{i}.nii.gz")
        save_nifti(p, vol, np.diag([0.5, 0.5, 1.25, 1.0]))  # realistic CT grid
        paths.append(p)

    extractor = FeatureExtractor(
        img_size=96, patch_size=12, in_chans=3, hidden_size=768, mlp_dim=3072,
        num_layers=12, num_heads=12, pos_embed="sincos", qkv_bias=True,
        dtype=jnp.bfloat16,
    )
    # warm the compiled forward
    extractor.cls_embedding(np.zeros((1, 3, 96, 96, 96), np.float32))

    lat = []
    for p in paths:
        t0 = time.perf_counter()
        vol = extractor.preprocess(p)
        emb = extractor.cls_embedding(vol[None])
        float(np.asarray(emb).sum())  # force value
        lat.append(time.perf_counter() - t0)
    p50 = float(np.percentile(lat, 50))
    print(
        json.dumps(
            {
                "metric": "p50 per-scan feature-extract latency",
                "value": round(p50 * 1e3, 1),
                "unit": "ms",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    if "--feature-latency" in sys.argv:
        feature_latency()
    else:
        main()
