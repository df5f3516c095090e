"""Downstream fine-tune/probe step throughput (volumes/s/chip).

Measures the full jitted downstream train step (ViT-B backbone forward +
classifier + CE + dual-optimizer update, with the on-device vit_augment in
the step like production) on the flagship recipe
(configs/downstream/vit_HeadCT_rsna.yaml geometry). Both regimes:
full fine-tune (TRAIN.LOCK=False) and linear probe (LOCK=True — backbone
under stop_gradient, so the backward is classifier-only).

Reference scale for context: 1x A100, batch 64, 500 weighted samples per
epoch (engine_downstream.py; submit_job_downstream_cq500_ICH.sh) — no
published step time; the shared 3.1 vol/s/GPU DINO-derived figure in
BASELINE.md is the only measured reference throughput.

K steps are dispatched back-to-back (state donation chains them) and one
final loss is fetched, like tools/bench_dino.py.

Usage:
  PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_downstream.py \
      --batch 64 [--lock] [--classifier attentive]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

STEPS = 8
RUNS = 3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lock", action="store_true", help="linear-probe mode")
    ap.add_argument("--classifier", default="linear",
                    choices=["linear", "attentive"])
    args = ap.parse_args()

    from headct_foundation_tpu.config import default_config
    from headct_foundation_tpu.engines import downstream_engine
    from headct_foundation_tpu.parallel.mesh import make_mesh

    cfg = default_config()
    cfg_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs/downstream/vit_HeadCT_rsna.yaml",
    )
    if os.path.exists(cfg_path):
        cfg.merge_from_file(cfg_path)
    cfg.TRAIN.LOCK = bool(args.lock)
    cfg.TRAIN.CLASSIFIER = args.classifier

    n_chips = len(jax.devices())
    mesh = make_mesh(data=n_chips)
    rng = jax.random.PRNGKey(0)
    state, _, _ = downstream_engine.create_train_state(cfg, mesh, rng, 1000, 10)
    step = downstream_engine.make_train_step(cfg, mesh)

    B = args.batch * n_chips
    rs = np.random.RandomState(0)
    vols = downstream_engine._to_device(
        rs.rand(B, cfg.VIT.IN_CHANS, 96, 96, 96).astype(np.float16),
        mesh, np.float16)
    tgt = downstream_engine._to_device(
        rs.randint(0, cfg.DATA.NUM_CLASSES, size=B).astype(np.int32),
        mesh, np.int32)

    # compile + warm
    state, m = step(state, vols, tgt, rng)
    first = float(jax.device_get(m["loss"]))
    assert np.isfinite(first), first

    best = float("inf")
    for _ in range(RUNS):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, m = step(state, vols, tgt, rng)
        final = float(jax.device_get(m["loss"]))
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(final), final

    per_step = best / STEPS
    print(json.dumps({
        "metric": "volumes/sec/chip (downstream train step)",
        "batch_per_chip": args.batch,
        "lock": bool(args.lock),
        "classifier": args.classifier,
        "value": round(args.batch / per_step, 2),
        "unit": "volumes/s/chip",
        "ms_per_step": round(per_step * 1e3, 1),
    }))


if __name__ == "__main__":
    main()
