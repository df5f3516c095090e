"""DINO pretrain step throughput (volumes/s/chip) at a given batch/remat.

Measures the full jitted DINO step (teacher+student forwards over 2 global +
N local crops, DINO loss, EMA teacher update) on the flagship recipe
(configs/dino/dino_HeadCT.yaml). K steps are dispatched back-to-back (state
donation chains them) and ONE final loss value is fetched — the chain cannot
complete early, and per-dispatch overhead (~2 ms) is noise against the step.

Usage:
  PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_dino.py --batch 32 --remat
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

STEPS = 8
RUNS = 3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--remat", action="store_true")
    args = ap.parse_args()

    from headct_foundation_tpu.config import default_config
    from headct_foundation_tpu.engines import dino_engine
    from headct_foundation_tpu.parallel.mesh import make_mesh

    cfg = default_config()
    cfg_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs/dino/dino_HeadCT.yaml",
    )
    if os.path.exists(cfg_path):
        cfg.merge_from_file(cfg_path)
    cfg.PARALLEL.REMAT = bool(args.remat)

    n_chips = len(jax.devices())
    mesh = make_mesh(data=n_chips)
    rng = jax.random.PRNGKey(0)
    state = dino_engine.create_train_state(cfg, mesh, rng, 1000, 10, 100)[0]
    step = dino_engine.make_train_step(cfg, mesh)

    batch_np = np.random.RandomState(0).rand(
        args.batch * n_chips, cfg.VIT.IN_CHANS, 96, 96, 96
    ).astype(np.float16)
    data = dino_engine._to_device_batch(batch_np, mesh)

    m = jnp.float32(0.996)
    temp = jnp.float32(0.04)
    cancel = jnp.float32(1.0)

    # compile + warm
    state, metrics = step(state, data, rng, m, temp, cancel)
    first = float(jax.device_get(metrics["loss"]))
    assert np.isfinite(first), first

    best = float("inf")
    for _ in range(RUNS):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, metrics = step(state, data, rng, m, temp, cancel)
        last = float(jax.device_get(metrics["loss"]))
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(last), last

    vps = args.batch * STEPS / best
    print(json.dumps({
        "metric": "volumes/sec/chip (DINO pretrain step)",
        "batch_per_chip": args.batch,
        "remat": bool(args.remat),
        "value": round(vps, 2),
        "unit": "volumes/s/chip",
        "ms_per_step": round(best / STEPS * 1e3, 1),
    }))


if __name__ == "__main__":
    main()
