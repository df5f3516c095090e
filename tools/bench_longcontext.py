"""192^3 / 4096-token MAE train step — the long-context stretch config.

At INPUT_SIZE=192, patch 12, the MAE decoder runs 4097-token sequences and
the encoder 1025 — both beyond the whole-sequence VMEM attention path, so
the differentiable BLOCKED Pallas flash kernels carry the full training
step (ops/flash_attention.py: custom VJP, no [T, T] tensor in HBM in either
direction). This tool proves the config trains on the real chip and reports
step time (SURVEY.md §5 long-context row; grad parity vs XLA is covered by
tests/test_kernels.py on the CPU mesh).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_longcontext.py [--batch 2]
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

SCAN_STEPS = 4
RUNS = 2


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    args = ap.parse_args()

    from headct_foundation_tpu.config import default_config
    from headct_foundation_tpu.engines import mae_engine
    from headct_foundation_tpu.parallel.mesh import batch_sharding, make_mesh

    cfg = default_config()
    cfg_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs/mae/mae_HeadCT_192.yaml",
    )
    cfg.merge_from_file(cfg_path)  # the shipped 192^3 stretch recipe

    n_chips = len(jax.devices())
    mesh = make_mesh(data=n_chips)
    rng = jax.random.PRNGKey(0)
    state, _, _ = mae_engine.create_train_state(
        cfg, mesh, rng, total_steps=100, num_warmup_steps=0
    )
    batch = jnp.asarray(
        np.random.RandomState(0).randn(
            args.batch * n_chips, cfg.MAE.IN_CHANS, 192, 192, 192
        ),
        jnp.bfloat16,
    )
    batch = jax.device_put(batch, batch_sharding(mesh))

    def multi(state, b, r):
        def body(st, _):
            from headct_foundation_tpu.ops.attention import attention_mesh

            with attention_mesh(mesh):
                step_rng = jax.random.fold_in(r, st.step)
                mask_rng, _ = jax.random.split(step_rng)

                def loss_fn(params):
                    loss, _, _ = st.apply_fn(
                        {"params": params}, b, deterministic=False,
                        rngs={"mask": mask_rng},
                    )
                    return loss

                loss, grads = jax.value_and_grad(loss_fn)(st.params)
                return st.apply_gradients(grads=grads), loss

        return jax.lax.scan(body, state, None, length=SCAN_STEPS)

    run = jax.jit(multi, in_shardings=(None, batch_sharding(mesh), None),
                  donate_argnums=(0,))
    state, losses = run(state, batch, rng)
    first = np.asarray(jax.device_get(losses))
    assert np.isfinite(first).all(), first

    best = float("inf")
    for _ in range(RUNS):
        t0 = time.perf_counter()
        state, losses = run(state, batch, rng)
        last = float(np.asarray(jax.device_get(losses))[-1])
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(last), last

    print(json.dumps({
        "metric": "volumes/sec/chip (MAE 192^3 / 4096-token step, blocked Pallas attention)",
        "batch_per_chip": args.batch,
        "value": round(args.batch * SCAN_STEPS / best, 3),
        "unit": "volumes/s/chip",
        "ms_per_step": round(best / SCAN_STEPS * 1e3, 1),
        "final_loss": round(last, 4),
    }))


if __name__ == "__main__":
    main()
