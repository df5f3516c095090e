"""Block-size sweep for the BLOCKED flash-attention kernels (long context).

The 192^3 stretch config (configs/mae/mae_HeadCT_192.yaml) runs its encoder
at T=1025 and decoder at T=4097 — both on the blocked custom-VJP Pallas path
(ops/flash_attention.py). BLOCK_Q/BLOCK_K set the per-iteration matmul shapes
and the sequence padding (t_pad rounds up to max(block_q, block_k)); this
tool measures fwd+bwd step time per (block_q, block_k) at the real workload
shapes so the defaults are chosen by measurement, not convention.

Usage: python tools/sweep_blocked_attention.py
(no PYTHONPATH needed — and overriding it would drop the TPU plugin path)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 10
RUNS = 3

# 192^3 MAE shapes (B=2 as in tools/bench_longcontext.py)
SHAPES = [
    ("enc_192 (T=1025)", (2, 1025, 12, 64)),
    ("dec_192 (T=4097)", (2, 4097, 16, 48)),
]

BLOCKS = [(128, 128), (256, 128), (128, 256), (256, 256), (512, 256),
          (256, 512), (512, 512), (512, 1024), (1024, 512), (1024, 1024)]


def bench(fn, q, k, v, w):
    def run_fn(q, k, v, w):
        def step(carry, _):
            qq, i = carry

            def loss(qq, k, v):
                return jnp.sum(fn(qq, k, v) * w)

            l, g = jax.value_and_grad(loss)(qq, k, v)
            return (qq + g * 1e-30, i + 1), l

        return jax.lax.scan(step, (q, 0), None, length=STEPS)

    run = jax.jit(run_fn)
    (_, _), losses = run(q, k, v, w)
    jax.device_get(losses)  # compile+warm
    best = float("inf")
    for _ in range(RUNS):
        t0 = time.perf_counter()
        (_, _), losses = run(q, k, v, w)
        jax.device_get(losses[-1])
        best = min(best, time.perf_counter() - t0)
    return best / STEPS


def main() -> None:
    import headct_foundation_tpu.ops.flash_attention as fa

    out = {}
    for name, (B, T, H, D) in SHAPES:
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(B, T, H, D), jnp.bfloat16)
        k = jnp.asarray(rng.randn(B, T, H, D), jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, T, H, D), jnp.bfloat16)
        w = jnp.asarray(rng.randn(B, T, H, D), jnp.bfloat16)
        res = {}
        for bq, bk in BLOCKS:
            fa.BLOCK_Q, fa.BLOCK_K = bq, bk
            # fresh lambda per config: block sizes are read at trace time
            try:
                dt = bench(
                    lambda q, k, v: fa.blocked_fused_attention(q, k, v, None),
                    q, k, v, w,
                )
            except Exception as e:  # e.g. Mosaic VMEM exhaustion at big blocks
                res[f"bq{bq}_bk{bk}"] = f"FAIL: {type(e).__name__}"
                print(json.dumps({name: {f"bq{bq}_bk{bk}": res[f'bq{bq}_bk{bk}']}}),
                      flush=True)
                continue
            res[f"bq{bq}_bk{bk}"] = round(dt * 1e3, 3)
            print(json.dumps({name: {f"bq{bq}_bk{bk}": res[f"bq{bq}_bk{bk}"]}}),
                  flush=True)
        out[name] = res
    fa.BLOCK_Q, fa.BLOCK_K = None, None  # restore T-aware auto defaults
    print(json.dumps(out))


if __name__ == "__main__":
    main()
