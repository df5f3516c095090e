"""Backend sweep for the SHORT-sequence attention path (flagship shapes).

The 96^3 flagship configs run all attention at T<=1024 where the dispatcher
(ops/attention.py) picks XLA below _PALLAS_MIN_T and the whole-sequence VMEM
Pallas kernel above. This tool measures fwd+bwd time at the REAL flagship
workload shapes for: XLA's fused attention, the VMEM kernel at each
(batch*head)-block size hb, and the blocked kernel at its auto blocks — so
the dispatch thresholds and the hb heuristic are chosen by measurement
(same method as tools/sweep_blocked_attention.py for the long-T path).

Usage: python tools/sweep_vmem_attention.py
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

# (label, (B, T, H, D)) — the flagship 96^3 attention shapes:
# MAE encoder keeps 25% of 512 patches + CLS; MAE decoder the full 513;
# DINO student/teacher ViT-B with CLS + 4 registers.
SHAPES = [
    ("mae_enc (T=129)", (32, 129, 12, 64)),
    ("mae_dec (T=513)", (32, 513, 16, 48)),
    ("dino_vit (T=517)", (16, 517, 12, 64)),
]


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

        def record(key, fn):
            try:
                res[key] = round(bench(fn, q, k, v, w) * 1e3, 3)
            except Exception as e:
                res[key] = f"FAIL: {type(e).__name__}"
            print(json.dumps({name: {key: res[key]}}), flush=True)

        record("xla", lambda q, k, v: jax.nn.dot_product_attention(q, k, v))
        orig = fa._bh_block
        for hb in (1, 2, 4, 8, 16):
            if (B * H) % hb:
                continue
            fa._bh_block = lambda bh_total, t_pad, _hb=hb: _hb
            record(f"vmem_hb{hb}",
                   lambda q, k, v: fa.fused_attention(q, k, v, None))
        fa._bh_block = orig
        record("vmem_auto", lambda q, k, v: fa.fused_attention(q, k, v, None))
        record("blocked_auto",
               lambda q, k, v: fa.blocked_fused_attention(q, k, v, None))
        out[name] = res
    print(json.dumps(out))


if __name__ == "__main__":
    main()
