"""Micro-benchmark: attention forward+backward at workload shapes.

Compares the Pallas fused custom-VJP kernel against XLA's fused attention on
the shapes that matter: MAE encoder [B,129,12,64], MAE decoder [B,513,16,48],
DINO student [4B,513,12,64]. Reports achieved TF/s (flops = 4*T^2*D_model per
layer-equivalent fwd, x3.5 for fwd+bwd with recompute).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_attention.py
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

STEPS = 20
RUNS = 3

SHAPES = [
    ("mae_encoder", (32, 129, 12, 64)),
    ("mae_decoder", (32, 513, 16, 48)),
    ("dino_student", (128, 513, 12, 64)),
]


def bench(fn, q, k, v, w):
    """fwd+bwd chained STEPS times; one value fetch. Everything is an
    argument — closure constants blow the remote-compile payload limit."""

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
    from headct_foundation_tpu.ops.flash_attention import fused_attention

    out = {}
    for name, (B, T, H, D) in SHAPES:
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(B, T, H, D), jnp.bfloat16)
        k = jnp.asarray(rng.randn(B, T, H, D), jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, T, H, D), jnp.bfloat16)
        w = jnp.asarray(rng.randn(B, T, H, D), jnp.bfloat16)

        flops_fwd = 4 * B * H * T * T * D  # QK^T + PV
        res = {}
        for label, fn in [
            ("pallas", lambda q, k, v: fused_attention(q, k, v, None)),
            ("xla", lambda q, k, v: jax.nn.dot_product_attention(q, k, v)),
        ]:
            dt = bench(fn, q, k, v, w)
            res[label] = {
                "ms": round(dt * 1e3, 2),
                "tf_s_fwd_bwd": round(flops_fwd * 3.5 / dt / 1e12, 1),
            }
        out[name] = res
        print(json.dumps({name: res}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
