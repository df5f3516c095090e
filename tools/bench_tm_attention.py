"""A/B micro-benchmark: token-major vs transpose-based VMEM attention.

Measures fwd+bwd per call at the workload shapes for (a) the production
[B*H, T, D] VMEM kernel (pays 8 full-tensor HBM transposes per call) and
(b) the token-major kernel (tools/experimental_tm_attention.py, no transposes).
Also cross-checks numerics (outputs + grads) between the two paths.

Usage: python tools/bench_tm_attention.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 20
RUNS = 3

SHAPES = [
    ("mae_encoder", (32, 129, 12, 64)),
    ("mae_decoder", (32, 513, 16, 48)),
    ("dino_student", (128, 517, 12, 64)),
    ("vit_96", (32, 513, 12, 64)),
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
    jax.device_get(losses)
    best = float("inf")
    for _ in range(RUNS):
        t0 = time.perf_counter()
        (_, _), losses = run(q, k, v, w)
        jax.device_get(losses[-1])
        best = min(best, time.perf_counter() - t0)
    return best / STEPS


def main() -> None:
    from headct_foundation_tpu.ops.flash_attention import fused_attention
    from experimental_tm_attention import fused_attention_tm

    out = {}
    for name, (B, T, H, D) in SHAPES:
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(B, T, H, D), jnp.bfloat16)
        k = jnp.asarray(rng.randn(B, T, H, D), jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, T, H, D), jnp.bfloat16)
        w = jnp.asarray(rng.randn(B, T, H, D), jnp.bfloat16)

        # numerics cross-check (fwd + grads) before timing. Everything is a
        # jit ARGUMENT — closure constants of this size stall the relay's
        # remote-compile payload path (ROUND_NOTES environment gotchas).
        def loss_a(q, k, v, w):
            return jnp.sum(fused_attention(q, k, v, None) * w)

        def loss_b(q, k, v, w):
            return jnp.sum(fused_attention_tm(q, k, v, None) * w)

        print(f"[{name}] compiling fwd a/b ...", flush=True)
        try:
            oa = jax.jit(lambda q, k, v: fused_attention(q, k, v, None))(q, k, v)
            ob = jax.jit(lambda q, k, v: fused_attention_tm(q, k, v, None))(q, k, v)
            print(f"[{name}] compiling grad a/b ...", flush=True)
            ga = jax.jit(jax.grad(loss_a))(q, k, v, w)
            gb = jax.jit(jax.grad(loss_b))(q, k, v, w)
        except Exception as e:  # VMEM stack OOM at T>=513 — record, move on
            msg = str(e)
            cut = msg.find("Scoped allocation")
            out[name] = {"error": msg[cut:cut + 120] if cut >= 0 else msg[:200]}
            print(json.dumps({name: out[name]}))
            continue
        o_err = float(jnp.max(jnp.abs(oa.astype(jnp.float32) - ob.astype(jnp.float32))))
        g_err = float(jnp.max(jnp.abs(ga.astype(jnp.float32) - gb.astype(jnp.float32))))

        res = {"max_abs_diff_out": o_err, "max_abs_diff_grad": g_err}
        for label, fn in [
            ("bhtd", lambda q, k, v: fused_attention(q, k, v, None)),
            ("tm", lambda q, k, v: fused_attention_tm(q, k, v, None)),
        ]:
            dt = bench(fn, q, k, v, w)
            res[label] = {"ms_per_call_fwd_bwd": round(dt * 1e3, 3)}
        res["speedup_tm"] = round(
            res["bhtd"]["ms_per_call_fwd_bwd"] / res["tm"]["ms_per_call_fwd_bwd"], 3
        )
        out[name] = res
        print(json.dumps({name: res}))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
