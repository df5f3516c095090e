"""int8-vs-bf16 matmul microbenchmark at the MAE/DINO MLP shapes (VERDICT r2
ask #4 candidate).

v5e's MXU advertises 2x int8 throughput over bf16 (394 vs 197 TOPS). This
measures whether XLA actually delivers that on the shapes our MLP spends its
FLOPs on — [B*T, D] x [D, 4D] with D=768 — including the quantize/dequantize
overhead a real int8 training path would pay (dynamic per-tensor scales).
If the delivered speedup can't beat the quant overhead, int8-MLP is recorded
as a negative result and the training path stays bf16.

Usage: python tools/bench_int8.py
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

RUNS = 3
CHAIN = 16  # matmuls per timed dispatch


def _chain(op, a, b):
    """Time CHAIN dependent matmuls inside one jit and fetch a VALUE: on a
    remote-attached chip block_until_ready can return before the computation
    finishes (ROUND_NOTES), so only a value fetch is a reliable fence, and
    the chain amortizes the relay RTT. Each iteration rolls the operand by a
    data-dependent amount derived from a FULL reduction of the result — every
    output element is live, so XLA can neither dead-code-slice the matmul
    (an earlier version consumed only out[0,0] and the compiled HLO reduced
    the whole matmul to a [1,1] contraction) nor break the dependency."""

    @jax.jit
    def chained(a, b):
        def body(carry, _):
            out = op(carry, b)
            tot = jnp.sum(out.astype(jnp.float32))
            shift = tot.astype(jnp.int32) % 2
            return jnp.roll(carry, shift, axis=0), tot
        _, vals = jax.lax.scan(body, a, None, length=CHAIN)
        return vals

    float(np.asarray(jax.device_get(chained(a, b)))[-1])  # compile + warm
    best = float("inf")
    for _ in range(RUNS):
        t0 = time.perf_counter()
        v = chained(a, b)
        float(np.asarray(jax.device_get(v))[-1])
        best = min(best, (time.perf_counter() - t0) / CHAIN)
    return best


def main() -> None:
    # MAE decoder MLP: [B=32, T=513] tokens, D=768 -> 3072 -> 768 (both halves)
    shapes = [
        ("mae_mlp", (32 * 513, 768), (768, 3072)),
        ("qkv_proj", (32 * 513, 768), (768, 2304)),
    ]
    rng = np.random.RandomState(0)
    report = {}
    for name, a_shape, b_shape in shapes:
        a = jnp.asarray(rng.randn(*a_shape), jnp.bfloat16)
        b = jnp.asarray(rng.randn(*b_shape), jnp.bfloat16)

        t_bf16 = _chain(lambda x, y: x @ y, a, b)
        print(f"{name}: bf16 {t_bf16*1e3:.3f} ms", flush=True)

        def int8_static(a8, b8):
            # pre-quantized operands: the pure MXU int8 rate
            return jax.lax.dot_general(
                a8, b8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

        a8 = jnp.asarray(rng.randint(-127, 127, a_shape), jnp.int8)
        b8 = jnp.asarray(rng.randint(-127, 127, b_shape), jnp.int8)
        t_int8 = _chain(int8_static, a8, b8)

        def int8_dynamic(a, b):
            # what a training step would actually run: dynamic per-tensor
            # scales + quantize + int8 matmul + dequantize
            sa = jnp.max(jnp.abs(a)).astype(jnp.float32) / 127.0
            sb = jnp.max(jnp.abs(b)).astype(jnp.float32) / 127.0
            qa = jnp.clip(
                jnp.round(a.astype(jnp.float32) / sa), -127, 127
            ).astype(jnp.int8)
            qb = jnp.clip(
                jnp.round(b.astype(jnp.float32) / sb), -127, 127
            ).astype(jnp.int8)
            acc = jax.lax.dot_general(
                qa, qb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return (acc.astype(jnp.float32) * (sa * sb)).astype(jnp.bfloat16)

        t_dyn = _chain(int8_dynamic, a, b)

        flops = 2 * a_shape[0] * a_shape[1] * b_shape[1]
        report[name] = {
            "bf16_ms": round(t_bf16 * 1e3, 3),
            "bf16_TFs": round(flops / t_bf16 / 1e12, 1),
            "int8_prequant_ms": round(t_int8 * 1e3, 3),
            "int8_prequant_TFs": round(flops / t_int8 / 1e12, 1),
            "int8_dynamic_ms": round(t_dyn * 1e3, 3),
            "speedup_prequant": round(t_bf16 / t_int8, 2),
            "speedup_dynamic": round(t_bf16 / t_dyn, 2),
        }
        print(name, json.dumps(report[name]))
    print(json.dumps({"backend": jax.default_backend(), "report": report}))


if __name__ == "__main__":
    main()
