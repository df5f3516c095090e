"""Op-level profile of a jitted train step (MAE or DINO) on the real chip.

Captures a jax.profiler trace of K steady-state steps and parses it with
xprof's op_profile converter (the ROUND_NOTES recipe, now a committed tool),
printing the top HLO categories and the top individual ops by self-time —
the measurement that drives kernel-level optimization decisions.

Usage:
  PYTHONPATH=/root/repo:$PYTHONPATH python tools/op_profile.py --engine dino --batch 16
  PYTHONPATH=/root/repo:$PYTHONPATH python tools/op_profile.py --engine mae --batch 32
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 6


def _mae_step_fn(cfg_dir):
    from headct_foundation_tpu.config import default_config
    from headct_foundation_tpu.engines import mae_engine
    from headct_foundation_tpu.parallel.mesh import make_mesh

    cfg = default_config()
    cfg.merge_from_file(os.path.join(cfg_dir, "configs/mae/mae_HeadCT.yaml"))
    mesh = make_mesh(data=len(jax.devices()))
    rng = jax.random.PRNGKey(0)
    state, _, _ = mae_engine.create_train_state(cfg, mesh, rng, 1000, 10)
    step = mae_engine.make_train_step(mesh, augment=True, config=cfg)
    return cfg, mesh, state, step, rng, mae_engine


def _run_mae(batch):
    cfg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg, mesh, state, step, rng, eng = _mae_step_fn(cfg_dir)
    data = eng._to_device_batch(
        np.random.RandomState(0).rand(batch, cfg.MAE.IN_CHANS, 96, 96, 96)
        .astype(np.float16), mesh)

    def run_one(s):
        s, m = step(s, data, rng)
        return s, m["loss"]

    return state, run_one


def _run_dino(batch):
    from headct_foundation_tpu.config import default_config
    from headct_foundation_tpu.engines import dino_engine
    from headct_foundation_tpu.parallel.mesh import make_mesh

    cfg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = default_config()
    cfg.merge_from_file(os.path.join(cfg_dir, "configs/dino/dino_HeadCT.yaml"))
    mesh = make_mesh(data=len(jax.devices()))
    rng = jax.random.PRNGKey(0)
    state = dino_engine.create_train_state(cfg, mesh, rng, 1000, 10, 100)[0]
    step = dino_engine.make_train_step(cfg, mesh)
    data = dino_engine._to_device_batch(
        np.random.RandomState(0).rand(batch, cfg.VIT.IN_CHANS, 96, 96, 96)
        .astype(np.float16), mesh)
    m, temp, cancel = jnp.float32(0.996), jnp.float32(0.04), jnp.float32(1.0)

    def run_one(s):
        s, metrics = step(s, data, rng, m, temp, cancel)
        return s, metrics["loss"]

    return state, run_one


def capture(state, run_one, trace_dir):
    # compile + warm outside the trace
    state, loss = run_one(state)
    assert np.isfinite(float(jax.device_get(loss)))
    jax.profiler.start_trace(trace_dir)
    for _ in range(STEPS):
        state, loss = run_one(state)
    jax.block_until_ready(loss)
    jax.profiler.stop_trace()
    return float(jax.device_get(loss))


def parse_op_profile(trace_dir, top_n=18):
    """Print category + top-op breakdowns from byProgramExcludeIdle
    (this xprof build groups program -> category -> op)."""
    from xprof.convert.raw_to_tool_data import xspace_to_tool_data

    files = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    assert files, f"no xplane.pb under {trace_dir}"
    data, _ = xspace_to_tool_data(files, "op_profile", {})
    tree = json.loads(data) if isinstance(data, (str, bytes)) else data

    # program -> category -> op on this xprof build; older builds emit a
    # byCategory root (category -> op) — handle both so a captured trace is
    # never wasted on a format mismatch.
    if "byProgramExcludeIdle" in tree:
        root = tree["byProgramExcludeIdle"]
        programs = root.get("children", [])
    else:
        root = tree.get("byCategory", tree)
        programs = [root]
    total = root["metrics"]["rawTime"]
    cats, ops = {}, []
    for prog in programs:
        for cat in prog.get("children", []):
            cats[cat["name"]] = cats.get(cat["name"], 0) + cat["metrics"].get(
                "rawTime", 0
            )
            for op in cat.get("children", []):
                ops.append((op["metrics"].get("rawTime", 0) / total,
                            cat["name"], op["name"],
                            op["metrics"].get("occurrences", 0)))

    print(f"\n== categories (fraction of {total/1e12:.3f}s device time; rawTime is ps) ==")
    for name, t in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {t/total*100:5.1f}%  {name}")
    ops.sort(reverse=True)
    print(f"\n== top {top_n} ops by self time ==")
    for frac, cat, name, occ in ops[:top_n]:
        print(f"  {frac*100:5.1f}%  [{cat}] {name[:90]} x{occ}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", choices=("mae", "dino"), default="dino")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--keep", action="store_true",
                    help="keep the trace dir (prints its path)")
    args = ap.parse_args()

    state, run_one = (_run_mae if args.engine == "mae" else _run_dino)(args.batch)
    tmp = tempfile.mkdtemp(prefix=f"opprof_{args.engine}_")
    loss = capture(state, run_one, tmp)
    print(f"traced {STEPS} {args.engine} steps (batch {args.batch}), "
          f"final loss {loss:.4f}; trace: {tmp if args.keep else '(deleted)'}")
    parse_op_profile(tmp)
    if not args.keep:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
