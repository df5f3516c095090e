"""DINO semantics study: does class structure emerge at toy scale?

VERDICT r4 ask #2. Round 4 established the collapse-mode map: at K=256 /
tiny-ViT scale with teacher temp 0.01, the DINO loss descends below the
ln(K) uniform fixed point and never returns (the sharpening regime; slow
test ``test_dino_descends_below_lnk_in_sharpening_regime``). What remained
open is whether TEACHER-FEATURE CLASS STRUCTURE emerges with enough steps —
the reference's own semantic evidence needs ~1.1M volume views (361k scans
x epochs; its wandb curve descends 11.29 -> 6.50 over 4,479 steps at global
batch 256 ~= 1.1M crop views, BASELINE.md).

This tool runs the REAL DINO engine epoch loop at toy scale (cheap: ~ms
steps) for THOUSANDS of steps under a recipe-shaped schedule horizon
("first N epochs of a 150-epoch recipe"), and measures per epoch:

* **centroid accuracy**: teacher CLS features on a held-out probe corpus of
  the same latent classes; class centroids fit on half the probe set,
  nearest-centroid (cosine) classification accuracy on the other half.
  Chance = 1/K_data.
* **within/between cosine ratio**: mean same-class vs cross-class feature
  cosine — a threshold-free clustering signal.

Output: ``dino_semantics.json`` + ``.png`` — either above-chance class
structure (semantics emerge) or a views-budget scaling curve (accuracy vs
steps at multiple horizons), making the "needs ~1.1M views" claim
quantitative instead of asserted.

Usage:
  python tools/dino_semantics.py --epochs 40 --steps-per-epoch 100
  python tools/dino_semantics.py --scaling   # 3-horizon scaling measurement
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.trajectory import RecordingRun, SyntheticLoader, make_class_pool

K_DATA = 4          # latent data classes
FIELD = 32          # pool volumes are FIELD^3; global crops are ROI^3


def tiny_cfg():
    """The sharpening-regime tiny config (matches the slow test
    test_dino_descends_below_lnk_in_sharpening_regime: K=256 prototypes,
    2-layer ViT, teacher temp 0.01 — the regime where the loss descends
    below ln K and stays)."""
    from headct_foundation_tpu.config import default_config

    cfg = default_config()
    cfg.MODEL.ROI = [24, 24, 24]
    cfg.MODEL.IN_CHANS = 1
    cfg.VIT.INPUT_SIZE = 24
    cfg.VIT.PATCH_SIZE = 12
    cfg.VIT.IN_CHANS = 1
    cfg.VIT.HIDDEN_SIZE = 48
    cfg.VIT.MLP_DIM = 96
    cfg.VIT.NUM_LAYERS = 2
    cfg.VIT.NUM_HEADS = 4
    cfg.VIT.NUM_REGISTER_TOKENS = 2
    cfg.VIT.USE_BIAS = True
    cfg.DINO.HEAD_N_PROTOTYPES = 256
    cfg.DINO.HEAD_HIDDEN_DIM = 64
    cfg.DINO.BOTTLENECK_DIM = 16
    cfg.DINO.LOCAL_CROP_NUM = 2
    cfg.DINO.GLOBAL_CROP_SIZE = [24, 24, 24]
    cfg.DINO.LOCAL_CROP_SIZE = [16, 16, 16]
    cfg.DINO.USE_BN = False
    cfg.DINO.TEACHER_TEMP = 0.01
    cfg.DINO.WARMUP_TEACHER_TEMP = 0.01
    cfg.DINO.WARMUP_TEACHER_EPOCHS = 0
    cfg.DINO.FREEZE_LAST_LAYER = 1
    cfg.TRAIN.BASE_LR = 5e-4
    cfg.TRAIN.MIN_LR = 5e-7
    cfg.TRAIN.GRAD_CLIP = 1.0
    return cfg


def make_probe_fn(cfg, mesh, batch):
    """Jitted teacher-CLS feature extractor over the probe pool."""
    import jax
    import jax.numpy as jnp

    from headct_foundation_tpu.engines.dino_engine import build_vit_model
    from headct_foundation_tpu.ops.attention import attention_mesh
    from headct_foundation_tpu.parallel.mesh import batch_sharding

    backbone = build_vit_model(cfg)

    def feats(params, vols):
        with attention_mesh(mesh):
            tokens, _ = backbone.apply(
                {"params": params}, vols.astype(jnp.bfloat16)
            )
            return tokens[:, 0, :].astype(jnp.float32)

    return jax.jit(feats, in_shardings=(None, batch_sharding(mesh)))


def teacher_features(state, probe_fn, pool, mesh, batch):
    import jax

    from headct_foundation_tpu.parallel.mesh import shard_batch

    out = []
    n = len(pool)
    for s in range(0, n, batch):
        idx = np.arange(s, min(s + batch, n))
        real = len(idx)
        if real < batch:
            idx = np.concatenate([idx, np.full(batch - real, idx[-1])])
        vols, _ = shard_batch(np.asarray(pool[idx], np.float32), mesh)
        out.append(np.asarray(jax.device_get(
            probe_fn(state.teacher_params["backbone"], vols)
        ))[:real])
    return np.concatenate(out, axis=0)


def class_structure(feats, labels):
    """(centroid accuracy, within/between cosine). STRATIFIED fit/eval
    split (alternating samples within each class — a plain even/odd index
    split would put only half the classes in each side since labels cycle
    i % K). Features are mean-centered (fit-half mean) before cosine:
    near-collapsed teacher features all have pairwise cosine ~1 against
    the raw origin, hiding any residual class structure."""
    idx = np.arange(len(feats))
    fit, ev = (idx // K_DATA) % 2 == 0, (idx // K_DATA) % 2 == 1
    f = feats - feats[fit].mean(axis=0, keepdims=True)
    f /= np.linalg.norm(f, axis=1, keepdims=True) + 1e-8
    cents = np.stack([
        f[fit & (labels == k)].mean(axis=0) for k in range(K_DATA)
    ])
    cents /= np.linalg.norm(cents, axis=1, keepdims=True) + 1e-8
    pred = (f[ev] @ cents.T).argmax(axis=1)
    acc = float((pred == labels[ev]).mean())

    sims = f @ f.T
    same = labels[:, None] == labels[None, :]
    off = ~np.eye(len(f), dtype=bool)
    within = float(sims[same & off].mean())
    between = float(sims[~same].mean())
    return acc, within, between


def run(epochs, steps, batch, sched_epochs, seed=1, on_epoch=None,
        probe_n=160):
    """Real DINO engine loop + per-epoch teacher diagnostics."""
    import jax

    from headct_foundation_tpu.engines import dino_engine
    from headct_foundation_tpu.parallel.mesh import make_mesh

    cfg = tiny_cfg()
    mesh = make_mesh(data=len(jax.devices()))
    rng = jax.random.PRNGKey(seed)
    horizon = sched_epochs * steps
    state, _, lr_sched, wd_sched, mom_sched, temp_sched = (
        dino_engine.create_train_state(
            cfg, mesh, rng, horizon, num_warmup_steps=30, niter_per_ep=steps,
        )
    )
    train_step = dino_engine.make_train_step(cfg, mesh)
    pool = make_class_pool(128, 1, FIELD, k_classes=K_DATA, seed=0,
                           class_seed=0)
    probe = make_class_pool(probe_n, 1, FIELD, k_classes=K_DATA, seed=7,
                            class_seed=0)
    probe_y = (np.arange(probe_n) % K_DATA).astype(np.int32)
    # probe volumes enter at the GLOBAL-CROP size the backbone trains on:
    # center-crop FIELD^3 -> ROI^3 (the teacher sees 24^3 global crops)
    r = cfg.MODEL.ROI[0]
    s0 = (FIELD - r) // 2
    probe_roi = probe[:, :, s0:s0 + r, s0:s0 + r, s0:s0 + r]
    probe_fn = make_probe_fn(cfg, mesh, batch)

    loader = SyntheticLoader(pool, batch, steps)
    rec = RecordingRun()
    diags = []
    for epoch in range(epochs):
        loader.set_epoch(epoch)
        state, _ = dino_engine.train_one_epoch(
            cfg, state, train_step, loader, mesh, rng, lr_sched, wd_sched,
            mom_sched, temp_sched, epoch, sched_epochs, wandb_run=rec,
        )
        feats = teacher_features(state, probe_fn, probe_roi, mesh, batch)
        acc, within, between = class_structure(feats, probe_y)
        diags.append({
            "epoch": epoch,
            "step": (epoch + 1) * steps,
            "views": (epoch + 1) * steps * batch * (2 + cfg.DINO.LOCAL_CROP_NUM),
            "centroid_acc": round(acc, 4),
            "within_cos": round(within, 4),
            "between_cos": round(between, 4),
            "loss_tail": round(float(np.mean(rec.losses[-20:])), 4),
        })
        if on_epoch:
            on_epoch(diags)
        print(f"[dino-sem] epoch {epoch + 1}/{epochs} loss "
              f"{diags[-1]['loss_tail']:.3f} acc {acc:.3f} "
              f"(chance {1 / K_DATA:.3f}) w/b "
              f"{within:.3f}/{between:.3f}", flush=True)
    return cfg, rec, diags


def save_png(result, path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    runs = result["runs"]
    fig, axes = plt.subplots(1, 2, figsize=(11, 3.6), dpi=130)
    colors = ["#2563eb", "#059669", "#d97706"]
    ax = axes[0]
    for run_d, color in zip(runs, colors):
        losses = run_d["losses"]
        ax.plot(np.arange(1, len(losses) + 1), losses, color=color, lw=0.9,
                label=f"{run_d['total_steps']} steps")
    ax.axhline(np.log(256), color="#ef4444", lw=0.8, ls="--", label="ln K")
    ax.set_xlabel("step")
    ax.set_ylabel("DINO loss")
    ax.set_title("sharpening-regime loss (tiny scale, temp 0.01)", fontsize=10)
    ax.legend(fontsize=8, frameon=False)

    ax = axes[1]
    for run_d, color in zip(runs, colors):
        d = run_d["diags"]
        ax.plot([x["views"] for x in d], [x["centroid_acc"] for x in d],
                color=color, lw=1.6, marker="o", ms=3,
                label=f"{run_d['total_steps']} steps")
    ax.axhline(1 / K_DATA, color="#ef4444", lw=0.8, ls="--",
               label=f"chance (1/{K_DATA})")
    ax.set_xlabel("crop views seen")
    ax.set_ylabel("teacher centroid accuracy")
    ax.set_ylim(0, 1.02)
    ax.set_title("teacher-feature class structure vs views budget",
                 fontsize=10)
    ax.legend(fontsize=8, frameon=False)
    for ax in axes:
        ax.grid(True, color="#e5e7eb", lw=0.6)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
    fig.tight_layout()
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--steps-per-epoch", type=int, default=100)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--sched-epochs", type=int, default=150)
    ap.add_argument("--scaling", action="store_true",
                    help="3-horizon views-budget scaling measurement")
    ap.add_argument("--out-prefix", default=None)
    args = ap.parse_args()

    import jax

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prefix = args.out_prefix or os.path.join(repo_root, "dino_semantics")
    t0 = time.time()

    horizons = ([(args.epochs // 4, args.steps_per_epoch),
                 (args.epochs // 2, args.steps_per_epoch),
                 (args.epochs, args.steps_per_epoch)]
                if args.scaling else [(args.epochs, args.steps_per_epoch)])

    runs = []
    for epochs, steps in horizons:
        cfg, rec, diags = run(epochs, steps, args.batch, args.sched_epochs)
        runs.append({
            "total_steps": epochs * steps,
            "batch": args.batch,
            "losses": [round(l, 4) for l in rec.losses],
            "diags": diags,
            "final_acc": diags[-1]["centroid_acc"],
            "max_acc": max(d["centroid_acc"] for d in diags),
        })
        # partial flush so long runs survive a timeout
        result = {
            "k_data": K_DATA,
            "chance": 1 / K_DATA,
            "teacher_temp": 0.01,
            "prototypes": 256,
            "runs": runs,
            "wall_s": round(time.time() - t0, 1),
            "backend": jax.default_backend(),
        }
        with open(prefix + ".json.tmp", "w") as f:
            json.dump(result, f, indent=1)
        os.replace(prefix + ".json.tmp", prefix + ".json")
    save_png(result, prefix + ".png")
    best = max(r["max_acc"] for r in runs)
    result["semantics_emerged"] = bool(best > 1 / K_DATA + 0.15)
    # distinguish EMERGED from RETAINED: at long horizons the toy-scale
    # teacher's class structure peaks mid-run and then erodes as the
    # centering force re-wins through the EMA (the same meta-stability the
    # loss artifacts show) — final_acc can sit near chance while max_acc
    # is 2x chance. Both facts belong in the artifact.
    result["retained_at_end"] = bool(
        runs[-1]["final_acc"] > 1 / K_DATA + 0.1
    )
    with open(prefix + ".json.tmp", "w") as f:
        json.dump(result, f, indent=1)
    os.replace(prefix + ".json.tmp", prefix + ".json")
    print(json.dumps({
        "semantics_emerged": result["semantics_emerged"],
        "retained_at_end": result["retained_at_end"],
        "best_centroid_acc": best,
        "chance": 1 / K_DATA,
        "per_run_final": [(r["total_steps"], r["final_acc"]) for r in runs],
        "wall_s": result["wall_s"],
    }))


if __name__ == "__main__":
    try:
        from headct_foundation_tpu.parallel.mesh import respect_jax_platforms_env

        respect_jax_platforms_env()
    except Exception:
        pass
    main()
