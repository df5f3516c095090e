"""hu8-vs-hu16 end-to-end equivalence study (VERDICT r4 ask #5).

The voxel-level error bounds are pinned in tests/test_wire_format.py (hu8
worst windowed error: brain 6.3e-3, subdural 2.5e-3, bone 1.2e-2 — ~10x
below the training augmentation's U(-0.1, 0.1) intensity shifts). This tool
measures what actually matters at the TRAINING and FEATURE level, on the
flagship model:

 1. **Trajectory A/B**: N steps of the production MAE train step (same
    init, same rng, same underlying HU volumes) fed hu8 vs hu16 wire;
    per-step |Δloss| and relative divergence.
 2. **Feature cosine**: ViT-B CLS embeddings of the same volumes decoded
    through hu8 vs hu16 windows; per-scan cosine similarity (target:
    >= 0.999 — BASELINE's embedding-parity bar).

Measured verdict (wire_equivalence.json, this round): TRAINING-level
equivalence holds overwhelmingly (300 flagship steps, mean relative
|Δloss| 4.4e-5, max 8.1e-5 — the curves are indistinguishable), while
FEATURE-level cosine fails the 0.999 bar (random-init encoder 0.89-0.91;
the 3000-step trained encoder 0.80-0.85 — training makes the features MORE
sensitive to hu8's bone-window coarsening, not less). Policy encoded in
``resolve_wire_format``: 'auto' may pick hu8 for TRAINING loaders (the only
surface that ever reads the wire format — trajectory-equivalent, and the
precision loss sits ~10x below the augmentation's own intensity jitter);
the inference/feature path ships lossless int16 HU and never touches hu8,
so the failed feature bar constrains nothing in production — but it is the
measured reason hu8 stays opt-in/auto-only and never a global default.

Usage (chip-attached):  python tools/wire_equivalence.py --steps 300
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_hu_pool(n: int, roi: int, seed: int = 0) -> np.ndarray:
    """Structured volumes in HU: smooth soft-tissue fields + bone-bright
    ellipsoids + air pockets — content in every window's range."""
    from scipy.ndimage import zoom

    rng = np.random.RandomState(seed)
    pool = np.empty((n, 1, roi, roi, roi), np.float32)
    ax = np.arange(roi, dtype=np.float32)
    for i in range(n):
        coarse = rng.rand(6, 6, 6).astype(np.float32)
        vol = zoom(coarse, roi / 6.0, order=1)[:roi, :roi, :roi]
        vol = vol * 160.0 - 80.0  # soft tissue
        for _ in range(3):  # bone-bright structures
            c = rng.uniform(0.2 * roi, 0.8 * roi, 3)
            r = rng.uniform(roi / 12, roi / 6, 3)
            d2 = (((ax[:, None, None] - c[0]) / r[0]) ** 2
                  + ((ax[None, :, None] - c[1]) / r[1]) ** 2
                  + ((ax[None, None, :] - c[2]) / r[2]) ** 2)
            vol = vol + rng.uniform(800, 1800) * np.exp(-0.5 * d2)
        c = rng.uniform(0.3 * roi, 0.7 * roi, 3)  # air pocket
        d2 = (((ax[:, None, None] - c[0]) / (roi / 10)) ** 2
              + ((ax[None, :, None] - c[1]) / (roi / 10)) ** 2
              + ((ax[None, None, :] - c[2]) / (roi / 10)) ** 2)
        vol = vol - 1000.0 * np.exp(-0.5 * d2)
        pool[i, 0] = np.round(vol)
    return pool


def trajectory_ab(steps: int, batch: int, pool_hu: np.ndarray):
    """Same state/rng/data, hu8 vs hu16 wire; returns both loss series."""
    import jax
    import jax.numpy as jnp

    from headct_foundation_tpu.config import default_config
    from headct_foundation_tpu.data.transforms import hu8_encode, hu16_encode
    from headct_foundation_tpu.engines import mae_engine
    from headct_foundation_tpu.parallel.mesh import make_mesh

    cfg = default_config()
    cfg.merge_from_file(os.path.join(REPO, "configs/mae/mae_HeadCT.yaml"))
    cfg.TRAIN.BASE_LR = cfg.TRAIN.BASE_LR * batch / 256
    cfg.TRAIN.MIN_LR = cfg.TRAIN.BASE_LR * 1e-3
    mesh = make_mesh(data=len(jax.devices()))
    rng = jax.random.PRNGKey(0)

    # device-resident wire pools (WAN mount: no H2D in the step loop)
    pool16 = jnp.asarray(hu16_encode(pool_hu))
    pool8 = jnp.asarray(hu8_encode(pool_hu))

    results = {}
    for wire, dev_pool in (("hu16", pool16), ("hu8", pool8)):
        c = cfg.clone()
        c.DATA.WIRE_FORMAT = wire
        state, _, lr_sched = mae_engine.create_train_state(
            c, mesh, rng, total_steps=steps,
            num_warmup_steps=max(1, steps // 20),
        )
        step_fn = mae_engine.make_train_step(mesh, augment=True, config=c)
        losses, pending = [], []
        rng_np = np.random.RandomState(7)
        for s in range(steps):
            idx = jnp.asarray(rng_np.randint(0, len(pool_hu), size=batch))
            vols = jnp.take(dev_pool, idx, axis=0)
            state, metrics = step_fn(state, vols, rng)
            pending.append(metrics["loss"])
            if len(pending) >= 16:
                losses.extend(float(x) for x in jax.device_get(pending))
                pending = []
        losses.extend(float(x) for x in jax.device_get(pending))
        results[wire] = losses
        print(f"[wire-ab] {wire}: {losses[0]:.4f} -> "
              f"{np.mean(losses[-10:]):.4f}", flush=True)
    return results


def feature_cosine(pool_hu: np.ndarray, batch: int = 4,
                   checkpoint: str = None):
    """ViT-B CLS embedding cosine: hu8-decoded windows vs hu16-decoded.

    ``checkpoint`` loads trained weights (e.g. the transfer study's MAE
    encoder) — the meaningful protocol: a TRAINED encoder's features are
    what the 0.999 parity bar is about, and training contracts the
    perturbation amplification a random-init deep stack exhibits
    (measured: random-init cosine ~0.89-0.91 on the same inputs)."""
    import jax

    from headct_foundation_tpu.data.transforms import (
        hu8_encode,
        hu8_window_stack,
        hu16_encode,
        hu16_window_stack,
    )
    from headct_foundation_tpu.feature_extraction import FeatureExtractor

    import jax.numpy as jnp

    ext = FeatureExtractor(
        checkpoint_path=checkpoint,
        img_size=pool_hu.shape[-1], patch_size=12, in_chans=3,
        hidden_size=768, mlp_dim=3072, num_layers=12, num_heads=12,
        pos_embed="sincos", qkv_bias=True, dtype=jnp.bfloat16,
    )
    cos = []
    for s in range(0, len(pool_hu), batch):
        chunk = pool_hu[s:s + batch]
        w16 = np.stack([hu16_window_stack(hu16_encode(v), 3) for v in chunk])
        w8 = np.stack([hu8_window_stack(hu8_encode(v), 3) for v in chunk])
        e16 = ext.cls_embedding(w16)
        e8 = ext.cls_embedding(w8)
        num = (e16 * e8).sum(axis=1)
        den = np.linalg.norm(e16, axis=1) * np.linalg.norm(e8, axis=1)
        cos.extend((num / (den + 1e-12)).tolist())
    return cos


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--pool", type=int, default=64)
    ap.add_argument("--cosine-scans", type=int, default=16)
    ap.add_argument("--checkpoint", default=None,
                    help="trained weights for the feature-cosine stage "
                    "(MAE/DINO checkpoint; merged with prefix-strip "
                    "semantics). Without it the cosine measures a "
                    "random-init stack's perturbation amplification.")
    ap.add_argument("--out-prefix",
                    default=os.path.join(REPO, "wire_equivalence"))
    args = ap.parse_args()

    import jax

    t0 = time.time()
    roi = 96
    pool = make_hu_pool(args.pool, roi)
    traj = trajectory_ab(args.steps, args.batch, pool)
    cos = feature_cosine(pool[: args.cosine_scans],
                         checkpoint=args.checkpoint)

    l16 = np.asarray(traj["hu16"])
    l8 = np.asarray(traj["hu8"])
    d = np.abs(l8 - l16)
    scale = np.maximum(np.abs(l16), 1e-3)
    result = {
        "steps": args.steps,
        "batch": args.batch,
        "loss_hu16_start": float(l16[0]),
        "loss_hu16_final": float(np.mean(l16[-10:])),
        "loss_hu8_final": float(np.mean(l8[-10:])),
        "max_abs_dloss": float(d.max()),
        "mean_rel_dloss": float((d / scale).mean()),
        "max_rel_dloss": float((d / scale).max()),
        "feature_cosine_min": float(np.min(cos)),
        "feature_cosine_mean": float(np.mean(cos)),
        "feature_encoder": ("trained:" + os.path.basename(args.checkpoint)
                            if args.checkpoint else "random-init"),
        "equivalent_training": bool(float((d / scale).mean()) <= 0.02),
        "equivalent_features": bool(float(np.min(cos)) >= 0.999),
        "losses_hu16": [round(x, 5) for x in l16.tolist()],
        "losses_hu8": [round(x, 5) for x in l8.tolist()],
        "wall_s": round(time.time() - t0, 1),
        "backend": jax.default_backend(),
    }
    with open(args.out_prefix + ".json.tmp", "w") as f:
        json.dump(result, f)
    os.replace(args.out_prefix + ".json.tmp", args.out_prefix + ".json")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(11, 3.6), dpi=130)
    x = np.arange(1, len(l16) + 1)
    axes[0].plot(x, l16, color="#2563eb", lw=1.0, label="hu16 wire")
    axes[0].plot(x, l8, color="#d97706", lw=1.0, ls="--", label="hu8 wire")
    axes[0].set_xlabel("step")
    axes[0].set_ylabel("MAE loss")
    axes[0].set_title("flagship MAE trajectory: hu8 vs hu16 wire",
                      fontsize=10)
    axes[0].legend(fontsize=8, frameon=False)
    axes[1].plot(x, d / scale, color="#6b7280", lw=0.9)
    axes[1].set_yscale("log")
    axes[1].set_xlabel("step")
    axes[1].set_ylabel("relative |Δloss|")
    axes[1].set_title(
        f"divergence (mean {result['mean_rel_dloss']:.2e}); feature cosine "
        f"min {result['feature_cosine_min']:.5f}", fontsize=10,
    )
    for ax in axes:
        ax.grid(True, color="#e5e7eb", lw=0.6)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
    fig.tight_layout()
    fig.savefig(args.out_prefix + ".png", bbox_inches="tight")

    print(json.dumps({k: v for k, v in result.items()
                      if not k.startswith("losses")}))


if __name__ == "__main__":
    main()
