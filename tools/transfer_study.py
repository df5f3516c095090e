"""Pretrain -> transfer study: prove the foundation-model loop COMPOSES.

The reference's entire reason to exist is transfer: a self-supervised
pretrained encoder beats baselines on downstream classification and
volume-retrieval (reference: README.md:96-104, images/performance1.png,
images/mAP_RSNA_Retrieval.png). The unit/dynamics suite validates every
mechanism in isolation (MAE descends, probes learn, retrieval math is
sklearn-checked); THIS tool composes them end-to-end and measures the thing
that matters — that pretraining produces *useful representations*:

 1. **Pretrain** the MAE on an UNLABELED corpus of K latent classes of
    warped-template volumes (``make_template_class_pool`` — anatomy-like:
    class-specific spatial arrangements, per-instance smooth warps +
    noise). Corpus design is MEASURED-IN, not assumed: grating corpora
    (``--corpus gratings``) are decoder-predictable from a few visible
    patches, so MAE pretraining there buys the probe nothing (kept as the
    documented negative); warped templates force the encoder into global
    class/deformation inference, the same job anatomy gives it.
 2. **Checkpoint** the encoder, then **linear/attentive-probe** it frozen
    (TRAIN.LOCK, the reference's --freeze path) on class-0-vs-class-1 with
    an identically-budgeted, identically-seeded probe from a RANDOM-init
    frozen encoder as the control. Report best val AUROC for both.
 3. **Retrieval**: CLS features over a fresh K-class corpus; same-class
    retrieval mAP (the reference's RSNA/CQ500 protocol, eval/retrieval.py),
    pretrained vs random.

Every stage goes through the production surfaces: the real MAE engine epoch
loop, ``save_checkpoint`` -> ``load_pretrained_into`` (content-routed, the
mains' path), the downstream engine train/val loops, and the retrieval eval.

Artifacts: ``transfer_mae.json`` + ``transfer_mae.png`` at the repo root
(or --out-prefix). Assertions (unless --no-assert): pretrained beats random
on BOTH probes by a clear margin.

Usage:
  # tiny scale (CPU mesh, ~minutes) — the slow test runs this shape
  python tools/transfer_study.py --scale tiny
  # flagship (real chip): ViT-B/96^3, a few thousand pretrain steps
  python tools/transfer_study.py --scale flagship --pretrain-steps 3000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.trajectory import (
    RecordingRun,
    SyntheticLabeledLoader,
    SyntheticLoader,
    make_class_pool,
)

K_CLASSES = 8  # pretrain/retrieval corpus latent classes; probe uses 0 vs 1


def make_hard_class_pool(n, in_chans, roi, k_classes=K_CLASSES, seed=0,
                         class_seed=0, noise=0.08, delta_deg=15.0):
    """FINE-GRAINED class corpus: every class shares the same two grating
    frequencies and a common first direction; class k differs ONLY by
    rotating the second grating's direction k * delta_deg degrees about a
    fixed axis. Per-sample random phases + smooth background jitter +
    voxel noise.

    Rationale (the easy corpus failed to separate encoders): with fully
    distinct class signatures, even a RANDOM-init encoder's nonlinear
    features expose the classes (measured: random-encoder probe AUROC 1.0,
    retrieval mAP 0.71 vs 0.12 chance). Discriminating a 15-degree
    orientation difference under noise, however, needs precise orientation
    ENERGY estimates — which MAE pretraining learns (the encoder must infer
    orientation/phase from visible patches to reconstruct masked ones) and
    random projections only blur."""
    rng = np.random.RandomState(seed)
    r1 = np.random.RandomState(class_seed + 500)
    ax = np.arange(roi, dtype=np.float32) / roi
    xx, yy, zz = ax[:, None, None], ax[None, :, None], ax[None, None, :]
    d0 = r1.randn(3).astype(np.float32)
    d0 /= np.linalg.norm(d0)
    # rotation axis orthogonal to the base second-direction
    d1 = r1.randn(3).astype(np.float32)
    d1 -= d1 @ d0 * d0
    d1 /= np.linalg.norm(d1)
    rot_axis = np.cross(d0, d1)
    rot_axis /= np.linalg.norm(rot_axis)
    freqs = (3.0, 4.5)

    def _rot(v, axis, theta):
        # Rodrigues rotation
        return (v * np.cos(theta) + np.cross(axis, v) * np.sin(theta)
                + axis * (axis @ v) * (1 - np.cos(theta)))

    from scipy.ndimage import zoom

    dirs_per_class = [
        (d0, _rot(d1, rot_axis, np.deg2rad(delta_deg) * k))
        for k in range(k_classes)
    ]
    pool = np.empty((n, in_chans, roi, roi, roi), np.float16)
    for i in range(n):
        k = i % k_classes
        vol = np.full((roi, roi, roi), 0.5, np.float32)
        for g, d in enumerate(dirs_per_class[k]):
            phase = rng.rand() * 2 * np.pi
            arg = 2 * np.pi * freqs[g] * (d[0] * xx + d[1] * yy + d[2] * zz)
            vol = vol + 0.16 * np.sin(arg + phase)
        coarse = rng.rand(4, 4, 4).astype(np.float32) - 0.5
        vol = vol + 0.12 * zoom(coarse, roi / 4.0, order=1)[:roi, :roi, :roi]
        vol = vol + noise * rng.randn(roi, roi, roi).astype(np.float32)
        vol = np.clip(vol, 0.0, 1.0)
        chans = [vol]
        while len(chans) < in_chans:
            c = len(chans)
            chans.append(np.clip(vol * (1.0 + 0.4 * c) - 0.15 * c, 0.0, 1.0))
        pool[i] = np.stack(chans[:in_chans]).astype(np.float16)
    return pool


class SequentialLabeledLoader:
    """Every sample exactly once, in order (val/retrieval batching). Last
    batch is padded by repeating the final sample; consumers slice via the
    with_counts contract... for val the duplicated rows are masked by the
    engine's n_real slicing (DevicePrefetcher with_counts)."""

    def __init__(self, pool, labels, batch):
        self.pool = pool
        self.labels = labels
        self.batch = batch

    def set_epoch(self, epoch):
        pass

    def __len__(self):
        return -(-len(self.pool) // self.batch)

    def close(self):
        pass

    def __iter__(self):
        n = len(self.pool)
        for s in range(0, n, self.batch):
            idx = np.arange(s, min(s + self.batch, n))
            real = len(idx)
            if real < self.batch:  # pad to the compiled batch shape
                idx = np.concatenate([idx, np.full(self.batch - real, idx[-1])])
            vols = self.pool[idx]
            tgts = self.labels[idx]
            fnames = [f"v{j}" for j in idx]
            # SyntheticLabeledLoader contract: (vols, targets, fnames);
            # _wrap_loader appends the padded batch count — we pre-truncate
            # instead by yielding only real rows when the batch divides
            yield vols, tgts, fnames[:real]


def make_template_class_pool(n, in_chans, roi, k_classes=K_CLASSES, seed=0,
                             class_seed=0, noise=0.08, warp=0.12,
                             delta_deg=None):
    """ANATOMY-like class corpus: each class owns a spatial TEMPLATE (smooth
    field + a class-specific constellation of ellipsoidal structures);
    instances are smooth random spatial WARPS of the template plus intensity
    jitter and voxel noise. (delta_deg accepted for CLI compatibility,
    unused.)

    Rationale (why gratings failed to separate encoders, measured): smooth
    periodic volumes are decoder-predictable from a handful of visible
    patches — the MAE encoder never needs global inference, so pretraining
    buys the probe nothing. A warped class template is different:
    reconstructing a masked region requires inferring WHICH arrangement the
    visible patches came from and HOW it is deformed — global semantic
    inference, like anatomy. And the per-instance warp is exactly what
    defeats raw-voxel template matching (a linear probe's optimal strategy
    under additive noise), so learned deformation-stable features have an
    edge."""
    from scipy.ndimage import map_coordinates, zoom

    rng = np.random.RandomState(seed)
    ax = np.arange(roi, dtype=np.float32)
    templates = []
    for k in range(k_classes):
        r1 = np.random.RandomState(class_seed + 900 + k)
        coarse = r1.rand(6, 6, 6).astype(np.float32)
        t = zoom(coarse, roi / 6.0, order=1)[:roi, :roi, :roi]
        t = 0.25 + 0.3 * (t - t.min()) / (t.max() - t.min() + 1e-6)
        for _ in range(5):  # class-arranged constellation
            c = r1.uniform(0.2 * roi, 0.8 * roi, size=3)
            rr = r1.uniform(roi / 14, roi / 7, size=3)
            amp = r1.uniform(0.25, 0.45) * r1.choice([-1.0, 1.0])
            d2 = (((ax[:, None, None] - c[0]) / rr[0]) ** 2
                  + ((ax[None, :, None] - c[1]) / rr[1]) ** 2
                  + ((ax[None, None, :] - c[2]) / rr[2]) ** 2)
            t = t + amp * np.exp(-0.5 * d2)
        templates.append(np.clip(t, 0.0, 1.0))

    grid = np.meshgrid(ax, ax, ax, indexing="ij")
    pool = np.empty((n, in_chans, roi, roi, roi), np.float16)
    for i in range(n):
        k = i % k_classes
        # smooth per-instance displacement field, amplitude ~ warp * roi
        disp = [
            zoom((rng.rand(3, 3, 3).astype(np.float32) - 0.5) * 2
                 * warp * roi, roi / 3.0, order=1)[:roi, :roi, :roi]
            for _ in range(3)
        ]
        coords = [np.clip(g + d, 0, roi - 1) for g, d in zip(grid, disp)]
        vol = map_coordinates(templates[k], coords, order=1)
        coarse = rng.rand(4, 4, 4).astype(np.float32) - 0.5
        vol = vol + 0.1 * zoom(coarse, roi / 4.0, order=1)[:roi, :roi, :roi]
        vol = vol + noise * rng.randn(roi, roi, roi).astype(np.float32)
        vol = np.clip(vol, 0.0, 1.0)
        chans = [vol]
        while len(chans) < in_chans:
            c = len(chans)
            chans.append(np.clip(vol * (1.0 + 0.4 * c) - 0.15 * c, 0.0, 1.0))
        pool[i] = np.stack(chans[:in_chans]).astype(np.float16)
    return pool


class DevicePoolLabeledLoader(SyntheticLabeledLoader):
    """SyntheticLabeledLoader with the volume pool DEVICE-resident: batches
    are gathered on device (no per-step H2D) — required for flagship-scale
    probes over a WAN-tunnel-attached chip (an 85 MB 96^3 batch per step
    would measure the tunnel, not the probe)."""

    def __init__(self, pool, labels, batch, steps, seed=0):
        import jax.numpy as jnp

        super().__init__(pool, labels, batch, steps, seed)
        self.n = len(pool)
        self.pool = jnp.asarray(pool, jnp.float16)

    def __iter__(self):
        import jax.numpy as jnp

        rng = np.random.RandomState(self.seed + self.epoch)
        for _ in range(self.steps):
            idx = rng.randint(0, self.n, size=self.batch)
            yield (
                jnp.take(self.pool, jnp.asarray(idx), axis=0),
                self.labels[idx],
                [f"synthetic_{j}" for j in idx],
            )


class DeviceSequentialLabeledLoader(SequentialLabeledLoader):
    """SequentialLabeledLoader over a device-resident pool."""

    def __init__(self, pool, labels, batch):
        import jax.numpy as jnp

        super().__init__(pool, labels, batch)
        self.n = len(pool)
        self.pool = jnp.asarray(pool, jnp.float16)

    def __iter__(self):
        import jax.numpy as jnp

        for s in range(0, self.n, self.batch):
            idx = np.arange(s, min(s + self.batch, self.n))
            real = len(idx)
            if real < self.batch:
                idx = np.concatenate([idx, np.full(self.batch - real, idx[-1])])
            yield (
                jnp.take(self.pool, jnp.asarray(idx), axis=0),
                self.labels[idx],
                [f"v{j}" for j in idx[:real]],
            )


def _cfgs(repo_root: str, scale: str, classifier: str):
    from headct_foundation_tpu.config import default_config

    mae = default_config()
    mae.merge_from_file(os.path.join(repo_root, "configs/mae/mae_HeadCT.yaml"))
    probe = default_config()
    probe.merge_from_file(
        os.path.join(repo_root, "configs/downstream/vit_HeadCT_rsna.yaml")
    )
    if scale == "tiny":
        for cfg in (mae, probe):
            cfg.MODEL.ROI = [32, 32, 32]
            cfg.VIT.INPUT_SIZE = 32
            cfg.VIT.IN_CHANS = 3
            cfg.VIT.HIDDEN_SIZE = 96
            cfg.VIT.MLP_DIM = 192
            cfg.VIT.NUM_LAYERS = 4
            cfg.VIT.NUM_HEADS = 4
            cfg.VIT.PATCH_SIZE = 8
        mae.MAE.INPUT_SIZE = 32
        mae.MAE.PATCH_SIZE = 8
        mae.MAE.IN_CHANS = 3
        mae.MAE.ENCODER_EMBED_DIM = 96
        mae.MAE.ENCODER_MLP_DIM = 192
        mae.MAE.ENCODER_DEPTH = 4
        mae.MAE.ENCODER_NUM_HEADS = 4
        mae.MAE.DECODER_EMBED_DIM = 96
        mae.MAE.DECODER_MLP_DIM = 192
        mae.MAE.DECODER_DEPTH = 2
        mae.MAE.DECODER_NUM_HEADS = 4
    probe.TRAIN.LOCK = True  # frozen encoder: linear/attentive probing
    probe.TRAIN.CLASSIFIER = classifier
    probe.DATA.NUM_CLASSES = 2
    probe.MODEL.PRETRAINED = ""
    return mae, probe


def pretrain_mae(cfg, mesh, rng, pool, epochs, steps, batch, out_dir,
                 device_pool=False):
    """Real MAE engine epoch loop on the unlabeled class corpus; returns the
    saved checkpoint path + per-step losses."""
    from headct_foundation_tpu.engines import mae_engine
    from headct_foundation_tpu.utils.checkpoint import save_checkpoint, wait_for_saves
    from tools.trajectory import DevicePoolLoader

    # the pretrain mains' effective-LR rule (main_pretrain_mae.py)
    cfg = cfg.clone()
    cfg.TRAIN.BASE_LR = cfg.TRAIN.BASE_LR * batch / 256
    cfg.TRAIN.MIN_LR = cfg.TRAIN.BASE_LR * 1e-3
    total = epochs * steps
    state, _, lr_schedule = mae_engine.create_train_state(
        cfg, mesh, rng, total_steps=total,
        num_warmup_steps=int(cfg.TRAIN.PER_WARMUP * total),
    )
    train_step = mae_engine.make_train_step(mesh, augment=True, config=cfg)
    loader_cls = DevicePoolLoader if device_pool else SyntheticLoader
    loader = loader_cls(pool, batch, steps)
    rec = RecordingRun()
    for epoch in range(epochs):
        loader.set_epoch(epoch)
        state, _ = mae_engine.train_one_epoch(
            cfg, state, train_step, loader, mesh, rng, lr_schedule, epoch,
            epochs, wandb_run=rec,
        )
    save_checkpoint(state, epochs - 1, float(rec.losses[-1]), out_dir,
                    "transfer_mae.ckpt")
    wait_for_saves()
    return os.path.join(out_dir, "transfer_mae.ckpt"), rec.losses


def _probe_state(cfg, mesh, rng, total_steps, ckpt_path):
    """Downstream train state; if ckpt_path, warm-start the frozen backbone
    through the mains' content-routed load path."""
    import jax

    from headct_foundation_tpu.engines import downstream_engine
    from headct_foundation_tpu.utils.torch_interop import (
        load_pretrained_into,
        put_like,
    )

    state, _, _ = downstream_engine.create_train_state(
        cfg, mesh, rng, total_steps=total_steps,
        num_warmup_steps=int(cfg.TRAIN.PER_WARMUP * total_steps),
    )
    if ckpt_path:
        merged = load_pretrained_into(
            jax.device_get(state.params["model"]), ckpt_path,
            norm_layer=cfg.VIT.NORM_LAYER,
        )
        new_params = dict(jax.device_get(state.params))
        new_params["model"] = merged
        state = state.replace(params=put_like(state.params, new_params))
    return state


def run_probe(cfg, mesh, rng, ckpt_path, train_pool, train_labels,
              val_pool, val_labels, epochs, steps, batch,
              device_pools=False):
    """Frozen-encoder probe through the REAL downstream engine loops;
    returns per-epoch val mean AUROC + the best."""
    from headct_foundation_tpu.engines import downstream_engine

    total = epochs * steps
    state = _probe_state(cfg, mesh, rng, total, ckpt_path)
    train_step = downstream_engine.make_train_step(cfg, mesh)
    eval_step = downstream_engine.make_eval_step(cfg, mesh)
    if device_pools:
        train_loader = DevicePoolLabeledLoader(train_pool, train_labels,
                                               batch, steps)
        val_loader = DeviceSequentialLabeledLoader(val_pool, val_labels, batch)
    else:
        train_loader = SyntheticLabeledLoader(train_pool, train_labels,
                                              batch, steps)
        val_loader = SequentialLabeledLoader(val_pool, val_labels, batch)

    val_aurocs, train_losses = [], []
    for epoch in range(epochs):
        train_loader.set_epoch(epoch)
        rec = RecordingRun()
        state, _ = downstream_engine.train_one_epoch(
            cfg, state, train_step, train_loader, mesh, rng, epoch, epochs,
            wandb_run=rec,
        )
        train_losses.extend(rec.losses)
        stats = downstream_engine.val_one_epoch(
            cfg, state, eval_step, val_loader, mesh, epoch, epochs
        )
        val_aurocs.append(float(stats["mean_auroc"]))
    return {
        "val_aurocs": val_aurocs,
        "best_val_auroc": float(np.max(val_aurocs)),
        "final_train_loss": float(np.mean(train_losses[-10:])),
    }


def extract_feats(cfg, mesh, rng, ckpt_path, pool, batch,
                  device_pool=None):
    """{'cls': [N, hidden], 'mean': [N, hidden]} from a frozen encoder
    (merged from ckpt_path, or random init when None). 'cls' is the
    notebook contract (reference cell 16: CLS -> LinearClassifier); 'mean'
    pools the patch tokens — the content-bearing features of an MAE
    encoder, whose CLS receives no objective of its own."""
    import jax
    import jax.numpy as jnp

    from headct_foundation_tpu.data.device_preprocess import wire_to_compute
    from headct_foundation_tpu.ops.attention import attention_mesh
    from headct_foundation_tpu.parallel.mesh import batch_sharding, shard_batch

    state = _probe_state(cfg, mesh, rng, 10, ckpt_path)
    n_reg = int(cfg.VIT.NUM_REGISTER_TOKENS)

    def feat_fn(params, vols):
        with attention_mesh(mesh):
            vols = wire_to_compute(vols, cfg, int(cfg.VIT.IN_CHANS),
                                   dtype=jnp.bfloat16)
            tokens, _ = state.model_apply({"params": params["model"]}, vols)
            return (tokens[:, 0, :].astype(jnp.float32),
                    tokens[:, 1 + n_reg:, :].mean(axis=1).astype(jnp.float32))

    feat_fn = jax.jit(feat_fn, in_shardings=(None, batch_sharding(mesh)))
    cls_f, mean_f = [], []
    n = len(pool)
    for s in range(0, n, batch):
        idx = np.arange(s, min(s + batch, n))
        real = len(idx)
        if real < batch:
            idx = np.concatenate([idx, np.full(batch - real, idx[-1])])
        if device_pool is not None:  # one-time H2D, per-batch D2D gather
            vols = jax.device_put(
                jnp.take(device_pool, jnp.asarray(idx), axis=0),
                batch_sharding(mesh),
            )
        else:
            vols, _ = shard_batch(np.asarray(pool[idx]), mesh)
        c, m = jax.device_get(feat_fn(state.params, vols))
        cls_f.append(np.asarray(c)[:real])
        mean_f.append(np.asarray(m)[:real])
    return {"cls": np.concatenate(cls_f, axis=0),
            "mean": np.concatenate(mean_f, axis=0)}


def retrieval_scores(feats, labels):
    from headct_foundation_tpu.eval.retrieval import retrieval_map_per_class

    per_class = retrieval_map_per_class(
        feats, {f"class_{k}": labels == k for k in np.unique(labels)}
    )
    return {"per_class": per_class,
            "mean_map": float(np.mean(list(per_class.values())))}


def save_png(result, path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(13, 3.6), dpi=130)
    ax = axes[0]
    losses = result["pretrain"]["losses"]
    ax.plot(np.arange(1, len(losses) + 1), losses, color="#2563eb", lw=1.2)
    ax.set_xlabel("pretrain step", color="#374151")
    ax.set_ylabel("MAE loss", color="#374151")
    ax.set_title("1. MAE pretrain (unlabeled K-class corpus)", fontsize=10)

    ax = axes[1]
    for key, color in (("pretrained", "#2563eb"), ("random", "#9ca3af")):
        a = result["probe"][key]["val_aurocs"]
        ax.plot(np.arange(1, len(a) + 1), a, color=color, lw=1.8,
                marker="o", ms=3.5, label=f"{key} encoder")
    ax.axhline(0.5, color="#ef4444", lw=0.8, ls="--", label="chance")
    ax.set_ylim(0.35, 1.03)
    ax.set_xlabel("probe epoch", color="#374151")
    ax.set_ylabel("val AUROC", color="#374151")
    ax.set_title("2. Frozen-encoder probe (class 0 vs 1)", fontsize=10)
    ax.legend(fontsize=8, frameon=False)

    ax = axes[2]
    names = ["pretrained", "random"]
    vals = [result["retrieval"][k]["mean_map"] for k in names]
    chance = result["retrieval"]["chance_map"]
    bars = ax.bar(names, vals, color=["#2563eb", "#9ca3af"], width=0.55)
    ax.axhline(chance, color="#ef4444", lw=0.8, ls="--",
               label=f"chance ≈ {chance:.3f}")
    for b, v in zip(bars, vals):
        ax.text(b.get_x() + b.get_width() / 2, v + 0.01, f"{v:.3f}",
                ha="center", fontsize=9)
    ax.set_ylim(0, 1.05)
    ax.set_ylabel(f"retrieval mAP ({K_CLASSES}-class)", color="#374151")
    ax.set_title("3. Same-class retrieval", fontsize=10)
    ax.legend(fontsize=8, frameon=False)

    for ax in axes:
        ax.grid(True, color="#e5e7eb", lw=0.6)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
    fig.suptitle("MAE pretrain → transfer: frozen-probe + retrieval vs "
                 "random-init control", fontsize=11, y=1.02)
    fig.tight_layout()
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", choices=["tiny", "flagship"], default="tiny")
    ap.add_argument("--classifier", choices=["linear", "attentive"],
                    default="linear")
    ap.add_argument("--pretrain-epochs", type=int, default=None)
    ap.add_argument("--pretrain-steps", type=int, default=None,
                    help="steps per pretrain epoch")
    ap.add_argument("--pretrain-batch", type=int, default=None)
    ap.add_argument("--probe-epochs", type=int, default=None)
    ap.add_argument("--probe-steps", type=int, default=None)
    ap.add_argument("--probe-batch", type=int, default=None)
    ap.add_argument("--pool", type=int, default=None,
                    help="pretrain corpus size (distinct volumes)")
    ap.add_argument("--device-pool", action="store_true",
                    help="hold the pretrain pool device-resident (WAN mounts)")
    ap.add_argument("--out-prefix", default=None)
    ap.add_argument("--no-assert", action="store_true")
    ap.add_argument("--margin", type=float, default=0.1,
                    help="required pretrained-minus-random margin (AUROC & mAP)")
    ap.add_argument("--min-auroc", type=float, default=0.7,
                    help="required pretrained-probe best val AUROC")
    ap.add_argument("--reuse-ckpt", default=None,
                    help="skip pretraining and probe from this checkpoint "
                    "(e.g. a prior run's transfer_mae.ckpt)")
    ap.add_argument("--probe-noise", type=float, default=None,
                    help="voxel noise for the probe/retrieval pools only "
                    "(default: --noise). Raising it measures feature "
                    "ROBUSTNESS: the encoder saw --noise during pretraining")
    ap.add_argument("--delta-deg", type=float, default=15.0,
                    help="class orientation separation (degrees, gratings)")
    ap.add_argument("--noise", type=float, default=0.08,
                    help="per-voxel noise sigma")
    ap.add_argument("--probe-train", type=int, default=None,
                    help="probe train set size (few-shot: total, 2 classes)")
    ap.add_argument("--corpus", choices=["templates", "gratings"],
                    default="templates",
                    help="'templates': warped class-template volumes "
                    "(anatomy-like; the shipped protocol); 'gratings': "
                    "fine-orientation gratings (kept as the measured "
                    "negative: decoder-predictable, no encoder gain)")
    ap.add_argument("--warp", type=float, default=0.12,
                    help="instance warp amplitude (fraction of roi; "
                    "templates corpus)")
    args = ap.parse_args()

    tiny = args.scale == "tiny"
    d = {
        # (pre_epochs, pre_steps, pre_batch, pr_epochs, pr_steps, pr_batch, pool)
        "tiny": (4, 40, 16, 6, 25, 16, 128),
        "flagship": (10, 100, 32, 8, 30, 16, 256),
    }[args.scale]
    pre_epochs = args.pretrain_epochs or d[0]
    pre_steps = args.pretrain_steps or d[1]
    pre_batch = args.pretrain_batch or d[2]
    pr_epochs = args.probe_epochs or d[3]
    pr_steps = args.probe_steps or d[4]
    pr_batch = args.probe_batch or d[5]
    pool_n = args.pool or d[6]

    import jax

    from headct_foundation_tpu.parallel.mesh import make_mesh

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mae_cfg, probe_cfg = _cfgs(repo_root, args.scale, args.classifier)
    roi = mae_cfg.MODEL.ROI[0]
    in_chans = mae_cfg.MODEL.IN_CHANS
    mesh = make_mesh(data=len(jax.devices()))
    rng = jax.random.PRNGKey(0)

    t0 = time.time()
    # corpora: same class signatures (class_seed=0), disjoint instance
    # seeds. Few-shot probe train set (reference's get_fewshots protocol):
    # with a large probe train set even random features separate the
    # classes; at few-shot counts feature QUALITY dominates.
    print(f"[transfer] building corpora (roi={roi}, delta={args.delta_deg} deg, "
          f"noise={args.noise})", flush=True)
    import functools

    gen = {"templates": make_template_class_pool,
           "gratings": make_hard_class_pool}[args.corpus]
    mk_kw = {"noise": args.noise, "delta_deg": args.delta_deg}
    if args.corpus == "templates":
        mk_kw["warp"] = args.warp
    mk = functools.partial(gen, **mk_kw)
    mk_probe = functools.partial(
        gen, **{**mk_kw, "noise": (args.probe_noise if args.probe_noise
                                   is not None else args.noise)},
    )
    pre_pool = mk(pool_n, in_chans, roi, k_classes=K_CLASSES, seed=0,
                  class_seed=0)
    n_probe_tr, n_probe_val, n_retr = (32, 64, 96) if tiny else (32, 96, 128)
    n_probe_tr = args.probe_train or n_probe_tr
    probe_tr = mk_probe(n_probe_tr, in_chans, roi, k_classes=2, seed=1,
                        class_seed=0)
    probe_tr_y = (np.arange(n_probe_tr) % 2).astype(np.int32)
    probe_val = mk_probe(n_probe_val, in_chans, roi, k_classes=2, seed=2,
                         class_seed=0)
    probe_val_y = (np.arange(n_probe_val) % 2).astype(np.int32)
    retr_pool = mk_probe(n_retr, in_chans, roi, k_classes=K_CLASSES, seed=3,
                         class_seed=0)
    retr_y = (np.arange(n_retr) % K_CLASSES).astype(np.int32)

    out_dir = args.out_prefix and os.path.dirname(args.out_prefix) or repo_root
    if args.reuse_ckpt:
        ckpt, pre_losses = args.reuse_ckpt, [float("nan")]
        print(f"[transfer] reusing checkpoint {ckpt}", flush=True)
    else:
        print(f"[transfer] pretraining MAE: {pre_epochs}x{pre_steps} steps "
              f"@ batch {pre_batch}", flush=True)
        ckpt, pre_losses = pretrain_mae(
            mae_cfg, mesh, rng, pre_pool, pre_epochs, pre_steps, pre_batch,
            out_dir, device_pool=args.device_pool,
        )
        print(f"[transfer] pretrain loss {pre_losses[0]:.4f} -> "
              f"{np.mean(pre_losses[-10:]):.4f}; ckpt {ckpt}", flush=True)

    retr_dev = None
    if args.device_pool:
        import jax.numpy as jnp

        retr_dev = jnp.asarray(retr_pool, jnp.float16)
    probe, retr = {}, {}
    for key, ck in (("pretrained", ckpt), ("random", None)):
        print(f"[transfer] probing ({key})", flush=True)
        probe[key] = run_probe(
            probe_cfg, mesh, rng, ck, probe_tr, probe_tr_y, probe_val,
            probe_val_y, pr_epochs, pr_steps, pr_batch,
            device_pools=args.device_pool,
        )
        print(f"[transfer]   val AUROCs: "
              f"{[round(a, 3) for a in probe[key]['val_aurocs']]}", flush=True)
        feats = extract_feats(probe_cfg, mesh, rng, ck, retr_pool, pr_batch,
                              device_pool=retr_dev)
        retr[key] = {
            kind: retrieval_scores(feats[kind], retr_y) for kind in feats
        }
        retr[key]["mean_map"] = retr[key]["mean"]["mean_map"]
        print(f"[transfer]   retrieval mAP mean-token "
              f"{retr[key]['mean']['mean_map']:.4f} / cls "
              f"{retr[key]['cls']['mean_map']:.4f}", flush=True)
    # chance mAP for same-class retrieval with K balanced classes ~= the
    # positive prevalence among candidates
    retr["chance_map"] = float((n_retr / K_CLASSES - 1) / (n_retr - 1))

    result = {
        "scale": args.scale,
        "classifier": probe_cfg.TRAIN.CLASSIFIER,
        "k_classes": K_CLASSES,
        "pretrain": {
            "epochs": pre_epochs, "steps_per_epoch": pre_steps,
            "batch": pre_batch, "pool": pool_n,
            "start_loss": float(pre_losses[0]),
            "final_loss": float(np.mean(pre_losses[-10:])),
            "losses": [round(l, 5) for l in pre_losses],
        },
        "probe": probe,
        "probe_noise": (args.probe_noise if args.probe_noise is not None
                        else args.noise),
        "probe_train_shots": n_probe_tr,
        "retrieval": retr,
        "auroc_margin": round(
            probe["pretrained"]["best_val_auroc"]
            - probe["random"]["best_val_auroc"], 4,
        ),
        "map_margin": round(
            retr["pretrained"]["mean_map"] - retr["random"]["mean_map"], 4
        ),
        "wall_s": round(time.time() - t0, 1),
        "backend": jax.default_backend(),
    }
    prefix = args.out_prefix or os.path.join(repo_root, "transfer_mae")
    tmp = prefix + ".json.tmp"
    with open(tmp, "w") as f:
        json.dump(result, f, indent=1)
    os.replace(tmp, prefix + ".json")
    save_png(result, prefix + ".png")
    slim = {k: v for k, v in result.items() if k != "pretrain"}
    slim["pretrain_final_loss"] = result["pretrain"]["final_loss"]
    print(json.dumps(slim))

    if not args.no_assert:
        assert result["auroc_margin"] > args.margin, (
            f"probe margin {result['auroc_margin']} <= {args.margin}: "
            f"pretrained {probe['pretrained']['best_val_auroc']:.3f} vs "
            f"random {probe['random']['best_val_auroc']:.3f}"
        )
        assert result["map_margin"] > args.margin, (
            f"retrieval margin {result['map_margin']} <= {args.margin}: "
            f"pretrained {retr['pretrained']['mean_map']:.3f} vs "
            f"random {retr['random']['mean_map']:.3f}"
        )
        assert probe["pretrained"]["best_val_auroc"] > args.min_auroc, (
            probe["pretrained"], args.min_auroc)
        print("transfer assertions PASSED: pretraining produces useful "
              "representations")


if __name__ == "__main__":
    try:
        from headct_foundation_tpu.parallel.mesh import respect_jax_platforms_env

        respect_jax_platforms_env()
    except Exception:
        pass
    main()
