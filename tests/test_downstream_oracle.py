"""Trajectory-level numeric parity: our DOWNSTREAM training LOOP vs a torch
twin.

Completes the dynamic-correctness trilogy (MAE: tests/test_parity_oracle.py,
DINO: tests/test_trajectory_oracle.py): a torch model (OracleViT + a torch
LinearClassifier twin of reference src/models/classifier.py:7-33) is
initialized from OUR parameters and trained for dozens of optimizer steps by
a loop replicating the reference's exact downstream semantics — dual AdamW
optimizers with classifier LR = 100 x backbone LR (reference:
main_downstream.py:199-210), per-iteration LambdaLR schedules with
min_lr_classifier = min_lr x 100, GLOBAL-norm gradient clipping per group
(reference: engine_downstream.py:107-111 — unlike pretrain's per-param
clip), train-mode BatchNorm through the classifier, CE loss, frozen sincos
position embeddings — on the SAME augmented batches our jitted step consumes
(vit_augment replicated from the step's RNG derivation).

Per-step train losses must track each other, and the post-training EVAL loss
(running-average BN statistics) must also match — which pins the torch
running-var semantics (unbiased/Bessel-corrected update) of
``models.layers.TorchBatchNorm`` inside a real training loop.

Also covers TRAIN.LOCK (frozen backbone: reference main_downstream.py:165-166
drops the backbone optimizer entirely; ours routes those leaves to
set_to_zero and stop_gradient's the features).
"""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from torch import nn

from headct_foundation_tpu.config import default_config
from headct_foundation_tpu.data.augment import vit_augment
from headct_foundation_tpu.engines import downstream_engine
from headct_foundation_tpu.parallel.mesh import make_mesh
from headct_foundation_tpu.utils.torch_interop import tree_to_torch

_HERE = os.path.dirname(os.path.abspath(__file__))


def _load(name, fname):
    spec = importlib.util.spec_from_file_location(name, os.path.join(_HERE, fname))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TorchLinearClassifier(nn.Module):
    """Twin of reference src/models/classifier.py:7-33."""

    def __init__(self, dim, num_classes):
        super().__init__()
        self.bn = nn.BatchNorm1d(dim, affine=False, eps=1e-6)
        self.linear = nn.Linear(dim, num_classes)

    def forward(self, x):
        return self.linear(self.bn(x))


def _run_twin(lock: bool, monkeypatch, steps: int = 40, batch_size: int = 8):
    monkeypatch.setenv("HEADCT_EXACT_GELU", "1")
    tti = _load("tti_ds_oracle", "test_torch_interop.py")

    LR = 1e-3
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
    cfg.VIT.NUM_REGISTER_TOKENS = 0  # the torch oracle has no registers
    cfg.VIT.USE_BIAS = True
    cfg.VIT.POS_EMBED = "sincos"  # frozen on both sides
    cfg.DATA.NUM_CLASSES = 2
    cfg.TRAIN.CLASSIFIER = "linear"
    cfg.TRAIN.LOCK = lock
    cfg.TRAIN.LORA = False
    cfg.TRAIN.GRAD_CLIP = 1.0
    cfg.TRAIN.BASE_LR = LR
    cfg.TRAIN.MIN_LR = LR * 1e-3

    mesh = make_mesh(data=1, devices=jax.devices()[:1])
    rng = jax.random.PRNGKey(3)
    warmup = steps // 10
    state, _, (lr_model, lr_clf) = downstream_engine.create_train_state(
        cfg, mesh, rng, total_steps=steps, num_warmup_steps=warmup,
        dtype=jnp.float32,
    )
    step_fn = downstream_engine.make_train_step(
        cfg, mesh, compute_dtype=jnp.float32
    )
    eval_fn = downstream_engine.make_eval_step(
        cfg, mesh, compute_dtype=jnp.float32
    )

    # ---- torch twin initialized from OUR parameters ----
    vit = tti.OracleViT(in_chans=1, img=24, patch=12, dim=48, mlp=96,
                        layers=2, heads=4)
    sd = tree_to_torch(jax.device_get(state.params["model"]))
    vit.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )
    clf = TorchLinearClassifier(48, 2)
    csd = tree_to_torch(jax.device_get(state.params["classifier"]))
    missing, unexpected = clf.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in csd.items()},
        strict=False,  # BN buffers keep their fresh (0 mean / 1 var) init
    )
    assert not unexpected, unexpected
    assert all("bn." in k for k in missing), missing
    # frozen sincos position embeddings (reference: requires_grad=False via
    # sincos buffers; ours: optimizer label 'freeze')
    vit.patch_embedding.position_embeddings.requires_grad_(False)
    if lock:
        for p in vit.parameters():
            p.requires_grad_(False)

    opt_model = None
    if not lock:
        opt_model = torch.optim.AdamW(
            [p for p in vit.parameters() if p.requires_grad],
            lr=LR, weight_decay=cfg.TRAIN.WEIGHT_DECAY,
            betas=(cfg.TRAIN.BETA1, cfg.TRAIN.BETA2), eps=1e-8,
        )
    opt_clf = torch.optim.AdamW(
        clf.parameters(), lr=LR * 1e2, weight_decay=cfg.TRAIN.WEIGHT_DECAY,
        betas=(cfg.TRAIN.BETA1, cfg.TRAIN.BETA2), eps=1e-8,
    )
    criterion = nn.CrossEntropyLoss()

    rs = np.random.RandomState(0)
    vols = rs.rand(steps, batch_size, 1, 24, 24, 24).astype(np.float32)
    labels = rs.randint(0, 2, size=(steps, batch_size)).astype(np.int32)

    ours, theirs = [], []
    for it in range(steps):
        batch = downstream_engine._to_device(vols[it], mesh, np.float32)
        tgt = downstream_engine._to_device(labels[it], mesh, np.int32)

        # replicate the jitted step's augmentation for the torch side
        # (downstream_engine.make_train_step: fold_in(rng, state.step))
        step_rng = jax.random.fold_in(rng, it)
        aug_np = np.asarray(
            jax.device_get(vit_augment(step_rng, jnp.asarray(vols[it])))
        )

        state, metrics = step_fn(state, batch, tgt, rng)
        ours.append(float(jax.device_get(metrics["loss"])))

        # per-iteration schedules (reference: engine_downstream.py:119-121
        # steps both schedulers every iteration)
        if opt_model is not None:
            for g in opt_model.param_groups:
                g["lr"] = float(lr_model(it))
        for g in opt_clf.param_groups:
            g["lr"] = float(lr_clf(it))
        feats = vit(torch.from_numpy(aug_np))[:, 0, :]
        if lock:
            feats = feats.detach()
        logits = clf(feats)
        loss = criterion(logits, torch.from_numpy(labels[it]).long())
        if opt_model is not None:
            opt_model.zero_grad()
        opt_clf.zero_grad()
        loss.backward()
        # reference clips classifier then (unless LOCK) model, by GLOBAL norm
        torch.nn.utils.clip_grad_norm_(clf.parameters(), cfg.TRAIN.GRAD_CLIP)
        if not lock:
            torch.nn.utils.clip_grad_norm_(vit.parameters(), cfg.TRAIN.GRAD_CLIP)
            opt_model.step()
        opt_clf.step()
        theirs.append(float(loss.detach()))

    # ---- eval parity: running-average BN statistics (unbiased running var,
    # torch semantics — models.layers.TorchBatchNorm) ----
    ev = eval_fn(
        state,
        downstream_engine._to_device(vols[0], mesh, np.float32),
        downstream_engine._to_device(labels[0], mesh, np.int32),
    )
    our_eval = float(jax.device_get(ev["loss"]))
    vit.eval()
    clf.eval()
    with torch.no_grad():
        logits = clf(vit(torch.from_numpy(vols[0]))[:, 0, :])
        their_eval = float(criterion(logits, torch.from_numpy(labels[0]).long()))
    return np.asarray(ours), np.asarray(theirs), our_eval, their_eval


@pytest.mark.slow
def test_downstream_training_loop_matches_torch_twin(monkeypatch):
    ours, theirs, our_eval, their_eval = _run_twin(lock=False, monkeypatch=monkeypatch)
    np.testing.assert_allclose(ours, theirs, atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(our_eval, their_eval, atol=5e-3, rtol=1e-3)


@pytest.mark.slow
def test_downstream_locked_loop_matches_torch_twin(monkeypatch):
    ours, theirs, our_eval, their_eval = _run_twin(lock=True, monkeypatch=monkeypatch)
    np.testing.assert_allclose(ours, theirs, atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(our_eval, their_eval, atol=5e-3, rtol=1e-3)
