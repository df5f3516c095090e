"""Evaluation plots written by the downstream tester.

Output contract (kept so downstream consumers of the reference's artifacts
find the same files with the same content): one PNG named
``roc_pr_curve_plot_<percent>.png`` holding an ROC panel and a
precision-recall panel, and one ``regression_plot_<percent>.png`` scatter
with the identity line (reference surface: src/utils/misc.py:487-540 writes
these from the tester). Everything else — curve computation, styling,
figure layout — is this framework's own.
"""

from __future__ import annotations

import os

import numpy as np


def _new_axes(n_panels: int, width_per_panel: float = 6.0):
    """Agg-backed figure with ``n_panels`` square side-by-side axes."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(
        1, n_panels, figsize=(width_per_panel * n_panels, width_per_panel)
    )
    return fig, np.atleast_1d(axes)


def _save(fig, out_dir: str, name: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, name)
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    import matplotlib.pyplot as plt

    plt.close(fig)
    return path


def plot_pr_curve(targets, preds, out_dir: str = "plots", percent: str = "None") -> str:
    """Binary-classification ROC + precision-recall panels; returns the path."""
    from sklearn.metrics import (
        auc,
        average_precision_score,
        precision_recall_curve,
        roc_curve,
    )

    targets = np.asarray(targets).ravel()
    preds = np.asarray(preds).ravel()
    fig, (ax_roc, ax_pr) = _new_axes(2)

    fpr, tpr, _ = roc_curve(targets, preds)
    ax_roc.plot(fpr, tpr, color="tab:blue", lw=2,
                label=f"AUROC = {auc(fpr, tpr):.4f}")
    ax_roc.plot([0, 1], [0, 1], color="gray", ls=":", lw=1, label="chance")
    ax_roc.set(xlabel="false positive rate", ylabel="true positive rate",
               title="ROC", xlim=(0, 1), ylim=(0, 1.02))
    ax_roc.legend(loc="lower right", frameon=False)

    precision, recall, _ = precision_recall_curve(targets, preds)
    ap = average_precision_score(targets, preds)
    prevalence = float(targets.mean()) if targets.size else 0.0
    ax_pr.step(recall, precision, color="tab:orange", lw=2, where="post",
               label=f"AP = {ap:.4f}")
    ax_pr.axhline(prevalence, color="gray", ls=":", lw=1, label="prevalence")
    ax_pr.set(xlabel="recall", ylabel="precision", title="precision-recall",
              xlim=(0, 1), ylim=(0, 1.02))
    ax_pr.legend(loc="best", frameon=False)

    return _save(fig, out_dir, f"roc_pr_curve_plot_{percent}.png")


def plot_regression(x, y, title: str, out_dir: str = "plots", percent: str = "None") -> str:
    """Prediction-vs-target scatter with the identity line; returns the path."""
    x = np.asarray(x, dtype=np.float64).ravel()
    y = np.asarray(y, dtype=np.float64).ravel()
    fig, (ax,) = _new_axes(1, width_per_panel=7.0)

    ax.scatter(x, y, s=18, alpha=0.7, color="tab:blue", label="samples")
    lo = float(min(x.min(), y.min())) if x.size else 0.0
    hi = float(max(x.max(), y.max())) if x.size else 1.0
    ax.plot([lo, hi], [lo, hi], color="gray", ls="--", lw=1, label="y = x")
    if x.size > 1 and np.std(x) > 0 and np.std(y) > 0:
        r = float(np.corrcoef(x, y)[0, 1])
        ax.set_title(f"{title}  (r = {r:.3f})")
    else:
        ax.set_title(title)
    ax.set(xlabel="target", ylabel="prediction", xlim=(lo, hi), ylim=(lo, hi))
    ax.set_aspect("equal", adjustable="box")
    ax.legend(loc="upper left", frameon=False)

    return _save(fig, out_dir, f"regression_plot_{percent}.png")
