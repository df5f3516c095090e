"""ROC/PR and regression plots (reference: src/utils/misc.py:487-540)."""

from __future__ import annotations

import os

import numpy as np


def plot_pr_curve(targets, preds, out_dir: str = "plots", percent: str = "None") -> str:
    """ROC + precision-recall side-by-side PNG; returns the file path."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.metrics import (
        auc,
        average_precision_score,
        precision_recall_curve,
        roc_curve,
    )

    os.makedirs(out_dir, exist_ok=True)
    plt.figure(figsize=(14, 7))
    plt.subplot(1, 2, 1)
    fpr, tpr, _ = roc_curve(targets, preds)
    roc_auc = auc(fpr, tpr)
    plt.plot(fpr, tpr, label=f"ROC curve (area = {roc_auc:.4f})")
    plt.plot([0, 1], [0, 1], "k--")
    plt.xlabel("False Positive Rate")
    plt.ylabel("True Positive Rate")
    plt.title("Receiver Operating Characteristic (ROC) Curves")
    plt.legend(loc="lower right")

    plt.subplot(1, 2, 2)
    precision, recall, _ = precision_recall_curve(targets, preds)
    ap = average_precision_score(targets, preds)
    plt.plot(recall, precision, label=f"AP={ap:.4f}")
    plt.xlabel("Recall")
    plt.ylabel("Precision")
    plt.title("Precision-Recall Curves")
    plt.legend(loc="upper right")

    path = os.path.join(out_dir, f"roc_pr_curve_plot_{percent}.png")
    plt.savefig(path, dpi=300)
    plt.close()
    return path


def plot_regression(x, y, title: str, out_dir: str = "plots", percent: str = "None") -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    plt.figure(figsize=(20, 15))
    plt.scatter(x, y, label="data points", marker="o")
    lo, hi = float(np.min(x)), float(np.max(x))
    plt.plot([lo, hi], [lo, hi], "k--", label="y=x")
    plt.xlim(lo, hi)
    plt.ylim(lo, hi)
    plt.title(f"Plot of {title}")
    plt.xlabel("Target")
    plt.ylabel("Prediction")
    plt.legend()
    path = os.path.join(out_dir, f"regression_plot_{percent}.png")
    plt.savefig(path, dpi=300)
    plt.close()
    return path
