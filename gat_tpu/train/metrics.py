"""Training metrics and observability helpers.

Same metric definitions as the reference (SURVEY §5.5): weighted epoch
loss/accuracy, confusion matrix (optionally normalized/plotted),
classification report, ASCII gradient-norm health bars, and training-curve
plots (matplotlib is optional — everything degrades to text)."""
from __future__ import annotations

import math

import numpy as np

__all__ = ["confusion_matrix", "classification_report", "grad_norm_bar",
           "grad_norm_label", "plot_curves"]


def confusion_matrix(y_true, y_pred, num_classes: int | None = None,
                     normalize: bool = False, plot: bool = False,
                     classes=None, out_path=None) -> np.ndarray:
    """Row-normalizable confusion matrix, optionally rendered as a
    heatmap with per-cell annotations (ref mlp_trainer.py:225-264)."""
    y_true = np.asarray(y_true, int).ravel()
    y_pred = np.asarray(y_pred, int).ravel()
    n = num_classes or int(max(y_true.max(), y_pred.max())) + 1
    cm = np.zeros((n, n), dtype=np.int64)
    np.add.at(cm, (y_true, y_pred), 1)
    if normalize:
        with np.errstate(all="ignore"):
            cm = cm.astype(float) / cm.sum(axis=1, keepdims=True)
            cm = np.nan_to_num(cm)
    if plot:
        _plot_confusion(cm, classes, normalize, out_path)
    return cm


def _get_plt():
    """Headless matplotlib, or None when unavailable — shared by every
    plotting entry point in this module."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        return plt
    except Exception:
        return None


def _plot_confusion(cm, classes, normalize, out_path):
    plt = _get_plt()
    if plt is None:
        return
    fig, ax = plt.subplots(figsize=(8, 6))
    im = ax.imshow(cm, cmap="Blues")
    fig.colorbar(im)
    if classes is not None:
        ax.set_xticks(range(len(classes)), classes, rotation=45)
        ax.set_yticks(range(len(classes)), classes)
    ax.set_xlabel("Predicted")
    ax.set_ylabel("True")
    ax.set_title("Confusion Matrix")
    if cm.shape[0] <= 20:  # annotate only when readable
        thresh = cm.max() / 2
        for i in range(cm.shape[0]):
            for j in range(cm.shape[1]):
                val = f"{cm[i, j]:.2f}" if normalize else str(int(cm[i, j]))
                ax.text(j, i, val, ha="center", va="center",
                        color="white" if cm[i, j] > thresh else "black")
    fig.tight_layout()
    if out_path is not None:
        fig.savefig(out_path, dpi=100)
    plt.close(fig)


def classification_report(y_true, y_pred, target_names=None,
                          digits: int = 4) -> str:
    """Per-class precision/recall/F1 summary (sklearn-backed, as the
    reference uses it; ref mlp_trainer.py:266-270)."""
    import sklearn.metrics as skm
    present = sorted(set(np.asarray(y_true, int).ravel())
                     | set(np.asarray(y_pred, int).ravel()))
    # empty/short target_names (Trainer defaults to [] with no
    # reverse_map) fall back to index labels instead of IndexError
    usable = (target_names and present
              and max(present) < len(target_names))
    names = [target_names[i] for i in present] if usable else None
    return skm.classification_report(y_true, y_pred, labels=present,
                                     target_names=names, digits=digits,
                                     zero_division=0)


def grad_norm_label(norm: float) -> str:
    """Qualitative gradient-norm gauge (ref mlp_trainer.py:272-278)."""
    if norm > 20:
        return "██████  exploding"
    if norm > 1:
        return "▅▅▅▅▁  high"
    if norm > 0.1:
        return "▃▃▂▁▁  healthy"
    if norm > 0.001:
        return "▁▁▁▁▁  low"
    return ".....  vanishing"


def grad_norm_bar(norm: float) -> str:
    """Log-scaled 0-5 bar (ref mlp_trainer.py:280-284)."""
    level = int(min(5, max(0, math.log10(norm + 1e-6) + 3)))
    return "█" * level + " " * (5 - level)


def plot_curves(histories: dict[str, list[float]], title: str = "Curves",
                out_path=None, show: bool = False):
    """Training/validation curve plot (ref mlp_trainer.py:198-223).
    Writes to out_path when given; returns the figure or None if
    matplotlib is unavailable."""
    plt = _get_plt()
    if plt is None:
        return None
    fig, ax = plt.subplots(figsize=(8, 4))
    for label, ys in histories.items():
        ax.plot(np.arange(len(ys)), ys, label=label)
    ax.set_title(title)
    ax.legend()
    ax.grid(alpha=0.3)
    if out_path is not None:
        fig.savefig(out_path, dpi=100, bbox_inches="tight")
    if show:
        plt.show()
    plt.close(fig)
    return fig
