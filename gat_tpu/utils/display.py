"""Waveform / spectrogram / series plotting helpers.

The archive carried a display_utils module (waveform, spectrogram, and
series plots — archive/source prototyping v0/display_utils.py, SURVEY
§2.2); this is its equivalent over the framework's own DSP, headless-safe
(PNG out, no interactive backend required).
"""
from __future__ import annotations

import numpy as np

__all__ = ["plot_waveform", "plot_spectrogram", "plot_series"]


def _get_plt():
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        return plt
    except Exception:
        return None


def plot_waveform(y, sr: int, title: str = "Waveform", out_path=None):
    plt = _get_plt()
    if plt is None:
        return None
    y = np.asarray(y)
    fig, ax = plt.subplots(figsize=(10, 3))
    ax.plot(np.arange(len(y)) / sr, y, linewidth=0.5)
    ax.set_xlabel("time (s)")
    ax.set_ylabel("amplitude")
    ax.set_title(title)
    if out_path is not None:
        fig.savefig(out_path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return fig


def plot_spectrogram(y, sr: int, n_fft: int = 2048, hop_length: int = 256,
                     title: str = "Mel spectrogram", out_path=None):
    """Log-mel spectrogram image via the framework's own front-end."""
    plt = _get_plt()
    if plt is None:
        return None
    import jax.numpy as jnp
    from ..ops.spectral import melspectrogram_torchaudio
    S = np.asarray(melspectrogram_torchaudio(
        jnp.asarray(y, jnp.float32), sr, n_fft=n_fft,
        hop_length=hop_length))  # (T, M)
    fig, ax = plt.subplots(figsize=(10, 4))
    im = ax.imshow(S.T, origin="lower", aspect="auto", cmap="magma",
                   extent=[0, len(y) / sr, 0, S.shape[1]])
    fig.colorbar(im, label="dB")
    ax.set_xlabel("time (s)")
    ax.set_ylabel("mel bin")
    ax.set_title(title)
    if out_path is not None:
        fig.savefig(out_path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return fig


def plot_series(series, labels=None, title: str = "Series", out_path=None):
    """One or more 1-D series on shared axes (loss curves, envelopes…)."""
    plt = _get_plt()
    if plt is None:
        return None
    if not isinstance(series, (list, tuple)):
        series = [series]
    labels = labels or [f"series_{i}" for i in range(len(series))]
    fig, ax = plt.subplots(figsize=(8, 4))
    for s, lab in zip(series, labels):
        ax.plot(np.asarray(s), label=lab)
    ax.legend()
    ax.grid(alpha=0.3)
    ax.set_title(title)
    if out_path is not None:
        fig.savefig(out_path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return fig
