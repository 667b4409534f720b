"""Mel scales and triangular filterbanks — both conventions used upstream.

The reference's two front-ends use *different* mel conventions (SURVEY §7):

  * MFCC path: librosa.feature.mfcc → librosa.filters.mel with the Slaney
    scale and 'slaney' area normalization (ref features.py:187-193).
  * CNN path: torchaudio.transforms.MelSpectrogram → HTK scale, no
    normalization, and frequencies spanned with `linspace(0, sr // 2, n_freqs)`
    (integer-divided Nyquist) (ref features.py:296-302).

Filterbanks are built host-side in float64 (they are trace-time constants)
and handed to XLA as matmul weights — on TPU the mel projection is an MXU
GEMM fused with the surrounding ops.
"""
from __future__ import annotations

import functools

import numpy as np

__all__ = [
    "hz_to_mel", "mel_to_hz", "mel_frequencies",
    "mel_filterbank_librosa", "mel_filterbank_torchaudio",
]


def hz_to_mel(f, htk: bool = False):
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # Slaney: linear below 1 kHz, log above
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = f >= min_log_hz
    mels = np.where(log_region,
                    min_log_mel + np.log(np.maximum(f, 1e-30) / min_log_hz) / logstep,
                    mels)
    return mels


def mel_to_hz(m, htk: bool = False):
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = m >= min_log_mel
    freqs = np.where(log_region,
                     min_log_hz * np.exp(logstep * (m - min_log_mel)),
                     freqs)
    return freqs


def mel_frequencies(n_mels: int, fmin: float, fmax: float, htk: bool = False):
    mels = np.linspace(hz_to_mel(fmin, htk), hz_to_mel(fmax, htk), n_mels)
    return mel_to_hz(mels, htk)


def _triangles(fft_freqs: np.ndarray, band_freqs: np.ndarray) -> np.ndarray:
    """Triangular weights (n_mels, n_freqs) from band edge frequencies
    (n_mels + 2,). Shared by both conventions."""
    fdiff = np.diff(band_freqs)
    ramps = band_freqs[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    return np.maximum(0.0, np.minimum(lower, upper))


@functools.lru_cache(maxsize=32)
def mel_filterbank_librosa(sr: int, n_fft: int, n_mels: int = 128,
                           fmin: float = 0.0, fmax: float | None = None,
                           htk: bool = False, norm: str | None = "slaney"
                           ) -> np.ndarray:
    """librosa.filters.mel semantics: Slaney scale + Slaney area norm by
    default. Returns (n_mels, 1 + n_fft // 2) float32."""
    if fmax is None:
        fmax = sr / 2.0
    fft_freqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    band = mel_frequencies(n_mels + 2, fmin, fmax, htk)
    weights = _triangles(fft_freqs, band)
    if norm == "slaney":
        enorm = 2.0 / (band[2:n_mels + 2] - band[:n_mels])
        weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=32)
def mel_filterbank_torchaudio(sr: int, n_fft: int, n_mels: int = 128,
                              fmin: float = 0.0, fmax: float | None = None
                              ) -> np.ndarray:
    """torchaudio.functional.melscale_fbanks defaults as used by
    transforms.MelSpectrogram (mel_scale='htk', norm=None): note the
    integer-divided Nyquist (`sr // 2`) for both the frequency grid and the
    default fmax. Returns (n_mels, 1 + n_fft // 2) float32."""
    if fmax is None:
        fmax = float(sr // 2)
    fft_freqs = np.linspace(0.0, float(sr // 2), 1 + n_fft // 2)
    band = mel_frequencies(n_mels + 2, fmin, fmax, htk=True)
    weights = _triangles(fft_freqs, band)
    return weights.astype(np.float32)
