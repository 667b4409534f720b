"""Batched YIN fundamental-frequency estimation.

Re-implements librosa.yin's algorithm (de Cheveigné & Kawahara 2002) as a
fully batched, jit-compiled XLA graph (ref consumer:
version_1/source/dsp/yin.py:49-54; the reference calls librosa.yin per clip
in a Python loop — here a whole clip batch runs as one device program):

  1. frame (center, constant pad) → (..., n_frames, frame_length)
  2. difference function via FFT autocorrelation + cumulative energies,
     d(τ) = Σ_{i=1..W} (x[i] − x[i+τ])²
  3. cumulative-mean-normalized difference (CMND)
  4. parabolic interpolation of trough positions
  5. first trough below `trough_threshold`, else the global minimum

All frames across all clips are processed simultaneously — the FFTs and
reductions batch over (clips × frames) and map cleanly to TPU.
"""
from __future__ import annotations

import functools
import math

import numpy as _np
import jax
import jax.numpy as jnp

from .spectral import (TINY32 as _TINY32, frame, _pad_center,
                       _rdft_np, stft_backend, block_coeffs,
                       combine_blocks)

__all__ = ["yin", "yin_pitch", "estimate_note"]



def _irdft_lags_np(n_fft: int, lag_start: int, n_lags: int):
    """Restricted inverse real-DFT: matrices (1+n_fft//2, n_lags) such that
    Re @ IC - Im @ IS == irfft(X)[lag_start : lag_start + n_lags]."""
    f = _np.arange(1 + n_fft // 2)[:, None]
    n = (lag_start + _np.arange(n_lags))[None, :]
    w = _np.full((1 + n_fft // 2, 1), 2.0)
    w[0, 0] = 1.0
    w[-1, 0] = 1.0
    ang = 2.0 * _np.pi * f * n / n_fft
    ic = (w * _np.cos(ang) / n_fft).astype(_np.float32)
    isin = (w * _np.sin(ang) / n_fft).astype(_np.float32)
    return ic, isin


def _autocorr_lags(frames: jax.Array, frame_length: int, win_length: int,
                   n_lags: int) -> jax.Array:
    """acf(τ) = Σ_{i=1..W} x[i] x[i+τ] for τ ∈ [0, n_lags), i.e.
    irfft(rfft(x)·rfft(x[W:0:-1]))[W : W+n_lags] — computed either with
    FFTs (CPU) or as real-DFT GEMMs on the MXU (TPU has no FFT unit)."""
    rev = frames[..., win_length:0:-1]  # x[W], x[W-1], ..., x[1]
    if stft_backend() == "matmul":
        c_m, s_m = _rdft_np(frame_length)
        cj, sj = jnp.asarray(c_m), jnp.asarray(s_m)
        ra = jnp.einsum("...n,nf->...f", frames, cj,
                        preferred_element_type=jnp.float32)
        ia = jnp.einsum("...n,nf->...f", frames, sj,
                        preferred_element_type=jnp.float32)
        rb = jnp.einsum("...w,wf->...f", rev, cj[:win_length],
                        preferred_element_type=jnp.float32)
        ib = jnp.einsum("...w,wf->...f", rev, sj[:win_length],
                        preferred_element_type=jnp.float32)
        re = ra * rb - ia * ib
        im = ra * ib + ia * rb
        ic, isin = _irdft_lags_np(frame_length, win_length, n_lags)
        return (jnp.einsum("...f,fl->...l", re, jnp.asarray(ic),
                           preferred_element_type=jnp.float32)
                - jnp.einsum("...f,fl->...l", im, jnp.asarray(isin),
                             preferred_element_type=jnp.float32))
    a = jnp.fft.rfft(frames, frame_length, axis=-1)
    b = jnp.fft.rfft(rev, frame_length, axis=-1)
    full = jnp.fft.irfft(a * b, frame_length, axis=-1)
    return full[..., win_length:win_length + n_lags]


def _cmnd(frames: jax.Array, frame_length: int, win_length: int,
          min_period: int, max_period: int) -> jax.Array:
    """Cumulative-mean-normalized difference over τ ∈ [min_p, max_p]."""
    acf = _autocorr_lags(frames, frame_length, win_length, max_period + 1)
    acf = jnp.where(jnp.abs(acf) < 1e-6, 0.0, acf)

    # Sliding energies e(τ) = Σ_{i=τ+1..τ+W} x[i]², τ ≤ max_period only
    csum = jnp.cumsum(frames ** 2, axis=-1)
    energy = (csum[..., win_length:win_length + max_period + 1]
              - csum[..., :max_period + 1])
    energy = jnp.where(jnp.abs(energy) < 1e-6, 0.0, energy)

    diff = energy[..., :1] + energy - 2.0 * acf  # d(τ), τ = 0..max_p

    numerator = diff[..., min_period:max_period + 1]
    tau = jnp.arange(1, max_period + 1, dtype=diff.dtype)
    cum_mean = jnp.cumsum(diff[..., 1:max_period + 1], axis=-1) / tau
    denominator = cum_mean[..., min_period - 1:max_period]
    return numerator / (denominator + _TINY32)


def _cmnd_block(y_padded: jax.Array, frame_length: int, hop_length: int,
                n_frames: int, win_length: int, min_period: int,
                max_period: int, coeffs=None) -> jax.Array:
    """CMND via the shared block DFT — no frames are ever materialized.

    The autocorrelation needs two spectra per frame x (length N):
    A = rfft(x) and B = rfft of the reversed window x[W..1]. Both come
    from the SAME hop-block DFT coefficients: A is the full K-block
    twiddle combine; B follows from conjugation —

      B[k] = e^(-2πiWk/N) · conj(G[k]),
      G[k] = Σ_{m=1..W} x[m] e^(-2πimk/N)
           = (first W/hop blocks combined) - x[0] + x[W]·e^(-2πiWk/N),

    and with W = N/2 the phase e^(-2πiWk/N) is just (-1)^k. The sliding
    energies come from a cumulative sum over the padded signal (no frame
    copies there either). Requires hop | W and W == N/2 — the only
    configuration this framework uses (librosa yin defaults).

    `coeffs` lets a caller that already paid for the block DFT (the fused
    MFCC+pitch front-end) pass it in; y_padded and coeffs must then be
    consistently scaled."""
    if coeffs is not None:
        cre, cim = coeffs
    else:
        cre, cim = block_coeffs(y_padded, frame_length, hop_length,
                                n_frames)
    are, aim = combine_blocks(cre, cim, frame_length, hop_length, n_frames)
    kb = win_length // hop_length
    hre, him = combine_blocks(cre, cim, frame_length, hop_length, n_frames,
                              n_blocks=kb)

    last = (n_frames - 1) * hop_length
    x0 = y_padded[..., 0:last + 1:hop_length]
    xw = y_padded[..., win_length:win_length + last + 1:hop_length]
    sign = jnp.asarray(_np.where(_np.arange(1 + frame_length // 2) % 2 == 0,
                                 1.0, -1.0), jnp.float32)
    gre = hre - x0[..., None] + xw[..., None] * sign
    gim = him
    bre = sign * gre
    bim = -sign * gim

    re = are * bre - aim * bim
    im = are * bim + aim * bre
    ic, isin = _irdft_lags_np(frame_length, win_length, max_period + 1)
    acf = (jnp.einsum("...f,fl->...l", re, jnp.asarray(ic),
                      preferred_element_type=jnp.float32)
           - jnp.einsum("...f,fl->...l", im, jnp.asarray(isin),
                        preferred_element_type=jnp.float32))
    acf = jnp.where(jnp.abs(acf) < 1e-6, 0.0, acf)

    # sliding energies e_t(τ) = Σ_{i=τ+1..τ+W} x_t[i]², τ = 0..max_p,
    # WITHOUT a full-signal cumulative sum (XLA lowers that to a
    # reduce_window over all P samples — measured ~1 ms/batch, the
    # single costliest op of this branch). Instead:
    #   e_t(0)  from hop-block sums (the τ window spans exactly W/hop
    #           blocks, shifted one sample: − x_t[0]² + x_t[W]²),
    #   e_t(τ) = e_t(0) + cum(x_t[W+1..W+τ]²) − cum(x_t[1..τ]²),
    # where both cumulative sums run over max_p ≤ hop samples per frame
    # (hop-strided reshapes of y², no gathers).
    y2 = y_padded.astype(jnp.float32) ** 2
    if max_period <= hop_length:
        # kb and last as computed for the ACF half above
        nb = n_frames + kb - 1
        bsum = y2[..., :nb * hop_length].reshape(
            y2.shape[:-1] + (nb, hop_length)).sum(-1)
        e0 = sum(bsum[..., j:j + n_frames] for j in range(kb))
        e0 = (e0 - y2[..., 0:last + 1:hop_length]
              + y2[..., win_length:win_length + last + 1:hop_length])
        rows1 = y2[..., 1:1 + n_frames * hop_length].reshape(
            y2.shape[:-1] + (n_frames, hop_length))[..., :max_period]
        rows2 = y2[..., win_length + 1:
                   win_length + 1 + n_frames * hop_length].reshape(
            y2.shape[:-1] + (n_frames, hop_length))[..., :max_period]
        delta = jnp.cumsum(rows2 - rows1, axis=-1)
        energy = jnp.concatenate([e0[..., None], e0[..., None] + delta],
                                 axis=-1)
    else:  # e.g. very low fmin at high sr: fall back to the global cumsum
        csum = jnp.cumsum(y2, axis=-1)
        csum = jnp.concatenate(
            [jnp.zeros(y2.shape[:-1] + (1,), jnp.float32), csum], axis=-1)
        g = csum[..., win_length:] - csum[..., :-win_length]
        idx = (_np.arange(n_frames)[:, None] * hop_length
               + _np.arange(max_period + 1)[None, :]) + 1
        energy = g[..., idx]
    energy = jnp.where(jnp.abs(energy) < 1e-6, 0.0, energy)

    diff = energy[..., :1] + energy - 2.0 * acf
    numerator = diff[..., min_period:max_period + 1]
    tau = jnp.arange(1, max_period + 1, dtype=diff.dtype)
    cum_mean = jnp.cumsum(diff[..., 1:max_period + 1], axis=-1) / tau
    denominator = cum_mean[..., min_period - 1:max_period]
    return numerator / (denominator + _TINY32)


def _parabolic_shifts(x: jax.Array) -> jax.Array:
    """Sub-sample trough refinement: vertex offset of the parabola through
    each point and its neighbors; zeroed at edges and when |shift| > 1."""
    a = (x[..., :-2] + x[..., 2:] - 2.0 * x[..., 1:-1]) / 2.0
    b = (x[..., 2:] - x[..., :-2]) / 2.0
    inner = -b / (2.0 * a + _TINY32)
    inner = jnp.where(jnp.abs(inner) > 1.0, 0.0, inner)
    zeros = jnp.zeros_like(x[..., :1])
    return jnp.concatenate([zeros, inner, zeros], axis=-1)


@functools.partial(jax.jit, static_argnames=("fmin", "fmax", "sr",
                                             "frame_length", "win_length",
                                             "hop_length", "trough_threshold",
                                             "center"))
def yin(y: jax.Array, fmin: float = 50.0, fmax: float = 1000.0,
        sr: int = 22050, frame_length: int = 2048,
        win_length: int | None = None, hop_length: int | None = None,
        trough_threshold: float = 0.1, center: bool = True) -> jax.Array:
    """Frame-wise f0 in Hz: (..., n) → (..., n_frames)."""
    if win_length is None:
        win_length = frame_length // 2
    if hop_length is None:
        hop_length = frame_length // 4

    if center:
        y = _pad_center(y, frame_length // 2, "constant")

    min_period = max(int(math.floor(sr / fmax)), 1)
    max_period = min(int(math.ceil(sr / fmin)),
                     frame_length - win_length - 1)

    # hop < win: the sliding-energy rows need win+1+n_frames·hop samples,
    # which hop == win can exceed by one hop (reshape trace error)
    use_block = (stft_backend() == "matmul"
                 and win_length == frame_length // 2
                 and win_length % hop_length == 0
                 and hop_length < win_length)
    if use_block:
        n_frames = 1 + (y.shape[-1] - frame_length) // hop_length
        cmnd = _cmnd_block(y, frame_length, hop_length, n_frames,
                           win_length, min_period, max_period)
    else:
        frames = frame(y, frame_length, hop_length).astype(jnp.float32)
        cmnd = _cmnd(frames, frame_length, win_length, min_period,
                     max_period)
    return _f0_from_cmnd(cmnd, min_period, trough_threshold, sr)


def _f0_from_cmnd(cmnd: jax.Array, min_period: int,
                  trough_threshold: float, sr: int) -> jax.Array:
    shifts = _parabolic_shifts(cmnd)

    # Trough mask: local minima (left-strict, right-non-strict with edge
    # replication), with position 0 treated as a trough iff x0 < x1.
    left = jnp.concatenate([cmnd[..., :1], cmnd[..., :-1]], axis=-1)
    right = jnp.concatenate([cmnd[..., 1:], cmnd[..., -1:]], axis=-1)
    is_trough = (cmnd < left) & (cmnd <= right)
    first = (cmnd[..., 0] < cmnd[..., 1])[..., None]
    is_trough = jnp.concatenate([first, is_trough[..., 1:]], axis=-1)

    below = is_trough & (cmnd < trough_threshold)
    any_below = jnp.any(below, axis=-1)
    first_trough = jnp.argmax(below, axis=-1)
    global_min = jnp.argmin(cmnd, axis=-1)
    idx = jnp.where(any_below, first_trough, global_min)

    shift = jnp.take_along_axis(shifts, idx[..., None], axis=-1)[..., 0]
    period = min_period + idx.astype(jnp.float32) + shift
    return sr / period


@functools.partial(jax.jit, static_argnames=("fmin", "fmax", "sr",
                                             "frame_length"))
def yin_pitch(clips: jax.Array, sr: int, fmin: float = 50.0,
              fmax: float = 1000.0, frame_length: int = 2048) -> jax.Array:
    """Per-clip summary pitch: median of frame-wise f0 (the reference takes
    the NaN-free median — librosa.yin emits no NaNs, so plain median;
    ref yin.py:57-67). (..., n) → (...,) Hz."""
    f0 = yin(clips, fmin=fmin, fmax=fmax, sr=sr, frame_length=frame_length)
    return jnp.median(f0, axis=-1)


def estimate_note(pitch_hz: float, unicode: bool = True):
    """Host-side wrapper: Hz → (midi, note_name, midi_float), mirroring the
    reference's round_to_nearest_pitch (ref yin.py:21-37)."""
    from .pitch import midi_to_note
    if pitch_hz is None or not _np.isfinite(pitch_hz) or pitch_hz <= 0:
        return None, None, None
    midi_float = 12.0 * (_np.log2(pitch_hz) - _np.log2(440.0)) + 69.0
    midi = int(_np.round(midi_float))
    return midi, midi_to_note(midi, unicode=unicode), float(midi_float)
