"""Fused Pallas mel-spectrogram front-end (the CNN input path).

Companion to mfcc_frontend.py for the second hot front-end
(ref features.py:296-316): reflect-center-pad → frame (hop 256) → Hann →
real DFT → power → HTK mel (torchaudio convention, no norm) →
AmplitudeToDB — per batch tile, all in VMEM. Unlike MFCC there is no
cross-frame clamp (AmplitudeToDB has no top_db by default), so the
epilogue is purely per-element.

Same grid shape as the MFCC kernel: frequency tiles form a sequential
reduction dimension (the windowed DFT operands are ~19 MB and must
stream through VMEM), with the mel power image accumulating in scratch
that persists across the TPU's sequentially-executed grid.

Output is the model-ready NHWC image (B, n_mels, T, 1).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..mel import mel_filterbank_torchaudio
from ..spectral import _hann_np, _rdft_np

__all__ = ["melspec_pallas"]

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(x_ref, cw_ref, sw_ref, mel_ref, out_ref, mel_img,
            *, n_frames: int, n_fft: int, hop: int, n_mels: int,
            f_tiles: int, to_db: bool):
    """Grid (b, f): accumulate mel power across frequency tiles; convert
    to dB and emit (Bt, n_frames·n_mels) on the last tile."""
    f = pl.program_id(1)

    @pl.when(f == 0)
    def _():
        mel_img[:, :] = jnp.zeros_like(mel_img)

    for t in range(n_frames):
        frame = x_ref[:, t * hop:t * hop + n_fft]
        re = jnp.dot(frame, cw_ref[:, :],
                     preferred_element_type=jnp.float32)
        im = jnp.dot(frame, sw_ref[:, :],
                     preferred_element_type=jnp.float32)
        power = re * re + im * im
        mel_img[:, t * n_mels:(t + 1) * n_mels] += jnp.dot(
            power, mel_ref[:, :], preferred_element_type=jnp.float32)

    @pl.when(f == f_tiles - 1)
    def _():
        full = mel_img[:, :]
        if to_db:
            full = 10.0 * jnp.log10(jnp.maximum(full, 1e-10))
        out_ref[:, :] = full


@functools.partial(jax.jit, static_argnames=("sr", "n_mels", "n_fft",
                                             "hop", "to_db", "block_b",
                                             "interpret"))
def melspec_pallas(clips: jax.Array, sr: int, n_mels: int = 64,
                   n_fft: int = 2048, hop: int = 256, to_db: bool = True,
                   block_b: int = 64, interpret: bool = False) -> jax.Array:
    """(B, L) → (B, n_mels, T, 1) NHWC — fused equivalent of
    features.melspec_features (minus volume normalization, which callers
    apply first)."""
    interpret = interpret or jax.default_backend() == "cpu"
    b, length = clips.shape
    pad = n_fft // 2
    n_frames = 1 + (length + 2 * pad - n_fft) // hop
    n_freq = 1 + n_fft // 2
    f_tiles = _round_up(n_freq, _LANE) // _LANE

    c_m, s_m = _rdft_np(n_fft)
    win = _hann_np(n_fft)[:, None]
    pad_f = f_tiles * _LANE - n_freq
    cw = np.pad(c_m * win, ((0, 0), (0, pad_f)))
    sw = np.pad(s_m * win, ((0, 0), (0, pad_f)))
    mel = mel_filterbank_torchaudio(sr, n_fft, n_mels).T  # (n_freq, M)
    mel = np.pad(mel, ((0, pad_f), (0, 0)))

    x = jnp.pad(clips.astype(jnp.float32), ((0, 0), (pad, pad)),
                mode="reflect")  # torchaudio center convention
    b_pad = _round_up(b, block_b)
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0)))
    l_pad = x.shape[1]

    kernel = functools.partial(
        _kernel, n_frames=n_frames, n_fft=n_fft, hop=hop, n_mels=n_mels,
        f_tiles=f_tiles, to_db=to_db)

    out = pl.pallas_call(
        kernel,
        grid=(b_pad // block_b, f_tiles),
        in_specs=[
            pl.BlockSpec((block_b, l_pad), lambda i, f: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, _LANE), lambda i, f: (0, f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, _LANE), lambda i, f: (0, f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_LANE, n_mels), lambda i, f: (f, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, n_frames * n_mels),
                               lambda i, f: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_frames * n_mels),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block_b, n_frames * n_mels), jnp.float32),
        ],
        interpret=interpret,
    )(x, jnp.asarray(cw), jnp.asarray(sw), jnp.asarray(mel))
    # (B, T·M) → (B, M, T, 1)
    img = out[:b].reshape(b, n_frames, n_mels)
    return jnp.transpose(img, (0, 2, 1))[..., None]
