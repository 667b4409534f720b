"""Fused Pallas MFCC front-end.

One kernel computes, per batch tile, the whole librosa-semantics MFCC
chain the reference runs through five librosa calls per clip
(ref features.py:187-193): center-pad → frame → Hann window → real DFT →
power → mel projection (Slaney) → power_to_db with per-clip top_db clamp
→ orthonormal DCT-II → mean-pool over frames. Everything after the HBM
clip read stays in VMEM — no intermediate spectrogram ever touches HBM,
which is the win over the XLA op-by-op pipeline (whose (B, T, 1025)
power spectra round-trip through memory between stages).

Kernel shape, per the TPU rules in the Pallas guide:
  * grid = (batch_tiles, freq_tiles): frequency is a sequential reduction
    dimension — the (2048 × 1025) windowed cos/sin DFT operands stream
    through VMEM 128 lanes at a time (they cannot be VMEM-resident whole:
    2 × 9.4 MB), and the mel image accumulates in scratch, which persists
    across the sequentially-executed grid on TPU.
  * each frequency step does three MXU GEMMs per frame (cos, sin, mel)
    on static frame slices; the log/clamp/DCT epilogue runs once on the
    last frequency step under @pl.when.
  * DCT commutes with the frame mean (both linear), so the kernel pools
    log-mels first and applies one (n_mels × n_mfcc) GEMM.

Static-shape contract: clip length, frame count, and filter shapes are
Python ints at trace time.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..mel import mel_filterbank_librosa
from ..spectral import _hann_np, _rdft_np, _dct_ii_np

__all__ = ["mfcc_mean_pallas"]

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(x_ref, cw_ref, sw_ref, mel_ref, dct_ref, out_ref, mel_img,
            *, n_frames: int, n_fft: int, hop: int, n_mels: int,
            f_tiles: int, top_db: float):
    """Grid (b, f). x_ref (Bt, L_pad) padded clips; cw/sw (n_fft, 128)
    windowed-DFT tile f; mel_ref (128, n_mels) filterbank rows for tile f;
    mel_img scratch (Bt, n_frames·n_mels) accumulates mel power across f
    steps; out_ref (Bt, n_mfcc) written on the last f step."""
    f = pl.program_id(1)
    bt = x_ref.shape[0]

    @pl.when(f == 0)
    def _():
        mel_img[:, :] = jnp.zeros_like(mel_img)

    for t in range(n_frames):
        frame = x_ref[:, t * hop:t * hop + n_fft]          # (Bt, n_fft)
        re = jnp.dot(frame, cw_ref[:, :],
                     preferred_element_type=jnp.float32)
        im = jnp.dot(frame, sw_ref[:, :],
                     preferred_element_type=jnp.float32)
        power = re * re + im * im                          # (Bt, 128)
        mel_img[:, t * n_mels:(t + 1) * n_mels] += jnp.dot(
            power, mel_ref[:, :], preferred_element_type=jnp.float32)

    @pl.when(f == f_tiles - 1)
    def _():
        full = mel_img[:, :]
        log_mel = 10.0 * jnp.log10(jnp.maximum(full, 1e-10))
        peak = jnp.max(log_mel, axis=1, keepdims=True)     # per-clip
        clamped = jnp.maximum(log_mel, peak - top_db)
        mean_db = jnp.mean(clamped.reshape(bt, n_frames, n_mels), axis=1)
        out_ref[:, :] = jnp.dot(mean_db, dct_ref[:, :],
                                preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("sr", "n_mfcc", "n_fft",
                                             "hop", "n_mels", "block_b",
                                             "interpret"))
def mfcc_mean_pallas(clips: jax.Array, sr: int, n_mfcc: int = 64,
                     n_fft: int = 2048, hop: int = 512, n_mels: int = 128,
                     block_b: int = 64, interpret: bool = False
                     ) -> jax.Array:
    """(B, L) → (B, n_mfcc): fused equivalent of
    mean_t(librosa.feature.mfcc(y)) for every clip in the batch."""
    # Mosaic targets TPU; on CPU backends fall back to interpret mode
    interpret = interpret or jax.default_backend() == "cpu"
    b, length = clips.shape
    pad = n_fft // 2
    n_frames = 1 + (length + 2 * pad - n_fft) // hop
    n_freq = 1 + n_fft // 2
    f_tiles = _round_up(n_freq, _LANE) // _LANE

    # trace-time constant operands (windowed DFT, mel, DCT), lane-padded
    c_m, s_m = _rdft_np(n_fft)
    win = _hann_np(n_fft)[:, None]
    pad_f = f_tiles * _LANE - n_freq
    cw = np.pad(c_m * win, ((0, 0), (0, pad_f)))
    sw = np.pad(s_m * win, ((0, 0), (0, pad_f)))
    mel = mel_filterbank_librosa(sr, n_fft, n_mels).T  # (n_freq, n_mels)
    mel = np.pad(mel, ((0, pad_f), (0, 0)))            # zero rows: no-op
    dct = _dct_ii_np(n_mels, n_mfcc)

    # center-pad clips and round the batch up to the block size
    x = jnp.pad(clips.astype(jnp.float32), ((0, 0), (pad, pad)))
    b_pad = _round_up(b, block_b)
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0)))
    l_pad = x.shape[1]

    kernel = functools.partial(
        _kernel, n_frames=n_frames, n_fft=n_fft, hop=hop, n_mels=n_mels,
        f_tiles=f_tiles, top_db=80.0)

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
            pl.BlockSpec((n_mels, n_mfcc), lambda i, f: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, n_mfcc), lambda i, f: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_mfcc), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block_b, n_frames * n_mels), jnp.float32),
        ],
        interpret=interpret,
    )(x, jnp.asarray(cw), jnp.asarray(sw), jnp.asarray(mel),
      jnp.asarray(dct))
    return out[:b]
