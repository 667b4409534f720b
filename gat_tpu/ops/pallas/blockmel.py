"""Fused block-DFT mel front-end: the memory-bound melspec fix.

The XLA block-DFT melspectrogram (ops/spectral.py) is exact but
memory-hostile: the K-term twiddle combine re-reads the (B, nb, F)
coefficient arrays K times from HBM and materializes the (B, T, F)
spectra twice (re, im) before the mel projection reduces F=1025 down to
n_mels — ~7 ms of a 12 ms step at batch 1024 (XLA cost analysis). XLA
cannot fuse a dot into that slice-sum producer chain; this kernel can:

  per batch tile, entirely in VMEM —
    hop-block real DFT (MXU)  →  K-term twiddle combine (VPU)
    →  Hann in frequency (3-tap stencil via lane rolls)
    →  |·|²  →  mel projection (MXU)  [→ dB]

so HBM sees only the hop-sized signal blocks in and the (B, T, n_mels)
mel image out — ~25 MB/batch instead of ~1.5 GB.

Correctness details:
  * the DFT matrices carry one EXTRA column for f = n_fft/2 + 1, so the
    Hann stencil's plus-neighbor at the Nyquist bin is real data (the
    f-grid continues past Nyquist with the true DFT values; for a real
    signal that column equals conj(X[n_fft/2 - 1]) automatically);
  * the DC column's minus-neighbor is fixed up explicitly
    (X[-1] = conj(X[1]));
  * lane columns past the extra one are zero-padded and land on
    zero-padded mel filterbank rows, so they never reach the output.

Verified against the FFT backend to fp32 precision (tests); wired in as
the default TPU melspec path via features.melspec_features.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..mel import mel_filterbank_torchaudio

__all__ = ["melspec_block_pallas"]

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=8)
def _block_dft_ext_np(hop: int, n_fft: int, f2p: int):
    """Block real-DFT matrices (hop, f2p) extended one column past
    Nyquist, zero-padded to f2p lanes."""
    f2 = n_fft // 2 + 2  # 0..Nyquist+1 inclusive
    n = np.arange(hop)[:, None]
    f = np.arange(f2)[None, :]
    ang = 2.0 * np.pi * n * f / n_fft
    c = np.pad(np.cos(ang), ((0, 0), (0, f2p - f2)))
    s = np.pad(-np.sin(ang), ((0, 0), (0, f2p - f2)))
    return c.astype(np.float32), s.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _twiddles_ext_np(n_fft: int, hop: int, f2p: int):
    k_ratio = n_fft // hop
    f2 = n_fft // 2 + 2
    j = np.arange(k_ratio)[:, None]
    k = np.arange(f2)[None, :]
    ang = 2.0 * np.pi * j * k / k_ratio
    twr = np.pad(np.cos(ang), ((0, 0), (0, f2p - f2)))
    twi = np.pad(-np.sin(ang), ((0, 0), (0, f2p - f2)))
    return twr.astype(np.float32), twi.astype(np.float32)


def _kernel(x_ref, c_ref, s_ref, twr_ref, twi_ref, fb_ref, out_ref,
            *, bt: int, nb: int, hop: int, k_ratio: int, n_frames: int,
            f2p: int, mp: int, to_db: bool):
    # bf16 MXU passes with f32 accumulation — the same arithmetic XLA's
    # default matmul precision uses for the einsum baseline
    x = x_ref[:, :, :].reshape(bt * nb, hop).astype(jnp.bfloat16)
    cre = jnp.dot(x, c_ref[:, :],
                  preferred_element_type=jnp.float32).reshape(bt, nb, f2p)
    cim = jnp.dot(x, s_ref[:, :],
                  preferred_element_type=jnp.float32).reshape(bt, nb, f2p)

    xre = twr_ref[0, :] * cre[:, :n_frames, :]
    xim = twr_ref[0, :] * cim[:, :n_frames, :]  # twi[0] == 0
    for j in range(1, k_ratio):
        rj = cre[:, j:j + n_frames, :]
        ij = cim[:, j:j + n_frames, :]
        twr = twr_ref[j, :]
        twi = twi_ref[j, :]
        xre = xre + twr * rj - twi * ij
        xim = xim + twr * ij + twi * rj

    # Hann in frequency: X_w[k] = 0.5·X[k] − 0.25·(X[k−1] + X[k+1]).
    # Lane rolls supply the neighbors; DC's minus-neighbor is
    # conj(X[1]) (fix-up below), Nyquist's plus-neighbor is the real
    # extra column baked into the DFT matrices.
    lane = jax.lax.broadcasted_iota(jnp.int32, xre.shape, xre.ndim - 1)
    rm1 = jnp.where(lane == 0, pltpu.roll(xre, f2p - 1, axis=2),
                    pltpu.roll(xre, 1, axis=2))
    im1 = jnp.where(lane == 0, -pltpu.roll(xim, f2p - 1, axis=2),
                    pltpu.roll(xim, 1, axis=2))
    rp1 = pltpu.roll(xre, f2p - 1, axis=2)
    ip1 = pltpu.roll(xim, f2p - 1, axis=2)
    wre = 0.5 * xre - 0.25 * (rm1 + rp1)
    wim = 0.5 * xim - 0.25 * (im1 + ip1)

    power = (wre * wre + wim * wim).reshape(
        bt * n_frames, f2p).astype(jnp.bfloat16)
    mel = jnp.dot(power, fb_ref[:, :], preferred_element_type=jnp.float32)
    if to_db:
        mel = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    out_ref[:, :, :] = mel.reshape(bt, n_frames, mp)


@functools.partial(jax.jit, static_argnames=("sr", "n_mels", "n_fft",
                                             "hop", "to_db", "block_b",
                                             "interpret"))
def melspec_block_pallas(clips: jax.Array, sr: int, n_mels: int = 64,
                         n_fft: int = 2048, hop: int = 256,
                         to_db: bool = True, block_b: int = 8,
                         interpret: bool = False) -> jax.Array:
    """(B, L) → (B, n_mels, T, 1) NHWC — torchaudio-convention mel
    spectrogram (reflect center pad, HTK mel, AmplitudeToDB), fused.
    Callers apply volume normalization first (as melspec_features does).
    Requires hop | n_fft."""
    assert n_fft % hop == 0
    interpret = interpret or jax.default_backend() == "cpu"
    b, length = clips.shape
    pad = n_fft // 2
    k_ratio = n_fft // hop
    n_frames = 1 + (length + 2 * pad - n_fft) // hop
    nb = n_frames + k_ratio - 1
    f2p = _round_up(n_fft // 2 + 2, _LANE)
    mp = _round_up(n_mels, _LANE)

    c_m, s_m = _block_dft_ext_np(hop, n_fft, f2p)
    twr, twi = _twiddles_ext_np(n_fft, hop, f2p)
    fb = mel_filterbank_torchaudio(sr, n_fft, n_mels).T  # (F, M)
    fb = np.pad(fb, ((0, f2p - fb.shape[0]), (0, mp - n_mels)))

    y = jnp.pad(clips.astype(jnp.float32), ((0, 0), (pad, pad)),
                mode="reflect")
    need = nb * hop
    if y.shape[1] < need:
        y = jnp.pad(y, ((0, 0), (0, need - y.shape[1])))
    b_pad = _round_up(b, block_b)
    if b_pad != b:
        y = jnp.pad(y, ((0, b_pad - b), (0, 0)))
    blocks = y[:, :need].reshape(b_pad, nb, hop)

    kernel = functools.partial(
        _kernel, bt=block_b, nb=nb, hop=hop, k_ratio=k_ratio,
        n_frames=n_frames, f2p=f2p, mp=mp, to_db=to_db)

    out = pl.pallas_call(
        kernel,
        grid=(b_pad // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, nb, hop), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hop, f2p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hop, f2p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_ratio, f2p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_ratio, f2p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f2p, mp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, n_frames, mp),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_frames, mp), jnp.float32),
        interpret=interpret,
    )(blocks, jnp.asarray(c_m, jnp.bfloat16), jnp.asarray(s_m, jnp.bfloat16),
      jnp.asarray(twr), jnp.asarray(twi), jnp.asarray(fb, jnp.bfloat16))
    # (B, T, Mp) → (B, M, T, 1)
    return jnp.transpose(out[:b, :, :n_mels], (0, 2, 1))[..., None]
