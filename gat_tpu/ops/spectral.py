"""Batched spectral front-end: framing, STFT, mel-spectrograms, MFCC.

This replaces the reference's librosa/torchaudio native DSP
(ref: version_1/source/audio/features.py:187-193 MFCC,
features.py:296-316 mel-spec) with jit-compiled XLA ops. Everything is
batched over leading axes and time-major internally: spectrograms are
(..., n_frames, n_bins). Two deliberately distinct conventions are kept:

  * `melspectrogram_librosa` / `mfcc` — librosa semantics: center=True with
    constant padding, Slaney mel with 'slaney' norm, power_to_db with
    ref=1.0 and a per-clip top_db=80 clamp.
  * `melspectrogram_torchaudio` — torchaudio semantics: center=True with
    reflect padding, HTK mel, no norm, AmplitudeToDB without top_db.

On TPU the mel projection and DCT become MXU GEMMs and XLA fuses the
windowing/|·|²/log elementwise stages around them. (Hand-fused Pallas
front-ends were measured and removed — see README 'Pallas decision
note'.)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .mel import mel_filterbank_librosa, mel_filterbank_torchaudio

__all__ = [
    "hann_window", "frame", "stft", "power_spectrogram",
    "power_to_db_librosa", "amplitude_to_db_torchaudio",
    "dct_ii_matrix", "melspectrogram_librosa", "melspectrogram_torchaudio",
    "mfcc", "n_frames", "set_stft_backend", "stft_backend",
    "set_matmul_dtype", "matmul_dtype",
]

# ---------------------------------------------------------------------------
# STFT backend: 'fft' (jnp.fft.rfft) or 'matmul' (real DFT as two MXU
# GEMMs). TPUs have no FFT unit — an rfft lowers to a slow generic
# decomposition, while a 2048×1025 cos/sin matmul rides the systolic array
# at full rate (cf. PAPERS.md: nnAudio/MelT GEMM-native spectrograms).
# 'auto' picks matmul on TPU-like backends, fft elsewhere.
# ---------------------------------------------------------------------------
_STFT_BACKEND = "auto"
_MATMUL_DTYPE = jnp.float32  # bfloat16 doubles MXU rate; fp32 accumulate

# np.finfo(np.float32).tiny — librosa's util.tiny denominator guard.
# Shared by the YIN CMND and onset-envelope normalizations: one source
# of truth so the A/B parity paths can never drift apart.
TINY32 = 1.1754944e-38


def set_matmul_dtype(dtype) -> None:
    """GEMM input dtype for the matmul backend (float32 or bfloat16);
    accumulation stays float32 via preferred_element_type."""
    global _MATMUL_DTYPE
    if jnp.dtype(dtype) != _MATMUL_DTYPE:  # no-op calls must not drop
        _MATMUL_DTYPE = jnp.dtype(dtype)   # every compiled program
        jax.clear_caches()


def matmul_dtype():
    return _MATMUL_DTYPE


def set_stft_backend(name: str) -> None:
    """Select the spectral backend. Clears jit caches: the flag is read at
    trace time, so previously compiled graphs embed the old backend."""
    global _STFT_BACKEND
    assert name in ("auto", "fft", "matmul")
    if name != _STFT_BACKEND:
        _STFT_BACKEND = name
        jax.clear_caches()


def stft_backend() -> str:
    if _STFT_BACKEND != "auto":
        return _STFT_BACKEND
    platform = jax.default_backend()
    # fft where a native FFT exists (pocketfft on CPU, cuFFT on GPU —
    # the DFT GEMM would do ~n/log n more MACs there); matmul on TPU
    # and TPU-like tunneled backends, which have no FFT unit
    return "fft" if platform in ("cpu", "gpu", "cuda", "rocm") else "matmul"


@functools.lru_cache(maxsize=8)
def _rdft_np(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT matrices: X @ C + i·(X @ S) == rfft(X) for real X.
    Shapes (n_fft, 1 + n_fft // 2), float32."""
    n = np.arange(n_fft)[:, None]
    f = np.arange(1 + n_fft // 2)[None, :]
    ang = 2.0 * np.pi * n * f / n_fft
    return (np.cos(ang).astype(np.float32),
            (-np.sin(ang)).astype(np.float32))


@functools.lru_cache(maxsize=16)
def _hann_np(n: int) -> np.ndarray:
    # Periodic (fftbins=True) Hann — what librosa and torch.hann_window use.
    k = np.arange(n, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * k / n)).astype(np.float32)


def hann_window(n: int) -> jax.Array:
    return jnp.asarray(_hann_np(n))


def n_frames(n_samples: int, frame_length: int, hop_length: int,
             center: bool = True) -> int:
    """Static frame count for a given signal length."""
    if center:
        n_samples += 2 * (frame_length // 2)
    return 1 + (n_samples - frame_length) // hop_length


def frame(y: jax.Array, frame_length: int, hop_length: int) -> jax.Array:
    """(..., n) → (..., n_frames, frame_length), no padding.

    When hop divides frame_length (every config in this framework: 2048/512,
    2048/256, 2048/1024) the frames are built from `frame_length//hop`
    shifted slices of a hop-strided reshape — pure slice+concat, which XLA
    lowers to cheap copies. The general case falls back to a gather."""
    n = y.shape[-1]
    nf = 1 + (n - frame_length) // hop_length
    if frame_length % hop_length == 0:
        k = frame_length // hop_length
        rows_n = n // hop_length
        rows = y[..., :rows_n * hop_length].reshape(
            y.shape[:-1] + (rows_n, hop_length))
        pieces = [rows[..., j:j + nf, :] for j in range(k)]
        return jnp.concatenate(pieces, axis=-1)
    idx = (np.arange(nf)[:, None] * hop_length
           + np.arange(frame_length)[None, :])
    return y[..., idx]


def _pad_center(y: jax.Array, pad: int, pad_mode: str) -> jax.Array:
    widths = [(0, 0)] * (y.ndim - 1) + [(pad, pad)]
    if pad_mode == "constant":
        return jnp.pad(y, widths)
    return jnp.pad(y, widths, mode=pad_mode)


# ---------------------------------------------------------------------------
# Block-DFT spectra: the TPU-native overlapping-frame DFT.
#
# Framing at hop h with n_fft N > h reads every sample N/h times; a GEMM
# over materialized frames therefore does N/h times more MACs (and HBM
# reads) than the signal warrants. Instead, DFT the NON-overlapping
# hop-sized blocks once — a (h × F) GEMM on the raw signal — and build
# each frame's spectrum as a K = N/h-term twiddle-weighted sum of its
# block spectra:
#
#   X_t[k] = Σ_{j<K} e^(-2πi·k·j/K) · C_{t+j}[k],
#   C_b[k] = Σ_{n<h} y[b·h + n] · e^(-2πi·k·n/N)
#
# which is exact (the frame at t·h is the concatenation of blocks
# t..t+K-1, and a block at offset j·h picks up the phase e^(-2πi·k·jh/N)).
# The Hann window is applied afterwards IN FREQUENCY as the exact 3-tap
# stencil of the periodic Hann transform, so one block DFT serves both
# windowed (spectrogram) and unwindowed (YIN autocorrelation) consumers.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _block_dft_np(hop: int, n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Block real-DFT matrices (hop, 1 + n_fft//2): blocks @ C + i·blocks
    @ S == rfft of each zero-padded block (n=n_fft). Exactly the first
    `hop` rows of the framed-DFT matrices — sliced from _rdft_np so the
    two spectral paths share ONE trig-matrix definition and can never
    drift."""
    return tuple(m[:hop].copy() for m in _rdft_np(n_fft))


@functools.lru_cache(maxsize=8)
def _block_twiddles_np(n_fft: int, hop: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-offset combine twiddles (K, F): e^(-2πi·k·j/K)."""
    k_ratio = n_fft // hop
    j = np.arange(k_ratio)[:, None]
    k = np.arange(1 + n_fft // 2)[None, :]
    ang = 2.0 * np.pi * j * k / k_ratio
    return (np.cos(ang).astype(np.float32),
            (-np.sin(ang)).astype(np.float32))


def block_coeffs(y_padded: jax.Array, n_fft: int, hop_length: int,
                 n_frames_out: int) -> tuple[jax.Array, jax.Array]:
    """(..., P) padded signal → per-block DFT coefficients
    (..., n_frames_out + N/hop - 1, F): the shared operand every
    overlapping-frame spectral consumer combines from."""
    assert n_fft % hop_length == 0
    k_ratio = n_fft // hop_length
    nb = n_frames_out + k_ratio - 1
    need = nb * hop_length
    if y_padded.shape[-1] < need:
        y_padded = jnp.pad(
            y_padded,
            [(0, 0)] * (y_padded.ndim - 1)
            + [(0, need - y_padded.shape[-1])])
    blocks = y_padded[..., :need].reshape(
        y_padded.shape[:-1] + (nb, hop_length)).astype(_MATMUL_DTYPE)
    c_m, s_m = _block_dft_np(hop_length, n_fft)
    cre = jnp.einsum("...bh,hf->...bf", blocks,
                     jnp.asarray(c_m, _MATMUL_DTYPE),
                     preferred_element_type=jnp.float32)
    cim = jnp.einsum("...bh,hf->...bf", blocks,
                     jnp.asarray(s_m, _MATMUL_DTYPE),
                     preferred_element_type=jnp.float32)
    return cre, cim


def combine_blocks(cre: jax.Array, cim: jax.Array, n_fft: int,
                   hop_length: int, n_frames_out: int,
                   n_blocks: int | None = None
                   ) -> tuple[jax.Array, jax.Array]:
    """Twiddle-combine block coefficients into frame spectra: frame t over
    blocks t..t+n_blocks-1 (default N/hop, i.e. the full n_fft frame;
    fewer gives the DFT of the frame's first n_blocks·hop samples)."""
    k_ratio = n_fft // hop_length
    if n_blocks is None:
        n_blocks = k_ratio
    twr, twi = _block_twiddles_np(n_fft, hop_length)
    xre = cre[..., 0:n_frames_out, :]
    xim = cim[..., 0:n_frames_out, :]
    for j in range(1, n_blocks):
        rj = cre[..., j:j + n_frames_out, :]
        ij = cim[..., j:j + n_frames_out, :]
        tr, ti = twr[j], twi[j]
        xre = xre + tr * rj - ti * ij
        xim = xim + tr * ij + ti * rj
    return xre, xim


def block_spectra(y_padded: jax.Array, n_fft: int, hop_length: int,
                  n_frames_out: int) -> tuple[jax.Array, jax.Array]:
    """(..., P) padded signal → unwindowed frame spectra
    (..., n_frames_out, F), F = 1 + n_fft//2, via the block DFT.
    Requires hop_length | n_fft."""
    cre, cim = block_coeffs(y_padded, n_fft, hop_length, n_frames_out)
    return combine_blocks(cre, cim, n_fft, hop_length, n_frames_out)


def hann_in_frequency(xre: jax.Array, xim: jax.Array
                      ) -> tuple[jax.Array, jax.Array]:
    """Windowed spectrum from the unwindowed one: the periodic Hann
    window is 0.5 - 0.25·(e^(+2πin/N) + e^(-2πin/N)), so in frequency
    X_w[k] = 0.5·X[k] - 0.25·(X[k-1] + X[k+1]), with the wrapped
    neighbors supplied by conjugate symmetry of a real signal's spectrum
    (X[-1] = conj(X[1]); X[N/2+1] = conj(X[N/2-1]))."""
    rm1 = jnp.concatenate([xre[..., 1:2], xre[..., :-1]], axis=-1)
    im1 = jnp.concatenate([-xim[..., 1:2], xim[..., :-1]], axis=-1)
    rp1 = jnp.concatenate([xre[..., 1:], xre[..., -2:-1]], axis=-1)
    ip1 = jnp.concatenate([xim[..., 1:], -xim[..., -2:-1]], axis=-1)
    return (0.5 * xre - 0.25 * (rm1 + rp1),
            0.5 * xim - 0.25 * (im1 + ip1))


def stft(y: jax.Array, n_fft: int = 2048, hop_length: int | None = None,
         win_length: int | None = None, center: bool = True,
         pad_mode: str = "constant") -> jax.Array:
    """Complex STFT, time-major: (..., n_frames, 1 + n_fft // 2).

    pad_mode='constant' matches librosa.stft defaults (librosa ≥ 0.10);
    pad_mode='reflect' matches torch.stft/torchaudio.
    """
    if win_length is None:
        win_length = n_fft
    if hop_length is None:
        hop_length = win_length // 4
    if center:
        y = _pad_center(y, n_fft // 2, pad_mode)
    frames = frame(y, n_fft, hop_length)
    win = hann_window(win_length)
    if win_length < n_fft:  # center-pad window to n_fft (librosa semantics)
        lpad = (n_fft - win_length) // 2
        win = jnp.pad(win, (lpad, n_fft - win_length - lpad))
    if stft_backend() == "matmul":
        # same MXU GEMM route as power_spectrogram, kept complex:
        # X @ C + i·(X @ S) == rfft(X) for real X (_rdft_np)
        c_m, s_m = _rdft_np(n_fft)
        fw = (frames * win).astype(_MATMUL_DTYPE)
        re = jnp.einsum("...tn,nf->...tf", fw,
                        jnp.asarray(c_m, _MATMUL_DTYPE),
                        preferred_element_type=jnp.float32)
        im = jnp.einsum("...tn,nf->...tf", fw,
                        jnp.asarray(s_m, _MATMUL_DTYPE),
                        preferred_element_type=jnp.float32)
        return jax.lax.complex(re, im)
    return jnp.fft.rfft(frames * win, n=n_fft, axis=-1)


def power_spectrogram(y: jax.Array, n_fft: int, hop_length: int,
                      center: bool = True, pad_mode: str = "constant",
                      power: float = 2.0,
                      n_freqs: int | None = None) -> jax.Array:
    """|STFT|^power, using the MXU matmul-DFT on TPU (the window is
    folded into the DFT operands; XLA fuses the square/add epilogue).

    n_freqs limits the output to the first `n_freqs` frequency bins
    (default: all 1 + n_fft//2). Mel consumers pass 1024 here — their
    filterbanks carry exactly zero weight at the Nyquist bin, and
    1024 = 8×128 tiles the DFT GEMM's output dimension perfectly onto
    the MXU's 128-lane registers where 1025 pays a ragged final tile.
    The mel result is mathematically unchanged (the dropped term is
    exactly zero); only the reduction order over the kept bins moves,
    within float reduction-reorder noise (~1e-7 relative)."""
    if n_freqs is None:
        n_freqs = 1 + n_fft // 2
    if stft_backend() == "matmul":
        if center:
            y = _pad_center(y, n_fft // 2, pad_mode)
        # Two einsums over once-materialized frames — the measured
        # winner for an UNSHARED spectrogram at EVERY overlap ratio:
        #   * block DFT + twiddle combine (K = n_fft/hop fewer MACs, no
        #     materialized frames) loses: the K-term combine re-reads
        #     the coefficient arrays K times from HBM and the graph is
        #     memory-bound there (K=8 ~3× slower; the K=4 route shipped
        #     here through most of round 2 until the batched-file bench
        #     showed frames +19% — block DFT only pays when ONE set of
        #     coefficients feeds MULTIPLE consumers, i.e. the fused
        #     MFCC+YIN front-end in features.py, which calls
        #     block_coeffs directly, not this function);
        #   * a single GEMM against the concatenated [cos|sin] matrix
        #     (frames nominally read once) is ~6% slower — XLA keeps
        #     the frame tiles resident across the two GEMMs anyway, and
        #     doubling the output width tiles worse;
        #   * an un-framed strided lax.conv is ~2× slower (poor TPU
        #     lowering for kernel 2048 / stride 256).
        # All measured on v5e in the full fused graphs — docs/PERF.md.
        frames = frame(y, n_fft, hop_length).astype(_MATMUL_DTYPE)
        c_m, s_m = _rdft_np(n_fft)
        c_m, s_m = c_m[:, :n_freqs], s_m[:, :n_freqs]
        win = _hann_np(n_fft)[:, None]
        cw = jnp.asarray(c_m * win, _MATMUL_DTYPE)
        sw = jnp.asarray(s_m * win, _MATMUL_DTYPE)
        re = jnp.einsum("...tn,nf->...tf", frames, cw,
                        preferred_element_type=jnp.float32)
        im = jnp.einsum("...tn,nf->...tf", frames, sw,
                        preferred_element_type=jnp.float32)
        p = re * re + im * im
        if power == 2.0:
            return p
        return jnp.sqrt(p) if power == 1.0 else p ** (power / 2.0)
    z = stft(y, n_fft=n_fft, hop_length=hop_length, center=center,
             pad_mode=pad_mode)[..., :n_freqs]
    mag = jnp.abs(z)
    return mag if power == 1.0 else mag ** power


def power_to_db_librosa(S: jax.Array, ref: float = 1.0, amin: float = 1e-10,
                        top_db: float | None = 80.0,
                        spec_axes: int = 2,
                        peak_mask: jax.Array | None = None) -> jax.Array:
    """librosa.power_to_db: 10·log10 with a per-call top_db clamp relative to
    the spectrogram's max. The reference calls it once per clip, so in this
    batched form the max is taken over the trailing `spec_axes` axes
    (ref librosa semantics used by features.py:187 via feature.mfcc).

    `peak_mask` (broadcastable to S, True = participate) restricts the
    top_db PEAK to masked entries: a zero-padded batch slot's straddling
    frames can carry real energy at different window weights than any
    exact-run frame, and an unmasked peak would shift the clamp floor of
    every frame — breaking padded-vs-exact bit parity downstream."""
    log_spec = 10.0 * jnp.log10(jnp.maximum(amin, S))
    log_spec = log_spec - 10.0 * np.log10(max(amin, ref))
    if top_db is not None:
        axes = tuple(range(-spec_axes, 0))
        ls = (log_spec if peak_mask is None
              else jnp.where(peak_mask, log_spec, -jnp.inf))
        peak = jnp.max(ls, axis=axes, keepdims=True)
        log_spec = jnp.maximum(log_spec, peak - top_db)
    return log_spec


def amplitude_to_db_torchaudio(S: jax.Array, stype: str = "power",
                               amin: float = 1e-10) -> jax.Array:
    """torchaudio.transforms.AmplitudeToDB(stype='power') with its default
    top_db=None — i.e. no clamp (ref features.py:303)."""
    mult = 10.0 if stype == "power" else 20.0
    return mult * jnp.log10(jnp.maximum(S, amin))  # ref_value=1 → db_mult 0


def _last_nonzero_bin(fb_np: np.ndarray) -> int:
    """Index of the last frequency bin with ANY mel weight. Both mel
    conventions end their top triangle exactly AT Nyquist, so the
    Nyquist bin's weight is identically zero and dropping it from the
    DFT GEMM leaves the mel output mathematically unchanged (reduction
    order over the kept bins moves within float noise) — while making
    the output dimension 1024 = 8×128, which tiles the hot GEMM
    perfectly onto the MXU (docs/PERF.md "Nyquist-bin trim")."""
    nz = np.nonzero(np.abs(fb_np).sum(axis=0))[0]
    return int(nz.max()) if nz.size else fb_np.shape[1] - 1


@functools.lru_cache(maxsize=16)
def _dct_ii_np(n_in: int, n_out: int) -> np.ndarray:
    """Orthonormal DCT-II matrix (n_in, n_out): X @ D == scipy.fftpack.dct
    (type 2, norm='ortho') truncated to n_out coefficients."""
    n = np.arange(n_in, dtype=np.float64)
    k = np.arange(n_out, dtype=np.float64)
    D = 2.0 * np.cos(np.pi * k[None, :] * (2.0 * n[:, None] + 1.0) / (2.0 * n_in))
    scale = np.full(n_out, np.sqrt(1.0 / (2.0 * n_in)))
    scale[0] = np.sqrt(1.0 / (4.0 * n_in))
    return (D * scale[None, :]).astype(np.float32)


def dct_ii_matrix(n_in: int, n_out: int) -> jax.Array:
    return jnp.asarray(_dct_ii_np(n_in, n_out))


@functools.partial(jax.jit, static_argnames=("sr", "n_fft", "hop_length",
                                             "n_mels", "power"))
def melspectrogram_librosa(y: jax.Array, sr: int, n_fft: int = 2048,
                           hop_length: int = 512, n_mels: int = 128,
                           power: float = 2.0) -> jax.Array:
    """(..., n) → (..., n_frames, n_mels), librosa.feature.melspectrogram
    defaults (constant center pad, Slaney mel + slaney norm)."""
    fb_np = np.asarray(mel_filterbank_librosa(sr, n_fft, n_mels))  # (M, F)
    f_keep = _last_nonzero_bin(fb_np) + 1
    S = power_spectrogram(y, n_fft, hop_length, pad_mode="constant",
                          power=power, n_freqs=f_keep)
    fb = jnp.asarray(fb_np[:, :f_keep])
    return jnp.einsum("...tf,mf->...tm", S, fb,
                      preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("sr", "n_fft", "hop_length",
                                             "n_mels", "power", "to_db"))
def melspectrogram_torchaudio(y: jax.Array, sr: int, n_fft: int = 2048,
                              hop_length: int = 256, n_mels: int = 64,
                              power: float = 2.0, to_db: bool = True
                              ) -> jax.Array:
    """(..., n) → (..., n_frames, n_mels), torchaudio MelSpectrogram
    semantics (reflect center pad, HTK mel, no norm) + AmplitudeToDB
    (ref features.py:296-316)."""
    fb_np = np.asarray(mel_filterbank_torchaudio(sr, n_fft, n_mels))  # (M, F)
    f_keep = _last_nonzero_bin(fb_np) + 1
    S = power_spectrogram(y, n_fft, hop_length, pad_mode="reflect",
                          power=power, n_freqs=f_keep)
    out = jnp.einsum("...tf,mf->...tm", S, jnp.asarray(fb_np[:, :f_keep]),
                     preferred_element_type=jnp.float32)
    if to_db:
        # torchaudio pairs MelSpectrogram(power=p) with
        # AmplitudeToDB(stype='power' if p==2 else 'magnitude'):
        # magnitude spectra scale by 20·log10, power spectra by
        # 10·log10 — keying on `power` keeps non-default callers from
        # silently getting half the dB scale
        out = amplitude_to_db_torchaudio(
            out, stype="power" if power == 2.0 else "magnitude")
    return out


@functools.partial(jax.jit, static_argnames=("sr", "n_mfcc", "n_fft",
                                             "hop_length", "n_mels"))
def mfcc(y: jax.Array, sr: int, n_mfcc: int = 20, n_fft: int = 2048,
         hop_length: int = 512, n_mels: int = 128) -> jax.Array:
    """(..., n) → (..., n_frames, n_mfcc), librosa.feature.mfcc defaults:
    mel power spectrogram → power_to_db(top_db=80, per clip) → ortho DCT-II
    over the mel axis (ref features.py:187-193)."""
    S = melspectrogram_librosa(y, sr, n_fft=n_fft, hop_length=hop_length,
                               n_mels=n_mels)
    S_db = power_to_db_librosa(S, spec_axes=2)
    D = dct_ii_matrix(n_mels, n_mfcc)  # (n_mels, n_mfcc)
    return jnp.einsum("...tm,mk->...tk", S_db, D,
                      preferred_element_type=jnp.float32)
