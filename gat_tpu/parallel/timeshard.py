"""Time-axis sequence parallelism for long-audio segmentation.

SURVEY §5.7: the reference has no sequence-parallel story (it slices long
files into clips on one process); the TPU-native analog shards the *time
axis* of one long recording across the `data` mesh axis. The heavy work —
framing + windowed DFT + mel projection + dB (the onset-strength front
end, ~99% of segmentation FLOPs) — runs on each device over its own chunk
of the waveform, with a one-sided halo of (n_fft − hop) samples exchanged
from the right neighbor via `lax.ppermute` so frames straddling shard
boundaries are exact. The resulting envelope (4 bytes per hop — tiny) is
all-gathered and the sequential peak-picking logic runs replicated.

The last shard is the one position `ppermute` leaves zeroed; it instead
takes the replicated real tail of the signal beyond the sharded body, so
final-frame flux matches the single-device computation exactly.
"""
from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import spectral
from ..ops.onset import pick_onsets_from_envelope
from .mesh import DATA

__all__ = ["onset_envelope_timesharded", "detect_onsets_timesharded"]


def _local_log_mel(chunk: jax.Array, sr: int, hop: int, n_fft: int,
                   n_mels: int) -> jax.Array:
    """Un-padded framing of an extended chunk → log-mel rows (Tl, M).
    (librosa melspectrogram semantics minus the center pad, which the
    caller applied globally.) Same Nyquist-bin trim as
    melspectrogram_librosa: the filterbank carries zero weight at bin
    n_fft//2, so the DFT GEMMs emit f_keep = 1024 = 8×128 MXU-aligned
    bins instead of a ragged 1025."""
    fb_np = np.asarray(spectral.mel_filterbank_librosa(sr, n_fft, n_mels))
    f_keep = spectral._last_nonzero_bin(fb_np) + 1
    # ONE spectrogram definition: power_spectrogram owns the backend
    # dispatch (matmul vs fft), the window fold into the DFT operands,
    # and the _MATMUL_DTYPE knob — a local re-implementation here had
    # already drifted (it ignored set_matmul_dtype and didn't fold the
    # window), silently diverging from the single-device envelope
    power = spectral.power_spectrogram(chunk, n_fft, hop, center=False,
                                       n_freqs=f_keep)
    mel = jnp.einsum("tf,mf->tm", power, jnp.asarray(fb_np[:, :f_keep]),
                     preferred_element_type=jnp.float32)
    return mel


@functools.partial(jax.jit, static_argnames=("mesh", "sr", "hop_length",
                                             "n_fft", "n_mels"))
def onset_envelope_timesharded(y: jax.Array, mesh: Mesh, sr: int,
                               hop_length: int = 512, n_fft: int = 2048,
                               n_mels: int = 128) -> jax.Array:
    """Mel-flux onset envelope of ONE long waveform, time-sharded.

    Returns the same envelope as ops.onset.onset_strength(y) (same length
    up to the sharding frame budget)."""
    d = mesh.shape[DATA]
    pad = n_fft // 2
    y_p = jnp.pad(y, (pad, pad))
    t_global = 1 + (y_p.shape[0] - n_fft) // hop_length
    t_local = -(-t_global // d)  # ceil → per-shard frame budget
    owned = t_local * hop_length
    halo_n = n_fft - hop_length
    y_p = jnp.pad(y_p, (0, max(0, d * owned + halo_n - y_p.shape[0])))
    body = y_p[:d * owned]
    # the last shard's halo is the real tail beyond the sharded body —
    # replicated to all shards, used only where ppermute delivers nothing
    tail = y_p[d * owned:d * owned + halo_n]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(DATA), P()), out_specs=P(DATA))
    def local_mel(y_local, tail_rep):
        # halo: my head goes to my left neighbor; the last shard (which
        # ppermute leaves zeroed) takes the replicated real tail instead
        head = y_local[0, :halo_n]
        halo = jax.lax.ppermute(head, DATA,
                                [(i, i - 1) for i in range(1, d)])
        is_last = jax.lax.axis_index(DATA) == d - 1
        halo = jnp.where(is_last, tail_rep, halo)
        ext = jnp.concatenate([y_local[0], halo])
        return _local_log_mel(ext, sr, hop_length, n_fft, n_mels)[None]

    mel = local_mel(body.reshape(d, owned), tail)  # (d, Tl, M) sharded
    mel = mel.reshape(d * t_local, n_mels)
    # top_db peak over the REAL frames only: the ≤ d-1 budget frames
    # past t_global window the signal's tail at weights no exact frame
    # uses, and an unmasked peak would shift every frame's clamp floor
    # away from the single-device onset_strength envelope (the parity
    # class peak_mask exists for)
    s_db = spectral.power_to_db_librosa(
        mel, spec_axes=2,
        peak_mask=(jnp.arange(d * t_local) < t_global)[:, None])

    diff = jnp.maximum(0.0, s_db[1:] - s_db[:-1])
    env = jnp.mean(diff, axis=-1)
    lead = 1 + n_fft // (2 * hop_length)
    env = jnp.pad(env, (lead, 0))[:d * t_local]
    return env[:t_global]


@functools.partial(jax.jit, static_argnames=("sr", "hop_length", "min_sep",
                                             "max_onsets"))
def _pick_jit(env: jax.Array, sr: int, hop_length: int, min_sep: float,
              max_onsets: int):
    # jit at THIS call site (not on the shared helper itself, whose other
    # callers inline it into larger fused graphs): eager dispatch of its
    # ~30 ops over the tunneled TPU would cost ~1 s per call (CLAUDE.md)
    return pick_onsets_from_envelope(env, sr, hop_length, min_sep,
                                     max_onsets)


def detect_onsets_timesharded(y: jax.Array, mesh: Mesh, sr: int = 22050,
                              hop_length: int = 512, min_sep: float = 0.3,
                              max_onsets: int = 256):
    """Long-audio onset detection with the envelope computed
    sequence-parallel; the tiny sequential half (normalization, peak
    pick, backtrack, min-separation) is the same shared helper the
    single-device path uses (ref detect_onsets semantics,
    slicing.py:106-122), jit-compiled here so it runs as one dispatch.
    Returns (onsets, valid, overflow, cap_overflow, n_kept) like
    detect_onsets."""
    env = onset_envelope_timesharded(y, mesh, sr, hop_length)
    return _pick_jit(env, sr, hop_length, min_sep, max_onsets)
