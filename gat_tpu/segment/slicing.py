"""Onset-based note slicing with static budgets + masks, and the
file-level AudioSlicer API.

Behavioral spec: version_1/source/audio/slicing.py:96-165. The reference
slices clips in a Python loop and round-trips them through .wav files;
here `slice_at_onsets` materializes every clip of a fixed onset budget in
one gather (K × L), with a `kept` mask replacing the drop-logic:

  * slice window = [onset + attack_skip, min(start + clip_len, next_onset)]
  * the LAST detected onset's `next_onset` is itself, so its slice is
    empty → zero → dropped by the loudness gate. That quirk means the
    final note of a file is always discarded (SURVEY §3 build plan note);
    it is replicated under `strict_reference_compat=True` (default) and
    fixed (slice to end-of-audio) when False.
  * out-of-bounds windows yield zero clips (dropped)
  * clips quieter than min_slice_rms_db are dropped

`AudioSlicer` mirrors the reference class surface (load_wav,
apply_db_threshold, apply_rms_threshold, detect_onsets, slice_audio,
is_slice_loud_enough, save_clip, slice_and_save) on top of the jit ops.
"""
from __future__ import annotations

import functools
import warnings
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TARGET_SR, CLIP_DURATION, SLICER_CONFIG
# aliased: AudioSlicer.detect_onsets would otherwise shadow this name at
# the module level and call itself by accident after any refactor
from ..ops.onset import detect_onsets as _detect_onsets_op
from ..ops.resample import resample
from ..utils.wavio import read_wav, write_wav
from . import gating

__all__ = ["slice_at_onsets", "segment_waveform", "AudioSlicer"]


@functools.partial(jax.jit, static_argnames=("sr", "length_sec",
                                             "attack_skip_sec",
                                             "min_slice_rms_db",
                                             "strict_reference_compat",
                                             "onset_hop"))
def slice_at_onsets(y: jax.Array, onsets: jax.Array, onsets_valid: jax.Array,
                    sr: int, length_sec: float = CLIP_DURATION,
                    attack_skip_sec: float = SLICER_CONFIG.ATTACK_SKIP_SEC,
                    min_slice_rms_db: float = SLICER_CONFIG.MIN_SLICE_RMS_DB,
                    strict_reference_compat: bool = True,
                    n_valid_samples: jax.Array | None = None,
                    onset_hop: int | None = None):
    """(n,), (K,), (K,) → clips (K, L), kept (K,), times (K, 2) seconds.

    All K clip windows materialize in one gather; masks replace the
    reference's per-clip drop logic (ref slicing.py:125-165).

    `onset_hop` (caller contract: every onset is a multiple of it, as
    detect_onsets' frame→sample conversion guarantees) turns the
    per-element gather — K·L scalar reads that TPUs serialize; profiled
    at 9.4 of the fused file graph's 11.5 ms — into a whole-block row
    gather: clip k starts exactly at block onsets[k]/hop of the
    skip-shifted, hop-blocked waveform, so ⌈L/hop⌉ contiguous hop-rows
    per clip cover its window. segment_waveform passes its onset hop;
    arbitrary (unaligned) onsets keep the general gather.
    """
    n = y.shape[-1] if n_valid_samples is None else n_valid_samples
    k = onsets.shape[0]
    length = int(length_sec * sr)
    skip = int(attack_skip_sec * sr)

    count = jnp.sum(onsets_valid)
    slot = jnp.arange(k)
    last_onset = onsets[jnp.maximum(count - 1, 0)]
    if strict_reference_compat:
        nxt = jnp.where(slot + 1 < count, jnp.roll(onsets, -1), last_onset)
    else:
        nxt = jnp.where(slot + 1 < count, jnp.roll(onsets, -1),
                        jnp.asarray(n, onsets.dtype))

    start = onsets + skip
    end = jnp.minimum(start + length, nxt)
    in_bounds = (start < n) & (end <= n)

    # K × L windows; zero outside [start, end)
    pos = start[:, None] + jnp.arange(length)[None, :]
    window_ok = (pos < end[:, None]) & in_bounds[:, None] & \
        onsets_valid[:, None]
    if onset_hop is not None:
        hop = int(onset_hop)
        blocks_per_clip = -(-length // hop)
        avail = max(0, y.shape[-1] - skip)  # y[skip:] clamps when skip > n
        n_blocks = max(1, -(-avail // hop))
        tail = jnp.zeros((n_blocks * hop - avail,), y.dtype)
        blocks = jnp.concatenate([y[skip:], tail]).reshape(n_blocks, hop)
        first = jnp.clip(onsets // hop, 0, n_blocks - 1)
        idx = jnp.clip(first[:, None] + jnp.arange(blocks_per_clip)[None, :],
                       0, n_blocks - 1)
        rows = blocks[idx].reshape(k, blocks_per_clip * hop)[:, :length]
        clips = jnp.where(window_ok, rows, 0.0)
    else:
        clips = jnp.where(window_ok, y[jnp.clip(pos, 0, y.shape[-1] - 1)],
                          0.0)

    loud = gating.slice_rms_db(clips) > min_slice_rms_db
    kept = onsets_valid & loud  # empty/out-of-bounds clips are zero → quiet
    times = jnp.stack([start / sr, end / sr], axis=-1)
    return clips, kept, times


def segment_waveform(y: jax.Array, sr: int = TARGET_SR,
                     hop_length: int = SLICER_CONFIG.HOP_LEN,
                     length_sec: float = CLIP_DURATION,
                     min_sep: float = SLICER_CONFIG.MIN_SEP,
                     min_db: float = SLICER_CONFIG.MIN_IN_DB_THRESHOLD,
                     min_slice_rms_db: float = SLICER_CONFIG.MIN_SLICE_RMS_DB,
                     attack_skip_sec: float = SLICER_CONFIG.ATTACK_SKIP_SEC,
                     max_onsets: int = 64,
                     strict_reference_compat: bool = True,
                     n_valid_samples: jax.Array | None = None,
                     cand_budget: int | None = None):
    """Whole-file segmentation: gate → detect onsets → slice. All device
    ops; mirrors AudioSlicer.sliceNsave's compute (ref slicing.py:147-165)
    without the disk round-trip. Returns (clips, kept, onsets, onsets_valid,
    times, overflow, cap_overflow, n_detected) — `overflow` () bool is
    True iff the onset budgets truncated detections (earliest kept), so
    callers can surface it; `cap_overflow` isolates the max_onsets bit
    that no bigger candidate scan can repair (see
    pick_onsets_from_envelope's repairability contract — exact-fallback
    callers re-dispatch only on overflow & ~cap_overflow); `n_detected`
    () int32 is the pre-cap accepted-onset count (exact whenever the
    candidate bits are clean — cap-auto-scaling callers size the pow2
    cap from it directly).
    `cand_budget` overrides the onset candidate-scan budget (see
    pick_onsets_from_envelope): serving paths that know their content's
    onset density can size the sequential scan to it — overflow is
    flagged, never silent — while None keeps the conservative
    max(4·max_onsets, T/4) default."""
    # gating hop follows the slicer config; onset detection keeps the
    # reference's own default hop of 512 (ref slicing.py:106,150-151)
    y_gated = gating.gate_waveform(y, min_db, hop_length=hop_length,
                                   n_valid_samples=n_valid_samples)
    onsets, ovalid, overflow, cap_overflow, n_detected = _detect_onsets_op(
        y_gated, sr=sr, hop_length=512,
        min_sep=min_sep, max_onsets=max_onsets,
        n_valid_samples=n_valid_samples, cand_budget=cand_budget)
    clips, kept, times = slice_at_onsets(
        y, onsets, ovalid, sr=sr, length_sec=length_sec,
        attack_skip_sec=attack_skip_sec, min_slice_rms_db=min_slice_rms_db,
        strict_reference_compat=strict_reference_compat,
        n_valid_samples=n_valid_samples, onset_hop=512)
    return (clips, kept, onsets, ovalid, times, overflow, cap_overflow,
            n_detected)


class AudioSlicer:
    """File-level slicer with the reference's public surface
    (ref slicing.py:16-165), computing on device."""

    @staticmethod
    def load_wav(path, sr: int = 11025):
        wav, sr_in = read_wav(path)
        if sr is not None and sr_in != sr:
            wav = np.asarray(resample(wav, sr_in, sr))
            sr_in = sr
        return wav.astype(np.float32), sr_in

    @staticmethod
    def apply_db_threshold(y, min_db: float = -45.0):
        return np.asarray(gating.sample_db_gate(jnp.asarray(y), min_db))

    @staticmethod
    def apply_rms_threshold(y, hop_len: int = 512):
        return np.asarray(gating.rms_gate(jnp.asarray(y), hop_length=hop_len))

    @staticmethod
    def detect_onsets(y, sr: int = 11025, hop_len: int = 512,
                      min_sep: float = 0.25, max_onsets: int = 64):
        # one device->host transfer for all three outputs (per-array
        # syncs each cost a ~30 ms tunnel round trip)
        onsets, valid, overflow, *_ = jax.device_get(_detect_onsets_op(
            jnp.asarray(y), sr=sr, hop_length=hop_len, min_sep=min_sep,
            max_onsets=max_onsets))
        if bool(overflow):
            warnings.warn(
                f"[detect_onsets] onset budget truncated detections "
                f"(max_onsets={max_onsets}; earliest kept) — raise the "
                f"budget for exhaustive results", stacklevel=2)
        return [int(s) for s, v in zip(np.asarray(onsets), np.asarray(valid))
                if v]

    @staticmethod
    def is_slice_loud_enough(clip, min_rms_db: float = -40.0) -> bool:
        return bool(np.asarray(
            gating.slice_rms_db(jnp.asarray(clip))) > min_rms_db)

    @staticmethod
    def save_clip(clip, sr, out_dir, idx, onset_s, audio_name="clip"):
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        write_wav(out_dir / f"{idx:04d}_{audio_name}__{onset_s:.3f}s.wav",
                  np.asarray(clip), sr)

    def slice_and_save(self, audio_path, out_dir,
                       target_sr: int = TARGET_SR,
                       hop_len: int = SLICER_CONFIG.HOP_LEN,
                       length_sec: float = CLIP_DURATION,
                       min_sep: float = SLICER_CONFIG.MIN_SEP,
                       min_db_threshold: float =
                       SLICER_CONFIG.MIN_IN_DB_THRESHOLD,
                       min_slice_rms_db: float =
                       SLICER_CONFIG.MIN_SLICE_RMS_DB,
                       attack_skip_sec: float =
                       SLICER_CONFIG.ATTACK_SKIP_SEC,
                       max_onsets: int = 64, verbose: bool = True):
        """Segment a file and write kept clips to out_dir; returns the
        detected onset sample indices (ref sliceNsave, slicing.py:147-165,
        including its clip filename pattern)."""
        y, sr = self.load_wav(audio_path, target_sr)
        # one device->host transfer for all six outputs (the per-array
        # np.asarray calls below would each block on the tunnel)
        clips, kept, onsets, ovalid, times, overflow, *_ = jax.device_get(
            segment_waveform(
                jnp.asarray(y), sr=sr, hop_length=hop_len,
                length_sec=length_sec, min_sep=min_sep,
                min_db=min_db_threshold,
                min_slice_rms_db=min_slice_rms_db,
                attack_skip_sec=attack_skip_sec, max_onsets=max_onsets))
        if bool(overflow):
            warnings.warn(
                f"[slice_and_save] onset budget truncated detections for "
                f"{audio_path} (max_onsets={max_onsets}; earliest kept) — "
                f"later notes were NOT sliced", stacklevel=2)
        clips, kept = np.asarray(clips), np.asarray(kept)
        onsets, ovalid, times = (np.asarray(onsets), np.asarray(ovalid),
                                 np.asarray(times))
        total = 0
        for i in range(len(onsets)):
            if not ovalid[i]:
                break
            onset_s = onsets[i] / sr
            if not kept[i]:
                if verbose:
                    print(f"[slice_and_save] dropped clip at {onset_s:.2f}s;"
                          " [is_slice_loud_enough]")
                continue
            self.save_clip(clips[i], sr, out_dir, i, onset_s)
            total += 1
            if verbose:
                print(f"[slice_and_save] saved clip from: {times[i][0]:.3f}s"
                      f" to {times[i][1]:.3f}s")
        if verbose:
            print(f"[slice_and_save] total clips saved: {total}")
            print(f"audio sr: {sr}")
        return [int(s) for s, v in zip(onsets, ovalid) if v]

    # reference-spelled alias (ref slicing.py:147)
    sliceNsave = slice_and_save
