"""Spectral-flux onset detection as a static-shape XLA graph.

Replaces librosa.onset.onset_strength / onset_detect / peak_pick /
onset_backtrack (ref consumer: version_1/source/audio/slicing.py:106-122).
The reference runs these as per-file NumPy loops; here the whole chain —
mel flux, normalization, moving-max/avg peak picking, greedy `wait`
spacing, energy-minimum backtracking, and the slicer's own min-separation
filter — is one jit graph over fixed-length (optionally masked) audio.

Data-dependent greedy steps (the `wait` filter and min-separation) are
`lax.scan`s over the frame axis with a carried last-accepted position —
compiler-friendly control flow instead of Python loops.

Onsets are returned as a fixed-budget (max_onsets,) index vector plus a
validity mask (SURVEY §7 hard-parts #4: static shapes for data-dependent
slicing).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .spectral import (TINY32 as _TINY32, melspectrogram_librosa,
                       power_to_db_librosa)

__all__ = ["onset_strength", "peak_pick_mask", "backtrack_indices",
           "pick_onsets_from_envelope", "detect_onsets"]


def onset_strength(y: jax.Array, sr: int, hop_length: int = 512,
                   n_fft: int = 2048, n_mels: int = 128,
                   lag: int = 1,
                   valid_frames: jax.Array | None = None) -> jax.Array:
    """Mel-spectral flux envelope, (..., n) → (..., n_frames).

    librosa.onset.onset_strength recipe: mel power spectrogram →
    power_to_db → positive lag-difference → mean over mel bands →
    left-pad by lag + n_fft//(2*hop) and truncate to the frame count
    (compensates the detection latency of centered frames).

    `valid_frames` (prefix mask, (..., T) bool) restricts the top_db
    clamp's per-clip peak to frames an EXACT (unpadded) run would have:
    in a zero-padded batch slot, frames straddling the valid end carry
    real audio at window weights no exact frame uses, so an unmasked
    peak can shift the clamp floor — and thus the envelope — of every
    valid frame (padded-vs-exact parity, docs/PARITY.md)."""
    S = melspectrogram_librosa(y, sr, n_fft=n_fft, hop_length=hop_length,
                               n_mels=n_mels)  # (..., T, M)
    S = power_to_db_librosa(
        S, spec_axes=2,
        peak_mask=(None if valid_frames is None
                   else valid_frames[..., :, None]))
    diff = jnp.maximum(0.0, S[..., lag:, :] - S[..., :-lag, :])
    env = jnp.mean(diff, axis=-1)  # (..., T - lag)
    pad = lag + n_fft // (2 * hop_length)
    widths = [(0, 0)] * (env.ndim - 1) + [(pad, 0)]
    env = jnp.pad(env, widths)
    return env[..., :S.shape[-2]]


def _peak_candidates(env: jax.Array, pre_max: int, post_max: int,
                     pre_avg: int, post_avg: int, delta: float,
                     valid: jax.Array | None = None) -> jax.Array:
    """The data-parallel half of librosa.util.peak_pick: a frame is a
    candidate iff it equals the moving max, is ≥ moving-avg + delta, and
    is nonzero (librosa iterates np.nonzero(detections)). The greedy
    `wait` spacing is applied by the callers' scans.

    Boundary semantics match librosa exactly: the moving max pads with
    env.min() (its mode="constant", cval=x.min()), and the moving average
    is librosa's truncated-window mean mean(x[max(0,n-pre_avg):
    min(n+post_avg, T)]) — librosa computes the interior with a uniform
    filter and then overwrites both boundary regions with exactly that
    truncated mean, so one cumulative-sum form reproduces all of it.
    `valid` (a PREFIX mask, frames covering real audio in a zero-padded
    batch slot) truncates both filters at the valid end the same way the
    real array end would, so padded and unpadded runs agree."""
    t = env.shape[-1]
    idx = jnp.arange(t)
    if valid is None:
        nvf = t
        x_min = jnp.min(env)
        x_sub = env
        x_sum = env
    else:
        nvf = jnp.sum(valid)
        x_min = jnp.min(jnp.where(valid, env, jnp.inf))
        x_sub = jnp.where(valid, env, x_min)   # constant pad at valid end
        x_sum = jnp.where(valid, env, 0.0)

    # moving max: window [n - pre_max, n + post_max) over x padded with
    # x_min on both sides (exact librosa cval; no arithmetic on env so
    # the env == mov_max test below stays bit-exact)
    size = int(pre_max + post_max)
    max_origin = int(math.ceil(0.5 * (pre_max - post_max)))
    left = size // 2 + max_origin
    right = size - 1 - left
    x_ext = jnp.concatenate([
        jnp.broadcast_to(x_min, (max(left, 0),)), x_sub,
        jnp.broadcast_to(x_min, (max(right, 0),))])
    mov_max = jax.lax.reduce_window(
        x_ext, -jnp.inf, jax.lax.max, (size,), (1,), "VALID")

    # moving average: truncated-window mean via one exclusive cumsum of
    # the MEAN-CENTERED envelope (identical in exact arithmetic; in
    # float32 a raw prefix sum grows ~linearly with t, so hour-scale
    # envelopes would put csum at ~1e4-1e5 where a window difference
    # carries meaningful ulp error — centered, the prefix stays near
    # zero and the window error bound is t-independent)
    x_mean = jnp.sum(x_sum) / jnp.maximum(nvf, 1).astype(env.dtype)
    x_c = x_sum - x_mean if valid is None else \
        jnp.where(valid, x_sum - x_mean, 0.0)
    csum = jnp.concatenate([jnp.zeros((1,), env.dtype),
                            jnp.cumsum(x_c, axis=-1)])
    a = jnp.clip(idx - pre_avg, 0, nvf)
    b = jnp.clip(idx + post_avg, 0, nvf)
    mov_avg = x_mean + (jnp.take(csum, b) - jnp.take(csum, a)) \
        / jnp.maximum(b - a, 1).astype(env.dtype)

    det = jnp.where(env == mov_max, env, 0.0)
    cand = (det != 0.0) & (det >= mov_avg + delta)
    if valid is not None:
        cand = cand & valid
    return cand


def peak_pick_mask(env: jax.Array, pre_max: int, post_max: int,
                   pre_avg: int, post_avg: int, delta: float,
                   wait: int, valid: jax.Array | None = None) -> jax.Array:
    """librosa.util.peak_pick as a boolean frame mask (1-D env only under
    vmap for batching). A frame is a peak iff it equals the moving max, is
    ≥ moving-avg + delta, and is > `wait` frames after the previous peak
    (greedy, via lax.scan)."""
    cand = _peak_candidates(env, pre_max, post_max, pre_avg, post_avg,
                            delta, valid)

    def step(last, xs):
        i, is_cand = xs
        keep = is_cand & (i > last + wait)
        new_last = jnp.where(keep, i, last)
        return new_last, keep

    idx = jnp.arange(env.shape[-1])
    _, keep = jax.lax.scan(step, jnp.asarray(-(10 ** 9)), (idx, cand))
    return keep


def backtrack_indices(energy: jax.Array,
                      valid: jax.Array | None = None) -> jax.Array:
    """For every frame i, the nearest energy local-minimum index ≤ i
    (librosa.onset.onset_backtrack semantics: minima where
    e[i] ≤ e[i−1] and e[i] < e[i+1], with frame 0 always a minimum).
    Returns (..., T) int32 so `bt[onset]` backtracks any onset.

    `valid` (prefix mask over frames) makes a zero-padded tail behave
    like the real array end: the last valid frame cannot be a minimum
    (its e[i+1] neighbor is padding, exactly as the final frame of an
    unpadded array is excluded)."""
    prev_ = energy[..., :-2]
    mid = energy[..., 1:-1]
    next_ = energy[..., 2:]
    inner = (mid <= prev_) & (mid < next_)
    if valid is not None:
        inner = inner & valid[..., 2:]
    t = energy.shape[-1]
    mask = jnp.concatenate([
        jnp.ones_like(energy[..., :1], bool), inner,
        jnp.zeros_like(energy[..., :1], bool)], axis=-1)
    idx = jnp.arange(t)
    cand = jnp.where(mask, idx, -1)
    return jax.lax.cummax(cand, axis=cand.ndim - 1).astype(jnp.int32)


def pick_onsets_from_envelope(env: jax.Array, sr: int, hop_length: int,
                              min_sep: float, max_onsets: int,
                              backtrack: bool = True,
                              valid_frames: jax.Array | None = None,
                              cand_budget: int | None = None):
    """The sequential half of onset detection, shared by the single-device
    and time-sharded paths: normalize the envelope (min-max over valid
    frames), librosa-default peak pick, optional energy-minimum
    backtracking, greedy min-separation, and compaction into a fixed
    onset budget. env: (T,) → (onsets (max_onsets,) int32, valid mask).

    The two greedy filters (peak_pick's `wait` spacing and the slicer's
    min-separation) run as ONE fused lax.scan over a COMPACTED candidate
    list instead of two scans over every frame: non-candidate frames never
    change either scan's carry, so restricting the scan to candidate
    frames (in order) is exact. `cand_budget` sizes the compacted list
    (default max(4·max_onsets, T/4), capped at T; pass 0 for a
    full-length scan). The default scales with T so overflow needs >25%
    of ALL frames to be raw candidates — a density the delta threshold
    makes pathological — and long recordings (the timeshard path) keep
    a proportional budget instead of a fixed cap; if an envelope still
    overflows, the EARLIEST `cand_budget` candidates are kept (the same
    earliest-first truncation `max_onsets` itself applies). On a 60 s
    file (T≈2584 frames) the compacted scan cut onset detection from
    ~10.3 ms to the envelope-bound floor on a v5e chip.

    Returns (onsets (max_onsets,) int32, valid (max_onsets,) bool,
    overflow () bool, cap_overflow () bool, n_kept () int32).
    `overflow` is True when
    truncation engaged AND could have changed the result: more kept
    onsets than `max_onsets`, or more raw candidates than `cand_budget`
    with the dropped (always latest) candidates not provably rejected by
    the greedy's wait / min-separation windows. Silent truncation is
    impossible (VERDICT r2 §next-4) — callers surface the flag in
    results/serve JSON — and a budget that truncates only
    greedy-rejected peaks stays unflagged.

    `cap_overflow` isolates the `max_onsets` bit: when it is True, a
    re-run with a bigger/no cand_budget provably returns the SAME first
    max_onsets onsets (bt is a cummax, so dropped candidates backtrack
    to samples ≥ every scanned one and sort past the cap) — the flag is
    only repairable by raising `max_onsets` itself. Exact-fallback
    consumers re-dispatch a file only when `overflow & ~cap_overflow`
    (a budget could have changed the result), never paying an exact
    re-run that cannot change anything.

    `n_kept` is how many onsets the greedy scan ACCEPTED before the cap
    (cap_overflow == n_kept > max_onsets). When the candidate-budget
    bits are clean — cap-only overflow, or any run with cand_budget
    0/None — the scan saw every candidate, so n_kept is the file's true
    onset count: cap-auto-scaling consumers jump straight to the pow2
    cap that fits instead of doubling through intermediate re-runs."""
    if cand_budget is not None and cand_budget < 0:
        raise ValueError(
            f"cand_budget must be >= 0 (0 = full-length scan, None = "
            f"proportional default); got {cand_budget}")
    t = env.shape[-1]
    if valid_frames is None:
        valid_frames = jnp.ones((t,), bool)

    emin = jnp.min(jnp.where(valid_frames, env, jnp.inf))
    emax = jnp.max(jnp.where(valid_frames, env, -jnp.inf))
    env_n = (env - emin) / (emax - emin + _TINY32)

    # librosa onset_detect default peak-pick parameters
    pre_max = int(0.03 * sr // hop_length)
    post_max = int(0.00 * sr // hop_length + 1)
    pre_avg = int(0.10 * sr // hop_length)
    post_avg = int(0.10 * sr // hop_length + 1)
    wait = int(0.03 * sr // hop_length)
    cand = _peak_candidates(env_n, pre_max, post_max, pre_avg, post_avg,
                            delta=0.07, valid=valid_frames)

    big = jnp.asarray(np.iinfo(np.int32).max, jnp.int32)
    frames = jnp.arange(t, dtype=jnp.int32)
    if cand_budget == 0:
        c = t
    else:
        c = min(t, cand_budget or max(4 * max_onsets, t // 4))
    n_raw_cand = jnp.sum(cand)
    if c < t:
        cand_i = jnp.sort(jnp.where(cand, frames, big))[:c]
        cand_v = cand_i < big
        cand_i = jnp.minimum(cand_i, t - 1)  # safe gather index when padded
        truncated = n_raw_cand > c
    else:
        cand_i, cand_v = frames, cand
        truncated = jnp.asarray(False)

    if backtrack:
        bt = backtrack_indices(env_n, valid_frames)
        onset_frames = bt[cand_i]
    else:
        onset_frames = cand_i
    samples = onset_frames * hop_length

    min_samples = int(min_sep * sr)

    def step(carry, xs):
        last_frame, last_sample = carry
        i, s, is_cand = xs
        # librosa peak_pick: > wait frames after the previous kept peak
        keep_peak = is_cand & (i > last_frame + wait)
        last_frame = jnp.where(keep_peak, i, last_frame)
        # slicer min-separation on the backtracked onset samples
        keep = keep_peak & (s - last_sample >= min_samples)
        last_sample = jnp.where(keep, s, last_sample)
        return (last_frame, last_sample), keep

    init = (jnp.asarray(-(10 ** 9), jnp.int32),
            jnp.asarray(-999999, jnp.int32))
    # unroll: each TPU while-loop iteration costs ~3 µs of loop overhead
    # regardless of body size (traced: the 512-step scan was 1.5 ms, 73%
    # of the whole single-file graph) — 8 greedy steps per iteration
    # amortize it without changing the sequential semantics
    (fin_frame, fin_sample), keep = jax.lax.scan(
        step, init, (cand_i, samples, cand_v), unroll=8)

    # Truncation drops the LATEST raw candidates (kept = earliest c), so
    # the scanned output is always a time-prefix of the exact scan's.
    # It can differ only if a dropped candidate would still be ACCEPTED
    # given the final carry. The latest raw candidate i_max DOMINATES:
    # frame index (the wait test) and backtracked sample (bt is a cummax,
    # so bt[i_max] >= bt[i] for every dropped i; min-sep fails harder for
    # smaller samples) are both pointwise-maximal at i_max — if i_max
    # fails the conjunction, every dropped candidate fails it, the
    # continuation accepts nothing, and the prefix is provably the full
    # result (flag stays False). Using the TRUE backtracked sample
    # instead of the frame·hop upper bound matters in practice: dense
    # audio's excess candidates mostly backtrack to already-accepted
    # energy minima (min-sep rejects them exactly), and the upper bound
    # flagged 41/128 bench-riff files whose outputs were bit-identical
    # to the exact scan — 32% pointless exact-fallback re-dispatches.
    i_max = jnp.max(jnp.where(cand, frames, -1))
    if backtrack:
        s_max = bt[jnp.maximum(i_max, 0)] * hop_length
    else:
        s_max = i_max * hop_length
    could_differ = ((i_max > fin_frame + wait)
                    & (s_max - fin_sample >= min_samples))
    cand_overflow = truncated & could_differ

    order = jnp.sort(jnp.where(keep, samples, big))
    if order.shape[-1] < max_onsets:
        # short envelopes (fewer candidate slots than the onset budget)
        # must still honor the documented static (max_onsets,) contract —
        # a bare [:max_onsets] would silently return a shorter array and
        # break cross-file stacking / fixed-shape jit consumers
        order = jnp.concatenate([
            order, jnp.full((max_onsets - order.shape[-1],), big,
                            jnp.int32)])
    order = order[:max_onsets]
    valid = order < big
    n_kept = jnp.sum(keep, dtype=jnp.int32)
    cap_overflow = n_kept > max_onsets
    overflow = cand_overflow | cap_overflow
    return jnp.where(valid, order, 0), valid, overflow, cap_overflow, n_kept


@functools.partial(jax.jit, static_argnames=("sr", "hop_length", "min_sep",
                                             "max_onsets", "backtrack",
                                             "cand_budget"))
def detect_onsets(y: jax.Array, sr: int = 22050, hop_length: int = 512,
                  min_sep: float = 0.3, max_onsets: int = 64,
                  backtrack: bool = True,
                  n_valid_samples: jax.Array | None = None,
                  cand_budget: int | None = None):
    """Full onset chain for ONE signal (vmap for batches):
    (n,) → (onset_samples (max_onsets,) int32, valid (max_onsets,) bool,
    overflow () bool — True iff a fixed budget truncated detections,
    cap_overflow () bool — the irreparable `max_onsets` bit of overflow,
    n_kept () int32 — onsets accepted before the cap;
    see pick_onsets_from_envelope for the repairability contract).

    Mirrors the reference slicer: onset_strength → onset_detect(backtrack)
    → frames_to_samples → greedy min-separation in samples
    (ref slicing.py:106-122). `n_valid_samples` masks a zero-padded tail so
    fixed-budget batching doesn't change detections."""
    # NOTE on padding: onset_strength's STFT center-pads with ZEROS
    # (librosa ≥0.10 constant pad, see melspectrogram_librosa), so a
    # zero-padded batch slot produces bit-identical PRE-clamp mel-dB
    # values for every valid frame — no edge reconstruction is needed.
    # What DOES need valid-awareness: the top_db clamp's per-clip peak
    # (straddling frames past the valid end carry real energy at window
    # weights no exact frame uses — onset_strength takes the mask), and
    # downstream the peak-pick filters and backtrack minima must treat
    # frame nvf-1 as the array end (_peak_candidates / backtrack_indices
    # take the mask).
    t = 1 + y.shape[-1] // hop_length  # centered STFT frame count
    if n_valid_samples is None:
        valid_frames = None
    else:
        nvf = 1 + n_valid_samples // hop_length  # frames covering real audio
        valid_frames = jnp.arange(t) < nvf
    env = onset_strength(y, sr, hop_length=hop_length,
                         valid_frames=valid_frames)
    return pick_onsets_from_envelope(env, sr, hop_length, min_sep,
                                     max_onsets, backtrack, valid_frames,
                                     cand_budget=cand_budget)
