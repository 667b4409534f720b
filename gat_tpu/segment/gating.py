"""Noise gating: per-sample amplitude gate + dynamic frame-RMS gate.

Behavioral spec from the reference slicer (version_1/source/audio/
slicing.py:29-91), rebuilt as vectorized XLA ops:

  * sample_db_gate    — zero samples whose 20·log10|y| is below min_db
  * dynamic RMS gate  — frame RMS → dB → median_filter(5) → percentile-
    derived thresholds (noise pct 20 + 6 dB offset, clamped against the
    75th-percentile signal floor) → per-sample mask by frame repetition

Percentiles honor an optional valid-length mask so padded fixed-budget
batches gate identically to exact-length audio.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.filters import rms_frames, median_filter1d, masked_percentile

__all__ = ["sample_db_gate", "rms_db_envelope", "dynamic_thresholds",
           "rms_gate", "slice_rms_db", "gate_waveform"]

_EPS = 1e-10


def sample_db_gate(y: jax.Array, min_db: float = -45.0) -> jax.Array:
    """Zero out samples below an absolute dB-FS amplitude threshold
    (ref slicing.py:30-39)."""
    amp_db = 20.0 * jnp.log10(jnp.abs(y) + _EPS)
    return y * (amp_db > min_db).astype(y.dtype)


def rms_db_envelope(y: jax.Array, frame_length: int = 2048,
                    hop_length: int = 512, smooth: bool = True,
                    n_valid_samples: jax.Array | None = None) -> jax.Array:
    """Median-smoothed frame RMS in dB (ref slicing.py:44-56).

    `n_valid_samples` (1-D input only) makes a zero-padded batch slot
    produce BIT-IDENTICAL envelope values for every valid frame to
    running the exact-length audio alone. Two boundary effects need
    reconstruction (unlike the onset envelope, whose STFT zero-pads —
    see ops/onset.py): (a) the frame RMS reflect-pads at the signal end
    (ref passes pad_mode='reflect'), so the true signal's mirror is
    written into the padding before framing; (b) the median smoother
    reflects at the envelope end, so the last valid frames' windows get
    the mirrored envelope values, not the padded tail's. Bit-identical
    for n_valid_samples ≥ frame_length (every serving bucket satisfies
    this); a shorter valid region has NO exact counterpart (numpy
    reflect errors when the pad exceeds the signal), so its mirror
    degrades to zeros past the signal start — the slices below read
    from zero-left-padded copies precisely so a tiny nv can never
    clamp a start index and import unrelated audio into the pad."""
    if n_valid_samples is None:
        rms = rms_frames(y, frame_length, hop_length, pad_mode="reflect")
        rms_db = 20.0 * jnp.log10(rms + _EPS)
        if smooth:
            rms_db = median_filter1d(rms_db, 5)
        return rms_db
    assert y.ndim == 1, "n_valid_samples path is per-signal (vmap batches)"
    half = frame_length // 2
    n = y.shape[-1]
    nv = jnp.asarray(n_valid_samples, jnp.int32)
    y = y * (jnp.arange(n) < nv).astype(y.dtype)  # guarantee zero tail
    # (a) write the true end's reflect pad into [nv, nv+half): the extra
    # `half` zeros guarantee the dynamic write never clamps (numpy
    # 'reflect' mirrors without repeating the edge: pad[j] = y[nv-2-j])
    ye = jnp.concatenate([y, jnp.zeros((half,), y.dtype)])
    # slice the mirror source from a zero-LEFT-padded copy: the start
    # index (nv-1) is then nonnegative for every nv, so a valid region
    # shorter than the frame reads zeros instead of a clamped slice of
    # the signal's head (yz[nv-1 : nv-1+half] == y[nv-1-half : nv-1],
    # with out-of-range low positions zero)
    yz = jnp.concatenate([jnp.zeros((half,), y.dtype), y])
    seg = jax.lax.dynamic_slice(yz, (nv - 1,), (half,))
    ye = jax.lax.dynamic_update_slice(ye, jnp.flip(seg), (nv,))
    t_out = 1 + n // hop_length  # frame count of the unextended call
    rms = rms_frames(ye, frame_length, hop_length,
                     pad_mode="reflect")[..., :t_out]
    rms_db = 20.0 * jnp.log10(rms + _EPS)
    if smooth:
        # (b) scipy 'reflect' (numpy symmetric) at the valid envelope
        # end: positions nvf, nvf+1 take env[nvf-1], env[nvf-2]
        nvf = 1 + nv // hop_length
        # same zero-left-pad trick as (a): start nvf is nonnegative for
        # every nv, so a 1-frame envelope mirrors (zero, env[0]) rather
        # than a clamped slice
        ez = jnp.concatenate([jnp.zeros((2,), rms_db.dtype), rms_db])
        seg2 = jax.lax.dynamic_slice(ez, (nvf,), (2,))
        ee = jnp.concatenate([rms_db, jnp.zeros((2,), rms_db.dtype)])
        ee = jax.lax.dynamic_update_slice(ee, jnp.flip(seg2), (nvf,))
        rms_db = median_filter1d(ee, 5)[..., :t_out]
    return rms_db


def dynamic_thresholds(rms_db: jax.Array, valid: jax.Array,
                       noise_pct: float = 20.0, signal_pct: float = 75.0,
                       gate_offset_db: float = 6.0,
                       slice_offset_db: float = 10.0):
    """Percentile-derived gate/slice thresholds with the reference's clamp
    (ref slicing.py:59-76). Returns (gate_db, slice_min_db,
    (noise_floor, signal_floor))."""
    noise_floor = masked_percentile(rms_db, noise_pct, valid)
    signal_floor = masked_percentile(rms_db, signal_pct, valid)
    gate_db = noise_floor + gate_offset_db
    slice_min_db = noise_floor + slice_offset_db
    slice_min_db = jnp.maximum(slice_min_db, noise_floor + 5.0)
    slice_min_db = jnp.minimum(slice_min_db, signal_floor - 3.0)
    return gate_db, slice_min_db, (noise_floor, signal_floor)


def rms_gate(y: jax.Array, hop_length: int = 512,
             n_valid_samples: jax.Array | None = None) -> jax.Array:
    """Dynamic frame-RMS gate: mask frames below gate_db, expand to
    samples by frame repetition (ref slicing.py:78-91). Batched input
    maps over leading axes (thresholds are per-item, as they must be —
    percentiles of one recording's own RMS distribution)."""
    if y.ndim > 1:
        gate = functools.partial(rms_gate, hop_length=hop_length)
        if n_valid_samples is None:
            return jax.vmap(gate)(y.reshape(-1, y.shape[-1])) \
                .reshape(y.shape)
        nv = jnp.broadcast_to(jnp.asarray(n_valid_samples), y.shape[:-1])
        return jax.vmap(gate)(y.reshape(-1, y.shape[-1]),
                              n_valid_samples=nv.reshape(-1)) \
            .reshape(y.shape)
    rms_db = rms_db_envelope(y, hop_length=hop_length,
                             n_valid_samples=n_valid_samples)
    t = rms_db.shape[-1]
    if n_valid_samples is None:
        valid = jnp.ones((t,), bool)
    else:
        nvf = 1 + n_valid_samples // hop_length
        valid = jnp.arange(t) < nvf
    gate_db, _, _ = dynamic_thresholds(rms_db, valid)
    frame_mask = rms_db > gate_db
    mask = jnp.repeat(frame_mask, hop_length)[:y.shape[-1]]
    if n_valid_samples is not None:
        # invalid frames may read loud reconstructed-reflection values;
        # the tail must stay silent regardless of what the caller padded
        mask = mask & (jnp.arange(y.shape[-1]) < n_valid_samples)
    return y * mask.astype(y.dtype)


def slice_rms_db(clips: jax.Array) -> jax.Array:
    """Whole-clip RMS in dB, batched: (..., L) → (...,)
    (ref slicing.py:96-100 is_slice_loud_enough)."""
    rms = jnp.sqrt(jnp.mean(clips * clips, axis=-1))
    return 20.0 * jnp.log10(rms + _EPS)


def gate_waveform(y: jax.Array, min_db: float, hop_length: int = 512,
                  n_valid_samples: jax.Array | None = None) -> jax.Array:
    """Both gates in sequence, as the slicer applies them
    (ref slicing.py:149-150)."""
    y = sample_db_gate(y, min_db)
    return rms_gate(y, hop_length=hop_length, n_valid_samples=n_valid_samples)
