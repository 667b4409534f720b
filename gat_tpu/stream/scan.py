"""Device-side streaming transcription: lax.scan over fixed-size chunks
with carried ring state.

SURVEY §5.7(b): the reference streams by polling a host-side ring buffer
from Python (transcribe_live.py:165-196). The TPU-native formulation
keeps the ring ON DEVICE: one jit program scans over audio chunks, each
step sliding a ring of (context + chunk) samples, detecting the newest
onset in its commit region, slicing the clip, running the feature +
ensemble forward, and emitting (probs, onset, valid) — so an arbitrarily
long recording streams through the chip in a single traced graph with no
host round-trips between chunks.

Emission policy per step (static budget of one note per chunk): the
earliest onset inside the commit window [0, chunk) of the ring that is
≥ min_sep after the previously emitted onset, and early enough that a
full clip length of audio follows it inside the ring.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CLIP_DURATION, SLICER_CONFIG
from ..ops.onset import detect_onsets

__all__ = ["ScanStreamer"]


class ScanStreamer:
    """Builds the jit streaming program around a Transcriber's batched
    clip→probs core."""

    def __init__(self, transcriber, sr: int = 22050, chunk_s: float = 0.5,
                 context_s: float = 1.0,
                 clip_duration: float = CLIP_DURATION,
                 min_sep: float = SLICER_CONFIG.MIN_SEP,
                 min_slice_rms_db: float = SLICER_CONFIG.MIN_SLICE_RMS_DB):
        self.transcriber = transcriber
        self.sr = sr
        self.chunk = int(chunk_s * sr)
        self.context = int(context_s * sr)
        self.ring_n = self.chunk + self.context
        self.clip_n = int(clip_duration * sr)
        self.min_sep_n = int(min_sep * sr)
        self.min_slice_rms_db = min_slice_rms_db
        assert self.ring_n >= self.chunk + self.clip_n, \
            "context must cover a full clip beyond the commit window"
        self._scan_fn = self._build()

    def _build(self):
        t = self.transcriber
        sr = self.sr
        chunk, ring_n, clip_n = self.chunk, self.ring_n, self.clip_n
        min_sep_n = self.min_sep_n
        mfcc_params, melspec_params = t._feature_params()
        if "cnn" not in t.model_ckpts:
            melspec_params = None
        from ..infer.pipeline import build_clip_ensemble_fn
        from ..segment.gating import slice_rms_db
        ensemble = build_clip_ensemble_fn(
            t.predictor, t.scaler, t.ckpt_sr, mfcc_params, melspec_params,
            in_sr=sr, clip_len=round(clip_n * t.ckpt_sr / sr),
            pitch_on_normalized=True)

        def clip_probs(clip):
            """(clip_n,) @ sr → (num_classes,) ensemble probs."""
            return ensemble(clip[None])[0]

        def step(carry, chunk_x):
            ring, last_emit = carry  # last_emit: global sample idx
            ring = jnp.concatenate([ring[chunk:], chunk_x])
            base = last_emit[1]  # global index of ring[0]
            onsets, valid = detect_onsets(ring, sr=sr, min_sep=0.0,
                                          max_onsets=8)
            g = base + onsets
            # commit region: onset inside [0, chunk) of the ring, with a
            # full clip of audio after it, respecting min separation
            ok = (valid & (onsets < chunk)
                  & (onsets + clip_n <= ring_n)
                  & (g - last_emit[0] >= min_sep_n))
            any_ok = jnp.any(ok)
            first = jnp.argmax(ok)
            onset = onsets[first]
            clip = jax.lax.dynamic_slice(ring, (onset,), (clip_n,))
            loud = slice_rms_db(clip) > self.min_slice_rms_db
            emit = any_ok & loud
            probs = clip_probs(clip)
            new_last = jnp.where(emit, base + onset, last_emit[0])
            carry = (ring, jnp.stack([new_last, base + chunk]))
            return carry, (probs, base + onset, emit)

        @functools.partial(jax.jit)
        def run(chunks):
            ring0 = jnp.zeros(ring_n, jnp.float32)
            # carry[0]: last emitted onset (global); carry[1]: ring[0]'s
            # global sample index for the upcoming step
            last0 = jnp.asarray([-10 ** 9, -self.context], jnp.int32)
            _, (probs, onsets, emits) = jax.lax.scan(
                step, (ring0, last0), chunks)
            return probs, onsets, emits

        return run

    def transcribe_stream(self, y: np.ndarray) -> list[dict]:
        """Stream a full waveform chunk-by-chunk through the device scan;
        returns one result dict per emitted note."""
        n_chunks = int(np.ceil(len(y) / self.chunk))
        pad = n_chunks * self.chunk - len(y)
        chunks = np.pad(np.asarray(y, np.float32), (0, pad)) \
            .reshape(n_chunks, self.chunk)
        probs, onsets, emits = self._scan_fn(jnp.asarray(chunks))
        probs, onsets, emits = (np.asarray(probs), np.asarray(onsets),
                                np.asarray(emits))
        rm = self.transcriber.predictor.reverse_map
        out = []
        for p, o, e in zip(probs, onsets, emits):
            if not e:
                continue
            idx = int(p.argmax())
            out.append({
                "onset_s": float(o) / self.sr,
                "labels": [rm[idx] if rm else idx],
                "confidences": np.asarray([p[idx]]),
                "probs": p[None],
            })
        return out
