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

Emission policy per step (static budget of `max_notes_per_chunk` notes,
default 8): every onset inside the commit window [0, chunk) of the ring
that is ≥ min_sep after the previously *emitted* onset (greedy, in time
order, carried across chunks), loud enough to pass the slice RMS gate,
and early enough that a full clip length of audio follows it inside the
ring. All budget slots run through the ensemble as ONE batched forward
per chunk, so dense playing costs no extra dispatches.
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
                 clip_duration: float | None = None,
                 min_sep: float = SLICER_CONFIG.MIN_SEP,
                 min_slice_rms_db: float = SLICER_CONFIG.MIN_SLICE_RMS_DB,
                 max_notes_per_chunk: int = 8):
        if clip_duration is None:
            # checkpoints are the source of truth (like every other
            # inference path): default to the trained clip duration, not
            # the global config's
            clip_duration = getattr(transcriber, "clip_length",
                                    CLIP_DURATION)
        self.transcriber = transcriber
        self.sr = sr
        self.chunk = int(chunk_s * sr)
        self.context = int(context_s * sr)
        self.ring_n = self.chunk + self.context
        self.clip_n = int(clip_duration * sr)
        self.min_sep_n = int(min_sep * sr)
        self.min_slice_rms_db = min_slice_rms_db
        self.max_notes_per_chunk = int(max_notes_per_chunk)
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

        k_slots = self.max_notes_per_chunk

        def step(carry, chunk_x):
            # rel_last: last EMITTED onset relative to ring[0] — kept
            # ring-relative (not global) so arbitrarily long streams
            # never overflow int32; the host reconstructs absolute time
            # from the chunk index (unbounded Python ints)
            ring, rel_last = carry
            ring = jnp.concatenate([ring[chunk:], chunk_x])
            rel_last = jnp.maximum(rel_last - chunk, -(2 ** 30))
            onsets, valid, ovf, *_ = detect_onsets(ring, sr=sr, min_sep=0.0,
                                                   max_onsets=k_slots)
            # candidate clips for every budget slot (dynamic_slice clamps
            # out-of-range starts; such slots are masked out below anyway)
            clips = jax.vmap(
                lambda o: jax.lax.dynamic_slice(ring, (o,), (clip_n,)))(
                    onsets)
            loud = jax.vmap(slice_rms_db)(clips) > self.min_slice_rms_db
            # commit region: onset inside [0, chunk) of the ring, with a
            # full clip of audio after it, loud enough to keep
            eligible = (valid & loud & (onsets < chunk)
                        & (onsets + clip_n <= ring_n))
            # greedy min-separation against the last EMITTED onset, carried
            # across chunks (onsets arrive sorted ascending)
            def sel(last, oe):
                o, e = oe
                take = e & (o - last >= min_sep_n)
                return jnp.where(take, o, last), take

            new_last, takes = jax.lax.scan(sel, rel_last, (onsets, eligible))
            probs = ensemble(clips)  # one batched forward for all slots
            return (ring, new_last), (probs, onsets, takes, ovf)

        @functools.partial(jax.jit)
        def run(chunks):
            ring0 = jnp.zeros(ring_n, jnp.float32)
            last0 = jnp.asarray(-(2 ** 30), jnp.int32)
            _, (probs, onsets, emits, ovf) = jax.lax.scan(
                step, (ring0, last0), chunks)
            return probs, onsets, emits, ovf

        return run

    def transcribe_stream(self, y: np.ndarray) -> list[dict]:
        """Stream a full waveform chunk-by-chunk through the device scan;
        returns one result dict per emitted note."""
        # flush: a note is committed only once its chunk slides past the
        # context region, so a finite waveform needs `context` extra zeros
        # or its tail notes never reach a commit window
        total = len(y) + self.context
        n_chunks = int(np.ceil(total / self.chunk))
        pad = n_chunks * self.chunk - len(y)
        chunks = np.pad(np.asarray(y, np.float32), (0, pad)) \
            .reshape(n_chunks, self.chunk)
        probs, onsets, emits, ovf = self._scan_fn(jnp.asarray(chunks))
        # (n_chunks, k_slots, …) → flat note stream; slots are time-ordered
        # within a chunk, so the flattened order is globally ascending.
        # Onsets are ring-relative; absolute time comes from the chunk
        # index (Python ints — no 27-hour int32 ceiling on device)
        k = probs.shape[1]
        probs = np.asarray(probs).reshape(-1, probs.shape[-1])
        onsets = np.asarray(onsets).reshape(-1).astype(np.int64)
        emits = np.asarray(emits).reshape(-1)
        ovf = np.asarray(ovf)
        rm = self.transcriber.predictor.reverse_map
        out = []
        for i, (p, o, e) in enumerate(zip(probs, onsets, emits)):
            if not e:
                continue
            step_i = i // k
            idx = int(p.argmax())
            out.append({
                "onset_s": (step_i * self.chunk - self.context + int(o))
                / self.sr,
                "labels": [rm[idx] if rm else idx],
                "confidences": np.asarray([p[idx]]),
                "probs": p[None],
                # the per-chunk onset budget truncated detections — this
                # chunk's note list may not be exhaustive (never silent)
                "onset_overflow": bool(ovf[step_i]),
            })
        return out
