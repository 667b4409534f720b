"""The one ensemble forward: clips → blended class probabilities.

Every consumer of the fused clip→probs graph — the batch Transcriber,
the scan streaming engine, the sharded mesh program, and the driver
entry point — builds its function here, so the ensemble recipe (feature
params from the checkpoints, scaler, softmax blend, optional resample)
exists exactly once.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..features import mfcc_feature_vectors, melspec_features
from ..ops.resample import resample, fix_length

__all__ = ["build_clip_ensemble_fn", "build_files_fn"]


def build_clip_ensemble_fn(predictor, scaler, ckpt_sr: int,
                           mfcc_params: dict,
                           melspec_params: dict | None,
                           in_sr: int | None = None,
                           clip_len: int | None = None,
                           pitch_on_normalized: bool = False,
                           return_parts: bool = False):
    """Returns a jit-able fn(clips (N, L)) → probs (N, num_classes)
    (or (blended, mlp_probs, cnn_probs|None) when return_parts).

    clips arrive at `in_sr` (default: already at the checkpoint rate) and
    are re-rated/length-fixed on device when needed. When
    `melspec_params` is None (no CNN loaded) the mel front-end and CNN
    forward are skipped entirely."""
    mean = scaler.mean_ if scaler is not None else None
    scale = scaler.scale_ if scaler is not None else None
    w = predictor.cnn_weight
    use_cnn = melspec_params is not None and predictor.cnn is not None
    mlp_vars = predictor.mlp_variables
    cnn_vars = predictor.cnn_variables if use_cnn else None
    prior_w = getattr(predictor, "pitch_prior_weight", 0.0)
    use_prior = prior_w > 0 and predictor.reverse_map
    if use_prior:
        from .predictor import class_midi_values, apply_pitch_prior
        from ..ops.yin import yin_pitch
        class_midi = class_midi_values(predictor.reverse_map)
        prior_sigma = predictor.pitch_prior_sigma

    def run(clips):
        c = clips
        if in_sr is not None and in_sr != ckpt_sr:
            c = resample(c, in_sr, ckpt_sr)
        if clip_len is not None:
            c = fix_length(c, clip_len)
        mf = mfcc_feature_vectors(
            c, ckpt_sr, n_mfcc=mfcc_params["N_MFCC"],
            normalize_audio_volume=mfcc_params["NORMALIZE_AUDIO_VOLUME"],
            add_pitch_features=mfcc_params["ADD_PITCH_FEATURES"],
            pitch_on_normalized=pitch_on_normalized)
        if mean is not None:
            mf = (mf - mean) / scale
        mlp_probs = jax.nn.softmax(predictor.mlp.apply(mlp_vars, mf),
                                   axis=-1)
        cp = None
        if use_cnn:
            ms = melspec_features(
                c, ckpt_sr, n_mels=melspec_params["N_MELS"],
                n_fft=melspec_params["N_FFT"],
                hop_length=melspec_params["HOP_LENGTH"],
                normalize_audio_volume=melspec_params[
                    "NORMALIZE_AUDIO_VOLUME"],
                # checkpoint-embedded TO_DB wins (source of truth at
                # inference; absent key = legacy checkpoint, dB on)
                to_db=bool(melspec_params.get("TO_DB", True)))
            cp = jax.nn.softmax(predictor.cnn.apply(cnn_vars, ms), axis=-1)
            probs = (1.0 - w) * mlp_probs + w * cp
        else:
            probs = mlp_probs
        if use_prior:
            # the YIN pass here shares its block DFT with the MFCC
            # front-end above via XLA CSE (identical subexpressions)
            hz = yin_pitch(c, ckpt_sr)
            probs = apply_pitch_prior(probs, hz, class_midi,
                                      weight=prior_w, sigma=prior_sigma)
        if return_parts:
            return probs, mlp_probs, cp
        return probs

    return run


def build_files_fn(predictor, scaler, ckpt_sr: int, mfcc_params: dict,
                   melspec_params: dict | None, target_sr: int,
                   clip_duration: float, max_onsets: int,
                   wave_clip_budget: int | None = None,
                   cand_budget: int | None = None):
    """The multi-file fused program body, shared by
    Transcriber._fused_files_fn (plain jit) and the mesh-sharded
    variant (parallel.sharded.make_sharded_transcribe_files):
    fn(ys (B, n), n_valids (B,)) → per-file (B, K, ...) outputs.
    Per-file segmentation runs under vmap (the greedy onset scan
    advances all B lanes per step); the budget slots then run the
    ensemble + YIN baseline as ONE flat (B·K, L) clip batch.

    wave_clip_budget (< B·K): compact the wave's KEPT clips to the
    front (stable row gather) and run only that many slots through
    re-rating + the ensemble + YIN — onset budgets are sized for the
    densest file, so most slots are empty zeros and the ensemble is
    the dominant cost. Results scatter back to their (file, slot)
    positions; if a wave ever keeps more clips than the budget, the
    FIRST `budget` kept slots in slot-major (interleaved) order are
    computed — every file keeps its EARLIEST clips and the wave's
    files degrade together rather than early files starving later
    ones — and the per-file overflow flag is raised (the framework's
    standard budget+mask+flag pattern). None = exact (every slot
    computed).

    cand_budget sizes the onset candidate scan (segment_waveform /
    pick_onsets_from_envelope): content-aware serving can shrink the
    per-wave sequential walk; truncation raises the same per-file
    overflow flag.

    Outputs end with two per-file (B,) bool flags and one (B,) int32:
    `overflow` (ANY budget truncated this file's results), `fixable`
    (an exact re-run — cand_budget=0, wave_clip_budget=None — could
    CHANGE this file's results), and `n_detected` (pre-cap accepted
    onset count; exact whenever the candidate bits are clean). The two
    flags differ exactly on cap-only overflow: when `max_onsets` itself
    truncated (detect_onsets' cap_overflow), a bigger candidate scan
    provably returns the same first max_onsets onsets (see
    pick_onsets_from_envelope), so exact-fallback consumers re-dispatch
    on `fixable`, never paying a re-run that cannot change anything,
    while `overflow` still surfaces the truncation and `n_detected`
    sizes the pow2 cap a cap-auto-scaling re-dispatch needs."""
    from ..segment.slicing import segment_waveform
    from ..ops.yin import yin_pitch

    if wave_clip_budget is not None and wave_clip_budget < 1:
        # a negative budget would pass the `budget < b*k` guard and
        # Python-slice the argsort from the END — silently dropping kept
        # clips; validate like cand_budget does (ops/onset.py)
        raise ValueError(f"wave_clip_budget must be >= 1 (None = every "
                         f"slot computed); got {wave_clip_budget}")

    ensemble = build_clip_ensemble_fn(predictor, scaler, ckpt_sr,
                                      mfcc_params, melspec_params,
                                      return_parts=True)

    def _segment(y, n_valid):
        return segment_waveform(y, sr=target_sr, length_sec=clip_duration,
                                max_onsets=max_onsets,
                                n_valid_samples=n_valid,
                                cand_budget=cand_budget)

    def run(ys, n_valids):
        # exact-zero tail past each file's true length: whole-second
        # padding happens BEFORE the polyphase resampler (host pad,
        # transcribe_files), whose edge continuation leaks nonzero
        # samples into [n_valid, bucket); a clip window crossing EOF
        # must see zeros for bit parity with the unpadded two-stage path
        ys = jnp.where(jnp.arange(ys.shape[-1])[None, :]
                       < n_valids[:, None], ys, 0.0)
        (clips, kept, onsets, ovalid, times, overflow,
         cap_overflow, n_detected) = jax.vmap(_segment)(ys, n_valids)
        # repairable-by-exact-rerun bit: everything but the max_onsets
        # cap (wave-budget drops OR into it below — an exact run
        # computes every slot, so those always repair)
        fixable = overflow & ~cap_overflow
        b, k, length = clips.shape
        flat = clips.reshape(b * k, length)
        budget = wave_clip_budget
        if budget is not None and budget < b * k:
            keptf = kept.reshape(b * k)
            # kept slots first in INTERLEAVED (slot-major) order: all
            # files' slot 0, then slot 1, … — under overflow every file
            # degrades together, keeping its earliest clips, instead of
            # early files starving later ones (fair-budget semantics)
            keptt = kept.T.reshape(b * k)
            ordert = jnp.argsort(~keptt, stable=True)[:budget]
            sel = (ordert % b) * k + (ordert // b)
            comp = fix_length(resample(flat[sel], target_sr, ckpt_sr),
                              int(ckpt_sr * clip_duration))
            probs_c, mlp_c, cnn_c = ensemble(comp)
            pitch_c = yin_pitch(comp, ckpt_sr)

            def scatter(x):
                if x is None:
                    return None
                out = jnp.zeros((b * k,) + x.shape[1:], x.dtype)
                return out.at[sel].set(x)
            probs, mlp_p, cnn_p, pitch = (scatter(probs_c), scatter(mlp_c),
                                          scatter(cnn_c), scatter(pitch_c))
            computed = jnp.zeros((b * k,), bool).at[sel].set(True)
            dropped = jnp.any((keptf & ~computed).reshape(b, k), axis=-1)
            kept = kept & computed.reshape(b, k)
            overflow = overflow | dropped
            fixable = fixable | dropped
        else:
            comp = fix_length(resample(flat, target_sr, ckpt_sr),
                              int(ckpt_sr * clip_duration))
            probs, mlp_p, cnn_p = ensemble(comp)
            pitch = yin_pitch(comp, ckpt_sr)

        def perfile(a):
            return (a.reshape((b, k) + a.shape[1:])
                    if a is not None else None)
        return (perfile(probs), perfile(mlp_p), perfile(cnn_p),
                perfile(pitch), kept, onsets, times, overflow, fixable,
                n_detected)

    return run
