"""Feature builder: batched MFCC-vector and mel-spectrogram front-ends.

Behavioral spec: version_1/source/audio/features.py (MelFeatureBuilder).
The reference extracts features clip-by-clip in Python loops with a YIN
call per clip (SURVEY §3.1 hot loops); here each front-end is ONE jit
graph over the whole clip batch:

  * MFCC path (MLP input): per-clip RMS volume normalization →
    librosa-semantics MFCC (64) → mean-pool over frames → append
    log10(YIN pitch Hz) → optional standard scaling
    (ref features.py:162-218).
  * mel-spec path (CNN input): torchaudio-semantics MelSpectrogram +
    AmplitudeToDB (ref features.py:275-339). Output is NHWC
    (N, n_mels, T, 1) — the TPU-native layout; use `to_reference_layout`
    for the reference's (N, 1, n_mels, T).

Quirk preserved: on the dataset/file path the YIN pitch feature is
computed on the *raw* clip (ref features.py:201), on the single-array
path on the *normalized* clip (ref features.py:473) — YIN's CMND is
amplitude-invariant so both agree, but the flag exists for fidelity.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .config import MFCC_CONFIG, MELSPEC_CONFIG
from .ops import spectral
from .ops.yin import yin_pitch
from .utils.scaler import FeatureScaler

__all__ = ["encode_labels", "normalize_volume", "mfcc_feature_vectors",
           "melspec_features", "to_reference_layout", "FeatureBuilder"]

# sentinel: "caller gave nothing → use config defaults" vs an explicit
# None, which means "skip the mel branch" (MLP-only operation)
_USE_CONFIG = object()

# measured-faster default on v5e (see docs/PERF.md); flip for A/B runs
SHARED_BLOCK_FRONTEND = True


def encode_labels(labels):
    """Sorted-unique string labels → int codes
    (ref features.py:107-112). Returns (encoded, num_classes,
    reverse_map)."""
    classes = sorted(set(labels))
    label_to_idx = {c: i for i, c in enumerate(classes)}
    encoded = np.array([label_to_idx[l] for l in labels], dtype=np.int32)
    reverse_map = {i: c for i, c in enumerate(classes)}
    return encoded, len(classes), reverse_map


_VOLUME_EPS = 1e-9  # shared by normalize_volume and the fused front-end
# (which applies the same 1/(rms+eps) as a spectrum scale, by linearity)


def normalize_volume(y: jax.Array, eps: float = _VOLUME_EPS) -> jax.Array:
    """Per-clip RMS volume normalization (ref features.py:124-126)."""
    rms = jnp.sqrt(jnp.mean(y * y, axis=-1, keepdims=True))
    return y / (rms + eps)


def _fused_mfcc_mean_and_pitch(clips: jax.Array, sr: int, n_mfcc: int,
                               normalize_audio_volume: bool,
                               pitch_on_normalized: bool) -> jax.Array:
    """MFCC-mean + YIN pitch from ONE shared block DFT.

    The MFCC front-end windows+DFTs frames the YIN autocorrelation
    re-DFTs unwindowed (same n_fft 2048 / hop 512 / constant center
    pad), so both derive here from a single hop-block DFT of the RAW
    clips: per-clip volume normalization is a scalar, so each consumer
    scales the shared coefficients (linearity) instead of re-transforming
    a rescaled signal — the pitch-source quirk (raw vs normalized, ref
    features.py:201 vs 473) costs one multiply, not a second DFT."""
    import math
    from .ops.mel import mel_filterbank_librosa
    from .ops.yin import _cmnd_block, _f0_from_cmnd

    n_fft, hop, n_mels = 2048, 512, 128        # spectral.mfcc defaults
    win = n_fft // 2                           # librosa yin defaults
    fmin, fmax, trough = 50.0, 1000.0, 0.1

    clips = jnp.asarray(clips, jnp.float32)
    pad = spectral._pad_center(clips, n_fft // 2, "constant")
    t = 1 + (pad.shape[-1] - n_fft) // hop
    cre, cim = spectral.block_coeffs(pad, n_fft, hop, t)
    rms = jnp.sqrt(jnp.mean(clips * clips, axis=-1, keepdims=True))
    s = 1.0 / (rms + _VOLUME_EPS)

    sm = s if normalize_audio_volume else jnp.ones_like(s)
    are, aim = spectral.combine_blocks(cre, cim, n_fft, hop, t)
    wre, wim = spectral.hann_in_frequency(are * sm[..., None],
                                          aim * sm[..., None])
    spec = wre * wre + wim * wim
    fb = jnp.asarray(mel_filterbank_librosa(sr, n_fft, n_mels))
    mel = jnp.einsum("...tf,mf->...tm", spec, fb,
                     preferred_element_type=jnp.float32)
    s_db = spectral.power_to_db_librosa(mel, spec_axes=2)
    dct = spectral.dct_ii_matrix(n_mels, n_mfcc)
    vec = jnp.mean(jnp.einsum("...tm,mk->...tk", s_db, dct,
                              preferred_element_type=jnp.float32), axis=-2)

    # pitch source matches the non-fused path: the NORMALIZED signal only
    # when both flags ask for it (normalize off ⇒ y IS the raw clip)
    sy = (s if (pitch_on_normalized and normalize_audio_volume)
          else jnp.ones_like(s))
    min_p = max(int(math.floor(sr / fmax)), 1)
    max_p = min(int(math.ceil(sr / fmin)), n_fft - win - 1)
    cmnd = _cmnd_block(pad * sy, n_fft, hop, t, win, min_p, max_p,
                       coeffs=(cre * sy[..., None], cim * sy[..., None]))
    hz = jnp.median(_f0_from_cmnd(cmnd, min_p, trough, sr), axis=-1)
    return jnp.concatenate([vec, jnp.log10(hz)[..., None]], axis=-1)


@functools.partial(jax.jit, static_argnames=(
    "sr", "n_mfcc", "normalize_audio_volume", "add_pitch_features",
    "pitch_on_normalized"))
def mfcc_feature_vectors(clips: jax.Array, sr: int, n_mfcc: int = 64,
                         normalize_audio_volume: bool = True,
                         add_pitch_features: bool = True,
                         pitch_on_normalized: bool = False) -> jax.Array:
    """(N, L) → (N, n_mfcc [+1]): time-pooled MFCC vector with optional
    appended log10-pitch feature. One traced graph for the whole batch.

    On the matmul (TPU) backend with the pitch feature enabled, the MFCC
    and YIN front-ends share one block DFT (_fused_mfcc_mean_and_pitch);
    set gat_tpu.features.SHARED_BLOCK_FRONTEND = False (then
    jax.clear_caches()) to A/B against the separate-pipeline form."""
    if (SHARED_BLOCK_FRONTEND and add_pitch_features
            and spectral.stft_backend() == "matmul"):
        return _fused_mfcc_mean_and_pitch(clips, sr, n_mfcc,
                                          normalize_audio_volume,
                                          pitch_on_normalized)
    y = normalize_volume(clips) if normalize_audio_volume else clips
    m = spectral.mfcc(y, sr, n_mfcc=n_mfcc)    # (N, T, n_mfcc)
    vec = jnp.mean(m, axis=-2)                 # (N, n_mfcc)
    if add_pitch_features:
        pitch_src = y if pitch_on_normalized else clips
        hz = yin_pitch(pitch_src, sr)              # (N,)
        vec = jnp.concatenate([vec, jnp.log10(hz)[..., None]], axis=-1)
    return vec


@functools.partial(jax.jit, static_argnames=(
    "sr", "n_mels", "n_fft", "hop_length", "normalize_audio_volume",
    "to_db"))
def melspec_features(clips: jax.Array, sr: int, n_mels: int = 64,
                     n_fft: int = 2048, hop_length: int = 256,
                     normalize_audio_volume: bool = True,
                     to_db: bool = True) -> jax.Array:
    """(N, L) → (N, n_mels, T, 1) NHWC mel-spectrogram 'images'.

    Deliberately XLA: three hand-fused Pallas front-ends were built and
    measured over rounds 1-2 (windowed-frame, and block-DFT+twiddle-
    combine with the Hann applied in frequency); the best was roofline-
    fast in isolation but made the FULL fused transcription graph ~40%
    slower (7.7 vs 5.4 ms/step at batch 1024 on v5e) — the custom call
    blocks the fusion/overlap XLA builds around this op. See README
    'Pallas decision note'."""
    y = normalize_volume(clips) if normalize_audio_volume else clips
    S = spectral.melspectrogram_torchaudio(y, sr, n_fft=n_fft,
                                           hop_length=hop_length,
                                           n_mels=n_mels, to_db=to_db)
    # (N, T, M) → (N, M, T, 1)
    return jnp.transpose(S, (0, 2, 1))[..., None]


def to_reference_layout(x):
    """NHWC (N, M, T, 1) → the reference's NCHW (N, 1, M, T)
    (ref features.py:331,505)."""
    return jnp.transpose(jnp.asarray(x), (0, 3, 1, 2))


class FeatureBuilder:
    """Dataset- and single-clip-level feature extraction with the
    reference MelFeatureBuilder's surface (ref features.py:17-508)."""

    def __init__(self):
        self.scaler: FeatureScaler | None = None

    # ----- dataset paths -------------------------------------------------
    def extract_mfcc_features(self, audio_loader, n_mfcc: int | None = None,
                              normalize_audio_volume: bool | None = None,
                              add_pitch_features: bool | None = None):
        """Returns (X (N, D) np, y_encoded, num_classes, reverse_map).

        None defaults resolve to MFCC_CONFIG — the same source of truth
        the inference path uses, so a default-trusting caller gets the
        pipeline the shipped checkpoints embed (the old literal
        defaults disagreed with the config on volume normalization)."""
        if n_mfcc is None:
            n_mfcc = MFCC_CONFIG.N_MFCC
        if normalize_audio_volume is None:
            normalize_audio_volume = MFCC_CONFIG.NORMALIZE_AUDIO_VOLUME
        if add_pitch_features is None:
            add_pitch_features = MFCC_CONFIG.ADD_PITCH_FEATURES
        wavs, _, labels, _ = audio_loader.load_audio_dataset(pad_to_max=True)
        clips = jnp.asarray(np.stack(wavs))
        X = np.asarray(mfcc_feature_vectors(
            clips, audio_loader.target_sr, n_mfcc=n_mfcc,
            normalize_audio_volume=normalize_audio_volume,
            add_pitch_features=add_pitch_features))
        y_encoded, num_classes, reverse_map = encode_labels(labels)
        print(f"Extracted MFCC features for {len(X)} samples.")
        return X, y_encoded, num_classes, reverse_map

    def extract_melspec_features(self, audio_loader, n_mels: int | None = None,
                                 n_fft: int | None = None,
                                 hop_length: int | None = None,
                                 normalize_audio_volume: bool | None = None,
                                 to_db: bool | None = None):
        """Returns (X (N, M, T, 1) np NHWC, y_encoded, num_classes,
        reverse_map). None defaults resolve to MELSPEC_CONFIG (see
        extract_mfcc_features)."""
        if n_mels is None:
            n_mels = MELSPEC_CONFIG.N_MELS
        if n_fft is None:
            n_fft = MELSPEC_CONFIG.N_FFT
        if hop_length is None:
            hop_length = MELSPEC_CONFIG.HOP_LENGTH
        if normalize_audio_volume is None:
            normalize_audio_volume = MELSPEC_CONFIG.NORMALIZE_AUDIO_VOLUME
        if to_db is None:
            to_db = MELSPEC_CONFIG.TO_DB
        wavs, _, labels, _ = audio_loader.load_audio_dataset(pad_to_max=True)
        clips = jnp.asarray(np.stack(wavs))
        X = np.asarray(melspec_features(
            clips, audio_loader.target_sr, n_mels=n_mels, n_fft=n_fft,
            hop_length=hop_length,
            normalize_audio_volume=normalize_audio_volume, to_db=to_db))
        y_encoded, num_classes, reverse_map = encode_labels(labels)
        print(f"Extracted Mel-spectrogram features for {X.shape[0]} "
              f"samples. X shape: {tuple(X.shape)}")
        return X, y_encoded, num_classes, reverse_map

    # ----- inference paths ----------------------------------------------
    def extract_inference_features(self, audio_loader, mfcc_params=None,
                                   melspec_params=_USE_CONFIG, scaler=None):
        """Checkpoint-param-driven extraction for a directory of clips
        (ref features.py:130-158). Returns (mfcc (N, D), melspec NHWC).
        melspec_params=None skips the mel branch (MLP-only operation),
        matching the from_clips/from_audio siblings."""
        mfcc_params = mfcc_params or dict(MFCC_CONFIG.__dict__)
        if melspec_params is _USE_CONFIG:
            melspec_params = dict(MELSPEC_CONFIG.__dict__)
        wavs, _, _, _ = audio_loader.load_audio_dataset(pad_to_max=True)
        clips = jnp.asarray(np.stack(wavs))
        return self.extract_inference_features_from_clips(
            clips, audio_loader.target_sr, mfcc_params, melspec_params,
            scaler)

    def extract_inference_features_from_clips(self, clips, sr,
                                              mfcc_params, melspec_params,
                                              scaler=None,
                                              pitch_on_normalized=False):
        """Batched in-memory path — the whole front-end on device.
        melspec_params=None (no CNN loaded) skips the mel branch."""
        mf = mfcc_feature_vectors(
            clips, sr, n_mfcc=mfcc_params["N_MFCC"],
            normalize_audio_volume=mfcc_params["NORMALIZE_AUDIO_VOLUME"],
            add_pitch_features=mfcc_params["ADD_PITCH_FEATURES"],
            pitch_on_normalized=pitch_on_normalized)
        if scaler is not None:
            mf = scaler.transform(mf)
        if melspec_params is None:
            return mf, None
        ms = melspec_features(
            clips, sr, n_mels=melspec_params["N_MELS"],
            n_fft=melspec_params["N_FFT"],
            hop_length=melspec_params["HOP_LENGTH"],
            normalize_audio_volume=melspec_params["NORMALIZE_AUDIO_VOLUME"],
            # checkpoint params are the source of truth at inference
            # (config.py): a CNN trained on linear-power mels
            # (TO_DB=False embedded in its checkpoint) must not be fed
            # dB-scaled inputs; absent key = legacy checkpoint, dB on
            to_db=bool(melspec_params.get("TO_DB", True)))
        return mf, ms

    def extract_inference_features_from_audio(self, audio, target_sr,
                                              mfcc_params=None,
                                              melspec_params=_USE_CONFIG,
                                              scaler=None,
                                              melspec_to_db: bool = True):
        """Single clip (L,) → batch-of-1 features (ref
        features.py:441-508; pitch feature computed on the normalized
        signal on this path). melspec_params=None skips the mel branch
        (MLP-only operation)."""
        mfcc_params = mfcc_params or dict(MFCC_CONFIG.__dict__)
        if melspec_params is _USE_CONFIG:
            melspec_params = dict(MELSPEC_CONFIG.__dict__)
        clips = jnp.asarray(audio, jnp.float32)[None, :]
        mf = mfcc_feature_vectors(
            clips, target_sr, n_mfcc=mfcc_params["N_MFCC"],
            normalize_audio_volume=mfcc_params["NORMALIZE_AUDIO_VOLUME"],
            add_pitch_features=mfcc_params["ADD_PITCH_FEATURES"],
            pitch_on_normalized=True)
        if scaler is not None:
            mf = scaler.transform(mf)
        if melspec_params is None:
            return mf, None
        ms = melspec_features(
            clips, target_sr, n_mels=melspec_params["N_MELS"],
            n_fft=melspec_params["N_FFT"],
            hop_length=melspec_params["HOP_LENGTH"],
            normalize_audio_volume=melspec_params["NORMALIZE_AUDIO_VOLUME"],
            # the checkpoint-embedded TO_DB wins when present (source of
            # truth at inference); melspec_to_db remains the explicit
            # override for param dicts that predate the key
            to_db=bool(melspec_params.get("TO_DB", melspec_to_db)))
        return mf, ms
