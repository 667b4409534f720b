"""Synthetic guitar-note synthesis and dataset generation.

The reference's training data is personal guitar recordings that are not
in the repo, and its CNN checkpoint is a missing git-LFS blob (SURVEY §5.4)
— so this framework must train from data it can make. Two synthesizers:

  * karplus_strong — the classic plucked-string physical model (noise
    burst through a damped delay line), vectorized across variants so a
    whole class batch synthesizes in one pass of numpy ops.
  * additive_pluck — harmonic stack with per-partial decay; fast,
    controllable brightness/inharmonicity, good augmentation diversity.

`synthesize_note_dataset` emits the reference's dataset layout
(`<root>/<pitch-label>/*.wav`, labels = ASCII SPN folder names,
ref loading.py:72-87), with variants over seed, brightness, decay,
amplitude, detune, onset-noise — enough spread to train the CNN/MLP to
the reference's reported accuracy regime on held-out splits.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from ..ops.pitch import midi_to_hz, note_to_midi
from ..utils.wavio import write_wav

__all__ = ["karplus_strong", "additive_pluck", "synthesize_note_dataset",
           "DEFAULT_CLASS_NAMES"]

# the 47 SPN classes of the shipped reference checkpoint (A#2…G5)
DEFAULT_CLASS_NAMES = [
    "A#2", "A#3", "A#4", "A#5", "A2", "A3", "A4", "A5", "B2", "B3", "B4",
    "B5", "C#3", "C#4", "C#5", "C#6", "C3", "C4", "C5", "C6", "D#3", "D#4",
    "D#5", "D3", "D4", "D5", "D6", "E2", "E3", "E4", "E5", "F#2", "F#3",
    "F#4", "F#5", "F2", "F3", "F4", "F5", "G#2", "G#3", "G#4", "G#5", "G2",
    "G3", "G4", "G5",
]


def karplus_strong(freq_hz: float, sr: int, duration: float,
                   n_variants: int = 1, damping: float = 0.996,
                   blend: float = 0.5, seed: int = 0) -> np.ndarray:
    """(n_variants, n) plucked strings at one pitch — the delay-line loop
    runs once over time with all variants as a vector lane."""
    n = int(duration * sr)
    period = max(2, int(round(sr / freq_hz)))
    rng = np.random.default_rng(seed)
    buf = rng.uniform(-1.0, 1.0, (n_variants, period))
    out = np.empty((n_variants, n), dtype=np.float64)
    idx = 0
    for i in range(n):
        out[:, i] = buf[:, idx]
        nxt = (idx + 1) % period
        buf[:, idx] = damping * (blend * buf[:, idx]
                                 + (1.0 - blend) * buf[:, nxt])
        idx = nxt
    peak = np.abs(out).max(axis=1, keepdims=True) + 1e-12
    return (out / peak).astype(np.float32)


def additive_pluck(freq_hz: float, sr: int, duration: float,
                   n_variants: int = 1, n_partials: int = 20,
                   brightness: float = 1.0, decay: float = 3.0,
                   inharmonicity: float = 1e-4, seed: int = 0) -> np.ndarray:
    """(n_variants, n) harmonic plucks: partial k at k·f with amplitude
    ~ brightness^k / k and decay rate growing with k."""
    n = int(duration * sr)
    t = np.arange(n) / sr
    rng = np.random.default_rng(seed)
    nyq = sr / 2.0
    out = np.zeros((n_variants, n))
    for v in range(n_variants):
        sig = np.zeros(n)
        for k in range(1, n_partials + 1):
            fk = freq_hz * k * np.sqrt(1.0 + inharmonicity * k * k)
            if fk >= nyq * 0.99:
                break
            amp = (brightness ** (k - 1)) / k
            amp *= rng.uniform(0.6, 1.4)
            dk = decay * (1.0 + 0.3 * (k - 1))
            phase = rng.uniform(0, 2 * np.pi)
            sig += amp * np.exp(-dk * t) * np.sin(2 * np.pi * fk * t + phase)
        # short attack transient: filtered noise burst
        atk = int(0.01 * sr)
        noise = rng.normal(0, 0.3, atk) * np.linspace(1, 0, atk)
        sig[:atk] += noise
        out[v] = sig
    peak = np.abs(out).max(axis=1, keepdims=True) + 1e-12
    return (out / peak).astype(np.float32)


def synthesize_note_dataset(out_root, class_names=None, sr: int = 22050,
                            duration: float = 0.5,
                            variants_per_class: int = 24,
                            seed: int = 0, verbose: bool = True,
                            noise_snr_db: tuple[float, float] | None = None
                            ) -> Path:
    """Write `<out_root>/<label>/<label>_<i>.wav` for each SPN class.

    Per-variant augmentation: synth engine (KS vs additive), damping/
    brightness/decay draws, amplitude 0.1–0.9, ±10-cent detune, and a low
    noise floor — so scaler/classifier see realistic spread.

    noise_snr_db=(lo, hi): additionally mix white noise into a random
    half of the variants at an SNR drawn uniformly from [lo, hi] dB —
    noise-robustness augmentation for the classifiers."""
    out_root = Path(out_root)
    class_names = class_names or DEFAULT_CLASS_NAMES
    rng = np.random.default_rng(seed)
    for ci, name in enumerate(class_names):
        f0 = float(midi_to_hz(note_to_midi(name)))
        folder = out_root / name
        folder.mkdir(parents=True, exist_ok=True)
        half = variants_per_class // 2
        detune = 2.0 ** (rng.uniform(-10, 10, variants_per_class) / 1200.0)
        ks = karplus_strong(f0, sr, duration, n_variants=half,
                            damping=float(rng.uniform(0.992, 0.999)),
                            blend=float(rng.uniform(0.45, 0.55)),
                            seed=seed * 1000 + ci)
        for i in range(variants_per_class):
            if i < half:
                sig = ks[i]
            else:
                sig = additive_pluck(
                    f0 * detune[i], sr, duration, n_variants=1,
                    brightness=float(rng.uniform(0.55, 0.9)),
                    decay=float(rng.uniform(1.5, 5.0)),
                    seed=seed * 100000 + ci * 100 + i)[0]
            amp = rng.uniform(0.1, 0.9)
            sig = sig * amp + rng.normal(0, 1e-4, len(sig))
            if noise_snr_db is not None and rng.random() < 0.5:
                snr = rng.uniform(*noise_snr_db)
                sig_rms = np.sqrt(np.mean(sig ** 2)) + 1e-12
                noise = rng.normal(0, 1.0, len(sig))
                noise *= sig_rms / (np.sqrt(np.mean(noise ** 2)) + 1e-12)
                sig = sig + noise * 10.0 ** (-snr / 20.0)
            write_wav(folder / f"{name.replace('#', 's')}_{i:03d}.wav",
                      sig.astype(np.float32), sr)
        if verbose and ci % 10 == 0:
            print(f"[synthesize_note_dataset] {ci + 1}/{len(class_names)} "
                  f"classes done")
    if verbose:
        print(f"[synthesize_note_dataset] wrote "
              f"{len(class_names) * variants_per_class} clips to {out_root}")
    return out_root
