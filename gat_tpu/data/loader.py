"""Dataset discovery and batched audio loading.

Behavioral spec: version_1/source/audio/loading.py. Labels come from
folder names (`<dataset>/<label>/*.wav`); audio is decoded with the
first-party WAV reader, resampled to `target_sr` on device (batched by
source rate so each distinct ratio is one traced program), and
pad/trimmed to a fixed length. Unlike the reference's per-file librosa
loop, decoding is the only host work — resampling and length-fixing run
as device batches.
"""
from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from ..ops.resample import resample, fix_length
from ..utils.wavio import read_wav

__all__ = ["get_available_datasets", "AudioDatasetLoader"]


def get_available_datasets(datasets_root):
    """Two-level walk: datasets_root/<subroot>/<dataset> → names, paths
    (ref loading.py:9-33)."""
    datasets_root = Path(datasets_root)
    if not datasets_root.exists():
        print(f"[get_available_datasets] Dataset directory not found: "
              f"{datasets_root}")
        return [], []
    names, paths = [], []
    for subroot in sorted(datasets_root.iterdir()):
        if not subroot.is_dir() or subroot.name.startswith("."):
            continue
        for ds in sorted(subroot.iterdir()):
            if ds.is_dir() and not ds.name.startswith("."):
                names.append(f"{subroot.name}/{ds.name}")
                paths.append(ds)
    if not names:
        print(f"[get_available_datasets] No datasets found under "
              f"{datasets_root}")
    return names, paths


class AudioDatasetLoader:
    """Loads `<root>/<label-folder>/*.wav` with label = folder name
    (ref loading.py:36-105). Returns float32 arrays at `target_sr`."""

    def __init__(self, dataset_roots, target_sr: int = 11025,
                 mono: bool = True, duration: float | None = None):
        self.dataset_roots = [Path(r) for r in dataset_roots]
        self.target_sr = int(target_sr)
        self.mono = mono
        self.fixed_len = (int(self.target_sr * duration)
                          if duration is not None else None)
        self._load_cache: dict[bool, tuple] = {}
        # per-file SOURCE sample rates, recorded by load_audio_dataset:
        # the returned srs are uniformly target_sr (everything is
        # resampled), so rate-inconsistency reports need the originals
        self.source_srs: list[int] | None = None

    def iter_paths(self):
        for root in self.dataset_roots:
            for folder in sorted(os.listdir(root)):
                folder_path = root / folder
                if not folder_path.is_dir():
                    continue
                for fname in sorted(os.listdir(folder_path)):
                    if fname.endswith(".wav"):
                        yield folder_path / fname, folder

    def load_audio_dataset(self, pad_to_max: bool = True):
        """Returns (wavs, srs, labels, paths): wavs is a list of float32
        arrays (all target_sr); pad_to_max zero-pads to the longest.

        Memoized per instance: the walk + decode + batched resample is
        deterministic for a static dataset dir, and training both models
        on one dataset (train_all / train_synthetic --model all)
        otherwise pays it twice — the decode+resample share of the two
        ~19-26 s load+features stages in the shipped-recipe wall
        breakdown (docs/PERF.md). The returned arrays are marked
        read-only (shared across consumers; an in-place write raises).
        Build a fresh loader to re-read a changed directory —
        TrainingManager does this automatically via a walk signature."""
        if pad_to_max in self._load_cache:
            return self._load_cache[pad_to_max]
        pairs = list(self.iter_paths())
        if not pairs:
            raise FileNotFoundError(
                "load_audio_dataset: No audio files found.")
        labels = [label for _, label in pairs]
        paths = [str(p) for p, _ in pairs]
        if self.mono:
            # native C++ codec + thread pool (GIL released per decode);
            # transparently falls back to the Python decoder
            from ..utils.native_wav import read_wav_batch
            decoded = read_wav_batch([p for p, _ in pairs])
        else:
            # read_wav(mono=False) yields (n, channels); the device ops
            # below (resample/fix_length) act on the LAST axis, and the
            # reference's librosa mono=False convention is
            # channels-first (ref loading.py:36-105) — transpose so
            # time is the operated axis and the returned layout matches
            # the reference
            decoded = [(x.T if x.ndim == 2 else x, sr)
                       for x, sr in (read_wav(p, mono=False)
                                     for p, _ in pairs)]
        raw = [x for x, _ in decoded]
        srs_in = [sr for _, sr in decoded]
        self.source_srs = list(srs_in)

        # group by (source_sr, shape) so each resample is one traced
        # batch (shape, not just length: mono=False files can differ in
        # channel count and would not stack)
        wavs: list[np.ndarray | None] = [None] * len(raw)
        groups: dict[tuple, list[int]] = {}
        for i, (x, sr) in enumerate(zip(raw, srs_in)):
            groups.setdefault((sr,) + tuple(x.shape), []).append(i)
        for (sr, *_shape), idxs in groups.items():
            batch = np.stack([raw[i] for i in idxs])
            out = np.asarray(resample(batch, sr, self.target_sr))
            if self.fixed_len is not None:
                out = np.asarray(fix_length(out, self.fixed_len))
            for j, i in enumerate(idxs):
                wavs[i] = out[j].astype(np.float32)

        if pad_to_max:
            # pad the TIME axis only (mono arrays are 1-D; mono=False
            # arrays are (channels, n))
            max_len = max(int(w.shape[-1]) for w in wavs)
            wavs = [np.pad(w, [(0, 0)] * (w.ndim - 1)
                           + [(0, max_len - int(w.shape[-1]))])
                    for w in wavs]
        for w in wavs:
            # cached arrays are shared across consumers — an in-place
            # write must raise, not silently poison later trainings
            w.setflags(write=False)
        srs = [self.target_sr] * len(wavs)
        self._load_cache[pad_to_max] = (wavs, srs, labels, paths)
        return self._load_cache[pad_to_max]
