"""Train/val splitting and minibatch iteration.

Replaces the reference's sklearn-split + torch DataLoader plumbing
(ref features.py:221-272, 367-435) with numpy batching feeding jit'd
device steps. The stratified split keeps sklearn's train_test_split with
random_state=42 so splits are reproducible against the reference recipe.
"""
from __future__ import annotations

import numpy as np

from ..utils.scaler import FeatureScaler

__all__ = ["ArrayDataLoader", "stratified_split", "build_mfcc_train_val",
           "build_melspec_dataloader", "build_melspec_train_val"]


class ArrayDataLoader:
    """Minibatch iterator over (X, y) numpy arrays; reshuffles each epoch
    when `shuffle` (torch DataLoader's role, ref features.py:263-270)."""

    def __init__(self, X, y, batch_size: int = 32, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = False):
        self.X = np.asarray(X)
        self.y = np.asarray(y)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.X) // self.batch_size
        if not self.drop_last and len(self.X) % self.batch_size:
            n += 1
        return n

    def __iter__(self):
        idx = np.arange(len(self.X))
        if self.shuffle:
            self._rng.shuffle(idx)
        end = (len(idx) - len(idx) % self.batch_size if self.drop_last
               else len(idx))
        for i in range(0, end, self.batch_size):
            j = idx[i:i + self.batch_size]
            yield self.X[j], self.y[j]


def stratified_split(X, y, val_size: float = 0.2, seed: int = 42):
    """Stratified 80/20 (ref features.py:243-248)."""
    from sklearn.model_selection import train_test_split
    return train_test_split(X, y, test_size=val_size, stratify=y,
                            random_state=seed)


def build_mfcc_train_val(feature_builder, audio_loader, n_mfcc: int = 64,
                         batch_size: int = 32, val_size: float = 0.2,
                         normalize_audio_volume: bool = True,
                         standard_scaler: bool = True, seed: int = 42,
                         drop_last: bool = False):
    """MFCC train/val loaders for the MLP (ref features.py:221-272).
    Returns (dl_tr, dl_val, X, y, num_classes, reverse_map, scaler)."""
    X, y, num_classes, reverse_map = feature_builder.extract_mfcc_features(
        audio_loader, n_mfcc, normalize_audio_volume)
    X_tr, X_val, y_tr, y_val = stratified_split(X, y, val_size, seed)
    scaler = None
    if standard_scaler:
        scaler = FeatureScaler().fit(X_tr)
        X_tr = np.asarray(scaler.transform(X_tr))
        X_val = np.asarray(scaler.transform(X_val))
        feature_builder.scaler = scaler
    dl_tr = ArrayDataLoader(X_tr, y_tr, batch_size, shuffle=True, seed=seed,
                            drop_last=drop_last)
    dl_val = ArrayDataLoader(X_val, y_val, batch_size, shuffle=False)
    return dl_tr, dl_val, X, y, num_classes, reverse_map, scaler


def build_melspec_dataloader(feature_builder, audio_loader,
                             n_mels: int = 64, n_fft: int = 2048,
                             hop_length: int = 256, batch_size: int = 32,
                             shuffle: bool = True,
                             normalize_audio_volume: bool = False):
    """Single mel-spec loader without a split (ref features.py:343-365).
    Returns (dataloader, num_classes, reverse_map)."""
    X, y, num_classes, reverse_map = \
        feature_builder.extract_melspec_features(
            audio_loader, n_mels, n_fft, hop_length, normalize_audio_volume)
    dl = ArrayDataLoader(X, y, batch_size, shuffle=shuffle)
    return dl, num_classes, reverse_map


def build_melspec_train_val(feature_builder, audio_loader, n_mels: int = 64,
                            n_fft: int = 2048, hop_length: int = 256,
                            batch_size: int = 32, val_size: float = 0.2,
                            normalize_audio_volume: bool = True,
                            seed: int = 42, drop_last: bool = False):
    """Mel-spec train/val loaders for the CNN (ref features.py:367-435;
    no scaler by design). Returns (dl_tr, dl_val, X, y, num_classes,
    reverse_map)."""
    X, y, num_classes, reverse_map = \
        feature_builder.extract_melspec_features(
            audio_loader, n_mels, n_fft, hop_length, normalize_audio_volume)
    idx = np.arange(len(y))
    idx_tr, idx_val, y_tr, y_val = stratified_split(idx, y, val_size, seed)
    dl_tr = ArrayDataLoader(X[idx_tr], y_tr, batch_size, shuffle=True,
                            seed=seed, drop_last=drop_last)
    dl_val = ArrayDataLoader(X[idx_val], y_val, batch_size, shuffle=False)
    return dl_tr, dl_val, X, y, num_classes, reverse_map
