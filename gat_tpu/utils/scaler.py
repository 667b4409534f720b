"""Feature standardization (sklearn StandardScaler semantics).

The reference fits sklearn's StandardScaler on train MFCC vectors and
pickles the fitted object into the checkpoint (ref features.py:250-254,
mlp_trainer.py:476). Here the scaler is two arrays (mean, scale) — JSON/
npz-safe, jit-friendly, and importable from a pickled sklearn scaler.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["FeatureScaler"]


class FeatureScaler:
    """mean/std standardizer: transform(x) = (x - mean) / scale, with
    scale = std (ddof=0) and zero-variance features left unscaled
    (sklearn behavior)."""

    def __init__(self, mean=None, scale=None):
        self.mean_ = None if mean is None else np.asarray(mean, np.float32)
        self.scale_ = None if scale is None else np.asarray(scale, np.float32)

    def fit(self, x) -> "FeatureScaler":
        x = np.asarray(x, np.float64)
        self.mean_ = x.mean(axis=0).astype(np.float32)
        std = x.std(axis=0)
        std[std == 0.0] = 1.0
        self.scale_ = std.astype(np.float32)
        return self

    def transform(self, x):
        if self.mean_ is None:
            raise ValueError("[FeatureScaler] not fitted")
        return (jnp.asarray(x) - self.mean_) / self.scale_

    def fit_transform(self, x):
        return self.fit(x).transform(x)

    def to_dict(self) -> dict:
        return {"mean": self.mean_, "scale": self.scale_}

    @classmethod
    def from_dict(cls, d) -> "FeatureScaler":
        return cls(d["mean"], d["scale"])

    @classmethod
    def from_sklearn(cls, scaler) -> "FeatureScaler":
        return cls(scaler.mean_, scaler.scale_)
