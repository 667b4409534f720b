"""Classical baseline classifiers.

The reference's archive kept a third classical model family alongside
MLP/CNN: softmax (multinomial logistic) regression — first from scratch
in NumPy (archive/source prototyping v0/logistic_regression_model.py:
35-212) and then via sklearn (archive/model prototypes v0/logistic
regression/logistic_regression_trainer.py:187-267), selectable in the v0
transcribe CLI (archive transcribe.py:20-108). This module provides that
family as a flax model compatible with the unified Trainer and the
NotePredictor (it is shape-compatible with the MLP interface).
"""
from __future__ import annotations

from flax import linen as nn
import jax.numpy as jnp

__all__ = ["SoftmaxRegression"]


class SoftmaxRegression(nn.Module):
    """Single linear layer → logits; with CE loss this is multinomial
    logistic regression (the archive's third baseline)."""
    num_features: int
    num_classes: int

    @property
    def init_args(self) -> dict:
        return {"num_features": self.num_features,
                "num_classes": self.num_classes}

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        return nn.Dense(self.num_classes, name="out")(x)
