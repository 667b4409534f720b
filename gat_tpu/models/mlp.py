"""MFCC-vector MLP classifier.

Topology matches the reference MLP (version_1/source/training/
mlp_trainer.py:32-106) so its shipped checkpoint weights can be imported
for parity testing:

    Dense(num_features → dims[0]) → LayerNorm → LeakyReLU(0.1) → Dropout
    [halving hidden blocks: dims[i] → dims[i+1], stop when next < 8]
    Dense(dims[-1] → num_classes)

with dims = [hidden_dim, hidden_dim//2, ...] bounded by num_hidden_layers.
LayerNorm uses eps=1e-5 (torch default) for numerical parity.
"""
from __future__ import annotations

from flax import linen as nn
import jax.numpy as jnp


def mlp_dims(hidden_dim: int, num_hidden_layers: int) -> list[int]:
    """Hidden-width schedule: halve until < 8 or layer budget exhausted."""
    dims = [hidden_dim]
    for _ in range(num_hidden_layers - 1):
        nxt = dims[-1] // 2
        if nxt < 8:
            break
        dims.append(nxt)
    return dims


class MLP(nn.Module):
    num_features: int
    hidden_dim: int = 128
    num_hidden_layers: int = 2
    num_classes: int = 47
    dropout: float = 0.1

    @property
    def init_args(self) -> dict:
        return {
            "num_features": self.num_features,
            "hidden_dim": self.hidden_dim,
            "num_hidden_layers": self.num_hidden_layers,
            "num_classes": self.num_classes,
            "dropout": self.dropout,
        }

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        for i, width in enumerate(mlp_dims(self.hidden_dim,
                                           self.num_hidden_layers)):
            x = nn.Dense(width, name=f"dense_{i}")(x)
            x = nn.LayerNorm(epsilon=1e-5, name=f"ln_{i}")(x)
            x = jnp.maximum(x, 0.1 * x)  # leaky_relu w/o the pred-mask select
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.num_classes, name="out")(x)
