"""Mel-spectrogram CNN classifier.

Topology matches the reference CNN (version_1/source/training/
cnn_trainer.py:30-139):

    num_blocks × [Conv(k, same-pad) → BatchNorm → LeakyReLU(0.01)
                  → MaxPool(2) → Dropout], channels 1→32→64→128
    → AdaptiveAvgPool(4, 4)
    → Flatten (torch NCHW order, so torch weights remain importable)
    → Dense(hidden_dim) → LeakyReLU(0.01) → Dropout → Dense(num_classes)

TPU-native choices: NHWC layout (flax Conv native; channels ride the
128-lane axis), adaptive pooling expressed as two small averaging matmuls
built at trace time (no data-dependent shapes), optional bfloat16 compute
via `dtype` for MXU throughput (the reference's CUDA-AMP analog,
ref cnn_trainer.py:321-322).
"""
from __future__ import annotations

import numpy as np
from flax import linen as nn
import jax.numpy as jnp


def _adaptive_pool_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_in, n_out) averaging weights reproducing torch
    AdaptiveAvgPool bins: bin i spans [floor(i·n/o), ceil((i+1)·n/o))."""
    w = np.zeros((n_in, n_out), dtype=np.float32)
    for i in range(n_out):
        lo = (i * n_in) // n_out
        hi = -(-((i + 1) * n_in) // n_out)  # ceil
        w[lo:hi, i] = 1.0 / (hi - lo)
    return w


def adaptive_avg_pool_2d(x: jnp.ndarray, out_hw: tuple[int, int]):
    """NHWC adaptive average pooling via two matmuls (static shapes)."""
    h, w = x.shape[1], x.shape[2]
    ph = jnp.asarray(_adaptive_pool_matrix(h, out_hw[0]))
    pw = jnp.asarray(_adaptive_pool_matrix(w, out_hw[1]))
    x = jnp.einsum("nhwc,hp->npwc", x, ph)
    return jnp.einsum("npwc,wq->npqc", x, pw)


class CNN(nn.Module):
    num_classes: int = 47
    in_channels: int = 1
    base_channels: int = 32
    num_blocks: int = 3
    hidden_dim: int = 256
    dropout: float = 0.1
    kernel_size: int = 3
    use_batchnorm: bool = True
    use_maxpool: bool = True
    adaptive_pool: tuple[int, int] = (4, 4)
    dtype: jnp.dtype = jnp.float32  # set bfloat16 for MXU-rate training

    @property
    def init_args(self) -> dict:
        return {
            "num_classes": self.num_classes,
            "in_channels": self.in_channels,
            "base_channels": self.base_channels,
            "num_blocks": self.num_blocks,
            "hidden_dim": self.hidden_dim,
            "dropout": self.dropout,
            "kernel_size": self.kernel_size,
            "use_batchnorm": self.use_batchnorm,
            "use_maxpool": self.use_maxpool,
            "adaptive_pool": tuple(self.adaptive_pool),
        }

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        """x: (N, H=n_mels, W=T, C=in_channels) NHWC → (N, num_classes)."""
        x = x.astype(self.dtype)
        k = self.kernel_size
        pad = k // 2
        for b in range(self.num_blocks):
            out_ch = self.base_channels * (2 ** b)
            x = nn.Conv(out_ch, (k, k), padding=[(pad, pad), (pad, pad)],
                        dtype=self.dtype, name=f"conv_{b}")(x)
            if self.use_batchnorm:
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 dtype=self.dtype, name=f"bn_{b}")(x)
            x = jnp.maximum(x, 0.01 * x)  # leaky_relu w/o the pred-mask select
            if self.use_maxpool:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)

        x = adaptive_avg_pool_2d(x, self.adaptive_pool)  # (N, 4, 4, C)
        # flatten in torch NCHW order so reference Linear weights map 1:1
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)

        if self.hidden_dim is not None and self.hidden_dim > 0:
            x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc")(x)
            x = jnp.maximum(x, 0.01 * x)  # leaky_relu w/o the pred-mask select
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          name="out")(x)
        return logits.astype(jnp.float32)
