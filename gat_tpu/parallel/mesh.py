"""Device mesh construction and sharding helpers.

The reference is single-process/single-device (SURVEY §2.4); this layer
is where the TPU build earns its throughput: the clip batch shards over a
`data` ICI axis and a `model` axis is exposed for tensor parallelism.
Configs name axes, not device counts (SURVEY §5.8): the same program runs
on 1 chip, a v5e pod slice, or the virtual CPU mesh used in tests.

All collectives are XLA-inserted — code here only annotates shardings
(`NamedSharding`/`PartitionSpec`) and lets the compiler place psum /
all-gather on the interconnect.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import PARALLEL_CONFIG

__all__ = ["make_mesh", "data_sharding", "replicated", "shard_batch",
           "data_sharding_axis", "pad_to_multiple", "P"]

DATA = PARALLEL_CONFIG.DATA_AXIS
MODEL = PARALLEL_CONFIG.MODEL_AXIS


def make_mesh(n_devices: int | None = None, model_parallel: int = 1,
              devices=None) -> Mesh:
    """(data × model) mesh over the first n devices. model_parallel=1
    degenerates to pure data parallelism."""
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    if n % model_parallel:
        raise ValueError(f"[make_mesh] {n} devices not divisible by "
                         f"model_parallel={model_parallel}")
    grid = np.asarray(devices[:n]).reshape(n // model_parallel,
                                           model_parallel)
    return Mesh(grid, (DATA, MODEL))


def data_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Batch axis sharded over `data`, rest replicated."""
    return NamedSharding(mesh, P(DATA, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding_axis(mesh: Mesh, axis: int, ndim: int) -> NamedSharding:
    """Shard `axis` over `data`, rest replicated — for batches whose
    parallel axis is not leading (e.g. the serving path's scanned
    (K, B, n) super-batches shard B, axis 1, while K stays a device-local
    lax.scan)."""
    spec = [None] * ndim
    spec[axis] = DATA
    return NamedSharding(mesh, P(*spec))


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0):
    """Zero-pad so a batch divides the data axis; returns (padded, n_real).
    Static-shape friendly: callers mask with n_real."""
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths), n


def shard_batch(x, mesh: Mesh):
    """Device-put a host batch with the data-parallel layout."""
    x = np.asarray(x)
    return jax.device_put(x, data_sharding(mesh, x.ndim))
