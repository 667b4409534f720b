"""Windowed reductions and rank/moving filters as batched XLA ops.

Replaces the scipy.ndimage / librosa.feature filters the reference uses in
its gating and peak-picking paths (ref: version_1/source/audio/slicing.py:
44-56 RMS + median smoothing; librosa.util.peak_pick's moving max/avg).
Boundary modes match the upstream calls:

  * rms_frames       — librosa.feature.rms (center, reflect pad)
  * median_filter1d  — scipy.ndimage.median_filter(mode='reflect')
  * maximum_filter1d — scipy.ndimage.maximum_filter1d(mode='constant')
  * uniform_filter1d — scipy.ndimage.uniform_filter1d(mode='nearest')
  * masked_percentile — np.percentile(linear) over a masked prefix, for
    static-shape pipelines where the tail is padding
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .spectral import frame

__all__ = ["rms_frames", "median_filter1d", "maximum_filter1d",
           "uniform_filter1d", "masked_percentile"]


def rms_frames(y: jax.Array, frame_length: int = 2048, hop_length: int = 512,
               center: bool = True, pad_mode: str = "reflect") -> jax.Array:
    """Frame-wise root-mean-square energy, (..., n) → (..., n_frames)."""
    if center:
        widths = [(0, 0)] * (y.ndim - 1) + [(frame_length // 2,) * 2]
        y = jnp.pad(y, widths, mode=pad_mode) if pad_mode != "constant" \
            else jnp.pad(y, widths)
    f = frame(y, frame_length, hop_length)
    return jnp.sqrt(jnp.mean(f * f, axis=-1))


def _window_view(x: jax.Array, size: int, left: int, right: int,
                 mode: str, cval: float = 0.0) -> jax.Array:
    """Pad the last axis by (left, right) and return size-windows at every
    original position: (..., n) → (..., n, size)."""
    widths = [(0, 0)] * (x.ndim - 1) + [(left, right)]
    if mode == "constant":
        xp = jnp.pad(x, widths, constant_values=cval)
    elif mode == "nearest":
        xp = jnp.pad(x, widths, mode="edge")
    elif mode == "reflect":  # scipy 'reflect' == numpy 'symmetric'
        xp = jnp.pad(x, widths, mode="symmetric")
    else:
        raise ValueError(mode)
    return frame(xp, size, 1)


def median_filter1d(x: jax.Array, size: int = 5) -> jax.Array:
    """scipy.ndimage.median_filter default semantics (mode='reflect').
    Even sizes pick the upper-middle order statistic like scipy's rank
    filter — NOT the two-middle average jnp.median would take."""
    left = size // 2
    w = _window_view(x, size, left, size - 1 - left, "reflect")
    return jnp.sort(w, axis=-1)[..., size // 2]


def maximum_filter1d(x: jax.Array, size: int, origin: int = 0,
                     mode: str = "constant", cval: float = 0.0) -> jax.Array:
    """scipy.ndimage.maximum_filter1d: window for output i spans
    input[i - size//2 - origin : i - size//2 - origin + size]."""
    left = size // 2 + origin
    right = size - 1 - left
    return jnp.max(_window_view(x, size, left, right, mode, cval), axis=-1)


def uniform_filter1d(x: jax.Array, size: int, origin: int = 0,
                     mode: str = "nearest") -> jax.Array:
    """scipy.ndimage.uniform_filter1d (moving average)."""
    left = size // 2 + origin
    right = size - 1 - left
    return jnp.mean(_window_view(x, size, left, right, mode), axis=-1)


def masked_percentile(x: jax.Array, q: float, mask: jax.Array) -> jax.Array:
    """np.percentile(x[mask], q) with linear interpolation, computed under
    jit with a traced valid-count (static shapes: invalid entries sort to
    +inf). x, mask: (..., n) → (...,). An all-False mask yields NaN (the
    traced analog of np.percentile's empty-input error — a loud sentinel
    rather than a plausible-looking finite number)."""
    big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)
    xs = jnp.sort(jnp.where(mask, x, big), axis=-1)
    count = jnp.sum(mask, axis=-1)
    pos = (q / 100.0) * (count.astype(x.dtype) - 1.0)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, x.shape[-1] - 1)
    hi = jnp.clip(lo + 1, 0, x.shape[-1] - 1)
    frac = pos - lo.astype(x.dtype)
    xlo = jnp.take_along_axis(xs, lo[..., None], axis=-1)[..., 0]
    xhi = jnp.take_along_axis(xs, hi[..., None], axis=-1)[..., 0]
    xhi = jnp.where(hi >= count, xlo, xhi)  # don't interpolate into padding
    out = xlo + frac * (xhi - xlo)
    return jnp.where(count > 0, out, jnp.asarray(jnp.nan, x.dtype))
