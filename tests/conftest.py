"""Test environment: force CPU with a virtual 8-device mesh so sharded code
paths run without TPU hardware (SURVEY §4: single-host multi-device tests via
degenerate mesh configs)."""
import os

# The environment's site hook exports JAX_PLATFORMS=axon (tunneled TPU);
# override unconditionally — tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

# Persistent XLA compilation cache: the suite is COMPILE-bound on this
# 1-CPU host (the 40 slowest tests are dominated by first-call jit of
# the big fused programs), so warm runs skip straight to execution —
# measured: `pytest -m "not slow"` drops from ~12 min cold to well
# under 3 min warm (README testing section). Keyed by HLO + compiler
# flags, so source changes that alter a traced graph miss the cache
# naturally; `rm -rf .jax_cache_tests` forces cold compiles.
jax.config.update("jax_compilation_cache_dir",
                  str(REPO_ROOT / ".jax_cache_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def make_sine(freq_hz: float, sr: int, duration: float, amp: float = 0.5,
              phase: float = 0.0) -> np.ndarray:
    t = np.arange(int(duration * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq_hz * t + phase)).astype(np.float32)


def make_pluck(freq_hz: float, sr: int, duration: float, amp: float = 0.5,
               seed: int = 0) -> np.ndarray:
    """Karplus-Strong plucked string — a realistic guitar-like test note."""
    n = int(duration * sr)
    period = max(2, int(round(sr / freq_hz)))
    rng_ = np.random.default_rng(seed)
    buf = rng_.uniform(-1.0, 1.0, period).astype(np.float64)
    out = np.empty(n)
    idx = 0
    for i in range(n):
        out[i] = buf[idx]
        nxt = (idx + 1) % period
        buf[idx] = 0.996 * 0.5 * (buf[idx] + buf[nxt])
        idx = nxt
    out *= amp / (np.max(np.abs(out)) + 1e-12)
    return out.astype(np.float32)
