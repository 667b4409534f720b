"""JAX environment helpers for the user-facing entry points.

On real TPU backends every new jit signature pays a full XLA compile
(minutes for the fused transcription graphs), so the CLI / serving
entry points enable JAX's persistent compilation cache before first
device use. Library code never touches global jax config — only the
executables call this (cli.py, tools/serve.py), mirroring how the
reference leaves device setup to its scripts (version_1/source/
transcribe_cli.py keeps torch defaults).
"""
from __future__ import annotations

import os
from pathlib import Path

__all__ = ["enable_compilation_cache"]


def enable_compilation_cache(cache_dir: str | os.PathLike | None = None,
                             include_cpu: bool = False) -> str | None:
    """Point JAX's persistent compilation cache at a writable directory.

    Resolution order: explicit arg > $GAT_TPU_JAX_CACHE > an already-
    configured jax cache dir (left untouched) > ~/.cache/gat_tpu/jax.
    Returns the directory in effect, or None if the cache could not be
    enabled (read-only home, ancient jax) — entry points treat that as
    a soft failure because the cache is an optimization, not a
    dependency.

    CPU backends are skipped unless `include_cpu`: CPU compiles are
    fast, and XLA:CPU AOT cache entries pin exact host machine features
    — reloading them warns about possible SIGILL on any feature drift.
    The cache is for accelerator backends, where a fused-graph compile
    costs minutes.
    """
    import jax

    if not include_cpu:
        # jax.config is authoritative; the JAX_PLATFORMS env var is NOT
        # consulted — site hooks can pin the backend regardless of it
        # (this repo's dev machine does), and default_backend() reflects
        # whatever actually won. Entry points initialize the backend
        # moments later anyway, so asking for it here costs nothing.
        platforms = jax.config.jax_platforms
        if platforms == "cpu" or \
                (not platforms and jax.default_backend() == "cpu"):
            return None

    if cache_dir is None:
        cache_dir = os.environ.get("GAT_TPU_JAX_CACHE")
    if cache_dir is None:
        current = getattr(jax.config, "jax_compilation_cache_dir", None)
        if current:
            return current
        cache_dir = Path.home() / ".cache" / "gat_tpu" / "jax"
    try:
        cache_dir = Path(cache_dir)
        cache_dir.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        # compile times on the TPU tunnel dwarf any cache-miss cost, so
        # cache every program, not just the >1 s ones
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        return str(cache_dir)
    except Exception:
        return None
