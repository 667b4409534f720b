"""Tracing / profiling utilities (SURVEY §5.1).

The reference's observability is ad-hoc wall-clock prints
(ref training_manager.py:101,148, transcribe_live.py:32-269); here stage
timing is a first-class utility plus hooks into jax.profiler for real
device traces viewable in TensorBoard/Perfetto.
"""
from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["StageTimer", "stage", "device_trace", "annotate"]


class StageTimer:
    """Accumulates named stage durations; print() for a summary table."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        """Time a block. `block_on` syncs async device work before the
        timer stops — WITHOUT it, a jit dispatch records dispatch time
        only (the CLAUDE.md timing trap). It is evaluated AT EXIT, and
        arrays created inside the block don't exist at entry, so pass a
        ZERO-ARG CALLABLE returning them:

            with timer.stage("fwd", block_on=lambda: outs):
                outs = model(x)

        A plain array also works, but only syncs work dispatched
        before the block."""
        t0 = time.perf_counter()
        try:
            yield
            # sync on the NON-exception path only: when the block raised
            # before producing its arrays, the recommended
            # `lambda: outs` would NameError inside the cleanup and
            # replace the caller's real exception
            if block_on is not None:
                jax.block_until_ready(block_on() if callable(block_on)
                                      else block_on)
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        lines = [f"{'stage':<28}{'calls':>7}{'total_s':>10}{'mean_ms':>10}"]
        for name, tot in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:<28}{n:>7}{tot:>10.3f}"
                         f"{1000.0 * tot / n:>10.2f}")
        return "\n".join(lines)

    def print(self):
        print(self.summary())


@contextlib.contextmanager
def stage(name: str):
    """One-off stage timer: prints '[stage] name: X.XXs' on exit."""
    t0 = time.perf_counter()
    yield
    print(f"[stage] {name}: {time.perf_counter() - t0:.3f}s")


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/gat_tpu_trace"):
    """jax.profiler device trace around a block (open with TensorBoard or
    ui.perfetto.dev)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """TraceAnnotation context for labeling regions inside a trace."""
    return jax.profiler.TraceAnnotation(name)
