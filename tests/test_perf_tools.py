"""Bitrot guards for the §5.1 perf tooling (SURVEY §5.1).

`tools/profile_trace.py` and `tools/roofline_files.py` are TPU-day
tools the rounds' perf records depend on; these tests pin their pure
logic (trace aggregation, report schema, bound verdict) so refactors
of the library can't silently break the instruments that measure it.
"""
import gzip
import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _write_trace(dirpath: Path, events) -> Path:
    p = dirpath / "host.trace.json.gz"
    with gzip.open(p, "wt") as fh:
        json.dump({"traceEvents": events}, fh)
    return p


def test_parse_trace_filters_host_lanes_and_sums_durations(tmp_path, capsys):
    from tools.profile_trace import parse_trace

    events = [
        # device lane metadata (matched by "tpu"/"device"/"xla" in name)
        {"ph": "M", "name": "process_name", "pid": 7,
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "name": "process_name", "pid": 9,
         "args": {"name": "python host threads"}},
        # device ops: same op split across two events must sum; per-op
        # metadata feeds the achieved-rate annotation + category rollup
        {"ph": "X", "pid": 7, "name": "fusion.1", "dur": 10.0,
         "args": {"hlo_category": "loop fusion", "model_flops": "2000",
                  "bytes_accessed": "1000"}},
        {"ph": "X", "pid": 7, "name": "fusion.1", "dur": 5.0,
         "args": {"hlo_category": "loop fusion", "model_flops": "1000",
                  "bytes_accessed": "500"}},
        {"ph": "X", "pid": 7, "name": "gemm.2", "dur": 25.0,
         "args": {"hlo_category": "convolution fusion"}},
        # wrappers: the jit envelope and the while scan contain the
        # leaves above — both must be EXCLUDED from the rollup partition
        {"ph": "X", "pid": 7, "name": "while.85", "dur": 100.0,
         "args": {"hlo_category": "while"}},
        {"ph": "X", "pid": 7, "name": "jit_step(123)", "dur": 101.0},
        # host lane op: must be excluded from the table
        {"ph": "X", "pid": 9, "name": "PyEval", "dur": 9999.0},
    ]
    _write_trace(tmp_path, events)
    tables = parse_trace(str(tmp_path), top=10)
    assert len(tables) == 1
    rows = dict(tables[0][1])
    assert rows == {"jit_step(123)": 101.0, "while.85": 100.0,
                    "gemm.2": 25.0, "fusion.1": 15.0}
    out = capsys.readouterr().out
    assert "device lanes" in out and "PyEval" not in out
    # rollup: leaves only (40 us), wrappers reported as envelope
    assert "by hlo_category (leaf ops, 0.0 ms; program envelope 0.1 ms)" \
        in out
    assert "62.5%  convolution fusion" in out
    assert "37.5%  loop fusion" in out
    assert "while" not in out.split("by hlo_category")[1]
    # achieved rate annotation: 3000 flops / 15 us = 0.20 TF/s... scaled
    assert "TF/s" in out and "GB/s" in out


def test_parse_trace_without_device_metadata_keeps_all_lanes(tmp_path):
    from tools.profile_trace import parse_trace

    _write_trace(tmp_path, [
        {"ph": "X", "pid": 1, "name": "opA", "dur": 3.0},
        {"ph": "X", "pid": 2, "name": "opB", "dur": 4.0},
    ])
    tables = parse_trace(str(tmp_path), top=10)
    rows = dict(tables[0][1])
    # no device pid found -> fall back to all lanes rather than empty
    assert rows == {"opB": 4.0, "opA": 3.0}


@pytest.mark.slow
def test_roofline_report_schema_and_verdict_cpu(tmp_path):
    """Run the roofline tool end-to-end on CPU at tiny shapes and pin
    the report contract consumers rely on (bench fields + PERF.md
    tables are derived from these keys)."""
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "roofline_files.py"),
         "--platform", "cpu", "--files", "2", "--seconds", "4",
         "--onsets", "16", "--budget", "32", "--cand", "64",
         "--clip_batch", "8", "--measured_wave_ms", "5.0"],
        capture_output=True, text=True, timeout=600, cwd=str(REPO))
    assert out.returncode == 0, out.stderr[-2000:]
    # stdout is the JSON report (loader chatter goes to stdout too, so
    # parse from the first '{')
    report = json.loads(out.stdout[out.stdout.index("{"):])

    prog = report["program"]
    assert (prog["files"], prog["seconds"]) == (2, 4.0)
    wave = report["wave"]
    for key in ("xla_flops", "xla_bytes_accessed", "t_flops_ms_floor",
                "t_counted_traffic_ms_ub",
                "arithmetic_intensity_flop_per_byte"):
        assert key in wave, key
    assert wave["xla_flops"] > 0

    measured = report["measured"]
    assert measured["wave_ms"] == 5.0
    assert measured["audio_s_per_s"] == pytest.approx(8 / 5e-3, rel=1e-6)
    assert measured["verdict"].startswith(
        ("not HBM-bandwidth-bound", "memory-bound", "compute-bound"))
    # mfu and bw_util must be consistent with the wave-level bounds
    # (report values are rounded to 3 decimals)
    assert measured["mfu"] == pytest.approx(
        wave["t_flops_ms_floor"] / 5.0, abs=5.1e-4)
    assert measured["bw_util_vs_xla_traffic"] == pytest.approx(
        wave["t_counted_traffic_ms_ub"] / 5.0, abs=5.1e-4)

    clip = report["clip_step"]
    assert clip["batch"] == 8 and clip["xla_flops"] > 0
    # stage table exists (estimated_cycles is TPU-only metadata; on CPU
    # the keys must still be present, all-zero)
    assert "stage_estimated_ms" in report and "stage_share" in report


def test_stage_timer_block_on_callable_and_exception_safe():
    """block_on may be a zero-arg callable producing the block's own
    outputs, and a block that RAISES must propagate its real exception
    (not a NameError from the cleanup lambda) — round-5 follow-up."""
    import jax.numpy as jnp
    import pytest
    from gat_tpu.utils.profiling import StageTimer

    timer = StageTimer()
    with timer.stage("ok", block_on=lambda: outs):
        outs = jnp.ones(4) * 2
    assert timer.counts["ok"] == 1

    with pytest.raises(RuntimeError, match="boom"):
        with timer.stage("bad", block_on=lambda: missing):  # noqa: F821
            raise RuntimeError("boom")
    assert timer.counts["bad"] == 1  # still recorded
