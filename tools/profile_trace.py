#!/usr/bin/env python
"""Device-op profiling: trace the fused transcription graph and print the
top XLA ops by total device time (SURVEY §5.1 — first-class tracing).

Runs jax.profiler around N iterations of the flagship graph, then parses
the Chrome-trace output directly (no TensorBoard needed) and prints a
per-op duration table.

Usage: python tools/profile_trace.py [--batch 1024] [--iters 5]
       [--trace_dir /tmp/gat_trace] [--top 25]
"""
import argparse
import collections
import glob
import gzip
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def parse_trace(trace_dir: str, top: int = 25):
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    tables = []
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        events = data.get("traceEvents", [])
        # keep only device lanes: host Python/launch events would
        # otherwise dominate and misattribute the time
        device_pids = {e.get("pid") for e in events
                       if e.get("ph") == "M"
                       and e.get("name") == "process_name"
                       and any(k in str(e.get("args", {}).get("name", ""))
                               .lower() for k in ("tpu", "device", "xla"))}
        dur = collections.Counter()
        # per-op metadata the TPU runtime attaches to each X event:
        # hlo_category (fusion kind), model_flops, bytes_accessed —
        # summed alongside dur so top ops can print achieved FLOP/s and
        # apparent BW, and the per-category rollup below is possible.
        cat = {}
        flops = collections.Counter()
        bytes_ = collections.Counter()
        for e in events:
            if e.get("ph") == "X" and "dur" in e and (
                    not device_pids or e.get("pid") in device_pids):
                name = e.get("name", "?")
                dur[name] += e["dur"]
                args = e.get("args", {}) or {}
                if name not in cat and "hlo_category" in args:
                    cat[name] = args["hlo_category"]
                try:
                    flops[name] += float(args.get("model_flops", 0))
                    bytes_[name] += float(args.get("bytes_accessed", 0))
                except (TypeError, ValueError):
                    pass
        rows = dur.most_common(top)
        tables.append((f, rows))
        scope = "device lanes" if device_pids else "all lanes (no device pid found)"
        print(f"--- {Path(f).name}: top {top} by total us ({scope}) ---")
        for name, us in rows:
            extra = ""
            if us > 0 and (flops[name] or bytes_[name]):
                parts = []
                if flops[name]:
                    parts.append(f"{flops[name] / us / 1e6:7.2f} TF/s")
                if bytes_[name]:
                    parts.append(f"{bytes_[name] / us / 1e3:7.1f} GB/s")
                extra = "  [" + " ".join(parts) + f" {cat.get(name, '')}]"
            print(f"{us:>12.1f} us  {name[:60]}{extra}")
        # rollup by hlo_category: where the device time goes by op KIND
        # (readable even though XLA's fusion numbers are opaque).
        # Wrapper events NEST — the jit_* envelope contains the while
        # scan which contains every leaf op — so wrappers are excluded
        # from the partition (they'd double-count all their children);
        # shares are of the leaf total, which ≈ the program wall.
        if cat:
            by_cat = collections.Counter()
            wrap_us = 0.0
            for name, us in dur.items():
                c = cat.get(name)
                if c is None and (name.startswith("jit_")
                                  or name.startswith("jit(")):
                    wrap_us = max(wrap_us, us)
                    continue
                if c == "while":
                    continue  # scan wrapper: contains its body's leaves
                by_cat[c or "(uncategorized)"] += us
            total = sum(by_cat.values()) or 1
            print(f"--- by hlo_category (leaf ops, {total / 1e3:.1f} ms; "
                  f"program envelope {wrap_us / 1e3:.1f} ms) ---")
            for c, us in by_cat.most_common():
                print(f"{us:>12.1f} us  {us / total:6.1%}  {c}")
    return tables


def _trace_inputs(graph: str, batch: int, file_s: float, n_files: int,
                  budget: int | None = None, scan: int = 1,
                  max_onsets: int = 128, cand: int | None = None):
    """(jit fn, list of distinct device-resident input tuples) for the
    chosen graph. Inputs MUST be distinct per iteration: repeat
    executions on the same buffers are elided by a layer of the
    tunneled-TPU stack and vanish from the trace (CLAUDE.md)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(0)

    if graph == "clip":
        from __graft_entry__ import entry
        fn, (ex,) = entry(batch=batch)
        pool = [(jax.device_put(
            rng.normal(0, 0.1, (batch, ex.shape[1])).astype(np.float32)),)
            for _ in range(4)]
        return jax.jit(fn), pool

    from gat_tpu.config import TARGET_SR, CLIP_DURATION
    from gat_tpu.infer import Transcriber
    t = Transcriber()
    n = int(file_s * TARGET_SR)
    if graph == "file":
        run = t._fused_file_fn(TARGET_SR, CLIP_DURATION, 128)
        nv = jax.device_put(jnp.asarray(n))
        pool = [(jax.device_put(
            rng.normal(0, 0.05, n).astype(np.float32)), nv)
            for _ in range(4)]
        return run, pool
    if graph == "files":
        run, run_scan = t._fused_files_fn(TARGET_SR, CLIP_DURATION,
                                          max_onsets,
                                          wave_clip_budget=budget,
                                          cand_budget=cand)
        if scan > 1:  # trace the shipped K-scan super-batch program
            nv = jax.device_put(
                jnp.full((scan, n_files), n, jnp.int32))
            pool = [(jax.device_put(rng.normal(
                0, 0.05, (scan, n_files, n)).astype(np.float32)), nv)
                for _ in range(4)]
            return run_scan, pool
        nv = jax.device_put(jnp.full((n_files,), n, jnp.int32))
        pool = [(jax.device_put(
            rng.normal(0, 0.05, (n_files, n)).astype(np.float32)), nv)
            for _ in range(4)]
        return run, pool
    raise SystemExit(f"unknown --graph {graph!r}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", choices=("clip", "file", "files"),
                    default="clip",
                    help="which fused program to trace: the flagship "
                         "clip batch, the single-file path, or the "
                         "batched multi-file path")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--file_s", type=float, default=60.0)
    ap.add_argument("--n_files", type=int, default=8)
    ap.add_argument("--budget", type=int, default=None,
                    help="wave_clip_budget for --graph files (the "
                         "serving default is tuned in bench.py)")
    ap.add_argument("--onsets", type=int, default=128,
                    help="max_onsets for --graph files (shipped serving\n                         config: 112)")
    ap.add_argument("--cand", type=int, default=None,
                    help="cand_budget for --graph files (shipped: 448)")
    ap.add_argument("--scan", type=int, default=1,
                    help="K file-batches per dispatch for --graph files "
                         "(traces the scanned super-batch program)")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--trace_dir", default="/tmp/gat_trace")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--parse_only", action="store_true",
                    help="only parse an existing trace dir")
    args = ap.parse_args()

    if not args.parse_only:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          str(REPO / ".jax_cache"))
        jfn, pool = _trace_inputs(args.graph, args.batch, args.file_s,
                                  args.n_files, args.budget, args.scan,
                                  args.onsets, args.cand)
        jax.block_until_ready([p[0] for p in pool])
        for _ in range(2):
            out = jfn(*pool[0])
            jax.block_until_ready(out)
        jax.profiler.start_trace(args.trace_dir)
        for i in range(args.iters):
            out = jfn(*pool[i % len(pool)])
        jax.block_until_ready(out)
        jax.profiler.stop_trace()

    parse_trace(args.trace_dir, args.top)


if __name__ == "__main__":
    main()
