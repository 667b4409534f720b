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
        for e in events:
            if e.get("ph") == "X" and "dur" in e and (
                    not device_pids or e.get("pid") in device_pids):
                dur[e.get("name", "?")] += e["dur"]
        rows = dur.most_common(top)
        tables.append((f, rows))
        scope = "device lanes" if device_pids else "all lanes (no device pid found)"
        print(f"--- {Path(f).name}: top {top} by total us ({scope}) ---")
        for name, us in rows:
            print(f"{us:>12.1f} us  {name[:90]}")
    return tables


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--trace_dir", default="/tmp/gat_trace")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--parse_only", action="store_true",
                    help="only parse an existing trace dir")
    args = ap.parse_args()

    if not args.parse_only:
        import numpy as np
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          str(REPO / ".jax_cache"))
        from __graft_entry__ import entry
        fn, (ex,) = entry(batch=args.batch)
        jfn = jax.jit(fn)
        rng = np.random.default_rng(0)
        x = jax.device_put(
            rng.normal(0, 0.1, (args.batch, ex.shape[1]))
            .astype(np.float32))
        out = jfn(x)
        jax.block_until_ready(out)
        jax.profiler.start_trace(args.trace_dir)
        for _ in range(args.iters):
            out = jfn(x)
        jax.block_until_ready(out)
        jax.profiler.stop_trace()

    parse_trace(args.trace_dir, args.top)


if __name__ == "__main__":
    main()
