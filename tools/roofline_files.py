#!/usr/bin/env python
"""Roofline accounting for the batched file-serving graph (VERDICT r4
§next-2): where the serving program's FLOPs, HBM bytes, and estimated
cycles go, stage by stage, against the chip's peaks.

Compiles the SHIPPED serving wave program (B files × bucket seconds,
onset budget / wave clip budget / candidate budget = the bench + serve
defaults), pulls XLA's own cost model out of the compiled executable —
`flops`, `bytes accessed`, and per-op `estimated_cycles` grouped by the
op_name metadata each op carries — and prints one JSON report.

Interpretation caveat (measured round 5, docs/PERF.md): XLA's "bytes
accessed" counts every HLO-boundary operand+result, INCLUDING traffic
fusion keeps in VMEM — it is an upper bound on real HBM bytes, not a
measurement. On this graph the measured wave time (2.54 ms, B=4/K=32)
beats the counted-traffic time (4.52 ms at 819 GB/s), i.e. apparent
BW 1.46 TB/s > the v5e's physical 819 GB/s peak — proof the count
overcounts and the program is NOT HBM-bandwidth-bound. Pass
--measured_wave_ms (from BENCH_MODE=files dispatch_ms / K) and the
report states the three bounds and the verdict explicitly.

Usage: python tools/roofline_files.py [--files 4] [--seconds 60]
           [--onsets 112] [--budget 384] [--cand 448] [--platform tpu]
"""
from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# v5e peaks — imported from bench.py (the single source of truth, incl.
# its BENCH_PEAK_* env overrides), so bench's mfu/bw_util and this
# report's floors/verdict always share one denominator; bench.py's
# module level is stdlib-only, so this import is cheap
from bench import PEAK_FLOPS, PEAK_HBM  # noqa: E402
TPU_CLOCK_HZ = 940e6  # TensorCore clock (cycles → ms)

# stage attribution: first matching substring of the op_name path wins.
# Order matters — specific front-ends before the generic vmap segmenter.
STAGE_TAGS = (
    ("onset_detect", "detect_onsets"),        # envelope DFT + greedy scan
    ("slicing", "slice_at_onsets"),           # hop-aligned row gather
    ("clip_rerate", "jit(resample)"),         # 22050→ckpt-SR decimation
    ("mfcc_yin_frontend", "mfcc_feature_vectors"),
    ("melspec_frontend", "melspec_features"),
    ("yin_baseline", "yin_pitch"),            # usually CSE'd into mfcc
    ("cnn_forward", "CNN"),
    ("mlp_forward", "MLP"),
    ("compaction", "argsort"),                # kept-clip budget gather
    ("segmentation_other", "vmap("),          # gating, masks, clip/pad
)


def _cost(compiled) -> dict:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return ca


def stage_cycles(compiled) -> dict:
    """Per-stage estimated_cycles from the compiled HLO (serial per-op
    estimates — good for RANKING stages, not partitioning wall-clock:
    the TPU overlaps MXU/VPU/DMA; see docs/PERF.md measurement notes)."""
    txt = compiled.as_text()
    stages = {name: 0 for name, _ in STAGE_TAGS}
    stages["other"] = 0
    for m in re.finditer(r'"estimated_cycles":"(\d+)"', txt):
        line_start = txt.rfind("\n", 0, m.start()) + 1
        line = txt[line_start:m.end()]
        mm = re.search(r'op_name="([^"]*)"', line)
        op = mm.group(1) if mm else ""
        for name, tag in STAGE_TAGS:
            if tag in op:
                stages[name] += int(m.group(1))
                break
        else:
            stages["other"] += int(m.group(1))
    return stages


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--onsets", type=int, default=112)
    ap.add_argument("--budget", type=int, default=384)
    ap.add_argument("--cand", type=int, default=448)
    ap.add_argument("--platform", default=None, choices=[None, "cpu",
                                                         "tpu"])
    ap.add_argument("--clip_batch", type=int, default=256,
                    help="also report the clip-path step at this batch "
                         "for side-by-side comparison (0 disables)")
    ap.add_argument("--measured_wave_ms", type=float, default=None,
                    help="measured per-wave dispatch time "
                         "(BENCH_MODE=files dispatch_ms / scan_chunks); "
                         "adds apparent-BW + bound verdict to the report")
    args = ap.parse_args()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    import jax.numpy as jnp
    from gat_tpu.config import TARGET_SR, CLIP_DURATION
    from gat_tpu.infer import Transcriber

    t = Transcriber()
    run, _ = t._fused_files_fn(TARGET_SR, CLIP_DURATION, args.onsets,
                               args.budget, args.cand)
    n = int(args.seconds * TARGET_SR)
    # ceil-to-whole-seconds: the SAME shape rule as bench.measure_files,
    # whose dispatch_ms is what --measured_wave_ms feeds — the two must
    # cost the identical program. NOTE this is the bench program family,
    # not production's: transcribe_files pads files into POW2 duration
    # buckets (bucket_seconds: 60 s → 64 s), so a production wave at the
    # same nominal duration carries bucket/duration more padded samples
    # through the segmentation front-end than costed here.
    bucket = -(-n // TARGET_SR) * TARGET_SR
    ys = jnp.zeros((args.files, bucket), jnp.float32)
    nv = jnp.full((args.files,), n, jnp.int32)
    compiled = run.lower(ys, nv).compile()
    ca = _cost(compiled)
    cyc = stage_cycles(compiled)
    total_cyc = sum(cyc.values())

    flops = float(ca.get("flops", 0.0))
    hbm = float(ca.get("bytes accessed", 0.0))
    audio_s = args.files * args.seconds
    report = {
        "program": {
            "files": args.files, "seconds": args.seconds,
            "max_onsets": args.onsets, "wave_clip_budget": args.budget,
            "cand_budget": args.cand, "audio_s_per_wave": audio_s,
        },
        "wave": {
            "xla_flops": flops,
            "xla_bytes_accessed": hbm,
            # t_flops is a hard floor (MXU at peak); t_bytes is NOT a
            # floor — counted bytes are an upper bound on real traffic
            # (see module docstring), so measured time may legitimately
            # beat it.
            "t_flops_ms_floor": round(flops / PEAK_FLOPS * 1e3, 3),
            "t_counted_traffic_ms_ub": round(hbm / PEAK_HBM * 1e3, 3),
            "arithmetic_intensity_flop_per_byte": round(
                flops / hbm, 2) if hbm else None,
        },
        "measured": (lambda ms: {
            "wave_ms": ms,
            "audio_s_per_s": round(audio_s / ms * 1e3, 1),
            "mfu": round(flops / PEAK_FLOPS * 1e3 / ms, 3),
            "apparent_hbm_GBps": round(hbm / 1e9 / ms * 1e3, 1),
            "bw_util_vs_xla_traffic": round(
                hbm / PEAK_HBM * 1e3 / ms, 3),
            "verdict": (
                "not HBM-bandwidth-bound: measured time beats the "
                "counted-traffic bound (apparent BW > physical peak), "
                "so XLA's byte count overcounts VMEM-resident fusion "
                "traffic; with MFU also well under 1, the wave is "
                "occupancy-bound in its sequential scan chain "
                "(docs/PERF.md round 5)"
                if hbm / PEAK_HBM * 1e3 / ms > 1.0 else
                "memory-bound at the counted traffic"
                if hbm / PEAK_HBM > flops / PEAK_FLOPS else
                "compute-bound"),
        })(args.measured_wave_ms) if args.measured_wave_ms else None,
        "stage_estimated_ms": {
            k: round(v / TPU_CLOCK_HZ * 1e3, 3)
            for k, v in sorted(cyc.items(), key=lambda kv: -kv[1])},
        "stage_share": {
            k: round(v / total_cyc, 4)
            for k, v in sorted(cyc.items(), key=lambda kv: -kv[1])
            if total_cyc},
    }

    if args.clip_batch:
        from __graft_entry__ import entry
        fn, (example,) = entry(batch=args.clip_batch)
        cc = jax.jit(fn).lower(example).compile()
        cca = _cost(cc)
        cflops = float(cca.get("flops", 0.0))
        chbm = float(cca.get("bytes accessed", 0.0))
        report["clip_step"] = {
            "batch": args.clip_batch,
            "xla_flops": cflops, "xla_bytes_accessed": chbm,
            "t_flops_ms_floor": round(cflops / PEAK_FLOPS * 1e3, 3),
            "t_counted_traffic_ms_ub": round(chbm / PEAK_HBM * 1e3, 3),
        }

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
