#!/usr/bin/env python
"""Batch transcription service: watch a directory, transcribe arrivals,
emit JSON results.

The production-serving driver the reference never had (its entry points
are a CLI and a mic loop): new `.wav` files dropped into `--in_dir` are
transcribed with the shipped ensemble and a `<stem>.json` result (labels,
confidences, onsets, YIN baseline) is written to `--out_dir`. Files are
processed in arrival batches; the hot path reuses the Transcriber's
cached jit graphs, so steady-state cost per file is one device dispatch.

Usage:
    python tools/serve.py --in_dir incoming/ --out_dir results/
    python tools/serve.py --in_dir incoming/ --out_dir results/ --once
"""
from __future__ import annotations

import argparse
import json
import signal
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def result_to_json(result: dict) -> dict:
    return {
        "labels": list(result["labels"]),
        "confidences": [float(c) for c in result["confidences"]],
        "onsets_s": [float(t) for t in result.get("onsets_s", [])],
        "yin": [{"pitch_hz": hz, **info}
                for hz, info in result.get("dsp_info", [])],
        # True iff an onset budget truncated detections (earliest kept)
        # — consumers must not treat the label list as exhaustive then
        "onset_overflow": bool(result.get("onset_overflow", False)),
    }


def serve(in_dir: Path, out_dir: Path, once: bool = False,
          poll_s: float = 0.5, transcriber=None, verbose: bool = True,
          batch: int = 1, cand_budget: int | None = None):
    from gat_tpu.infer import Transcriber
    t = transcriber or Transcriber()
    in_dir.mkdir(parents=True, exist_ok=True)
    out_dir.mkdir(parents=True, exist_ok=True)
    done: set[str] = set()
    stop = {"flag": False}

    def _sigint(_sig, _frm):
        stop["flag"] = True

    if not once:
        signal.signal(signal.SIGINT, _sigint)
        if verbose:
            print(f"[serve] watching {in_dir} → {out_dir} "
                   "(Ctrl+C to stop)")

    def _write(p: Path, result: dict, t0: float, wave_n: int = 1):
        out_path = out_dir / f"{p.stem}.json"
        if result.get("labels"):
            out_path.write_text(json.dumps(result_to_json(result),
                                           indent=2))
            status = ",".join(result["labels"])
        else:
            err = result.get("error", "no clips survived slicing")
            out_path.write_text(json.dumps(
                {"labels": [], "error": err}, indent=2))
            status = ("(no notes)" if "clips survived" in err
                      else f"(error: {err.split(':')[0]})")
        if verbose:
            # t0 is taken once per wave: report the wave's elapsed time
            # divided over its files, not the whole wave per file
            ms = (time.perf_counter() - t0) * 1000 / max(wave_n, 1)
            tag = f"{ms:.0f} ms" if wave_n == 1 else \
                f"{ms:.1f} ms/file, wave of {wave_n}"
            print(f"[serve] {p.name} → {status} ({tag})")

    def _one_file(p: Path) -> dict:
        try:
            return t.transcribe(p)
        except ValueError as e:  # e.g. silence: no clips survived
            return {"labels": [], "error": str(e)}
        except Exception as e:
            return {"labels": [], "error": f"{type(e).__name__}: {e}"}

    processed = 0
    while not stop["flag"]:
        pending = sorted(p for p in in_dir.glob("*.wav")
                         if p.name not in done)
        singles: list[Path] = []
        if batch > 1 and len(pending) > 1:
            # similar-length files batch together: every new
            # (max-length-bucket, batch) pair is a fresh XLA compile and
            # one 300 s outlier would pad a whole wave of 3 s files
            def _size(p: Path) -> int:
                try:  # a watch-folder file can vanish between glob+stat
                    return p.stat().st_size
                except OSError:
                    return 0
            pending.sort(key=_size)
        # batch >1: whole arrival waves go through the batched fused
        # multi-file program (one device dispatch per `batch` files)
        while batch > 1 and len(pending) > 1:
            wave, pending = pending[:batch], pending[batch:]
            t0 = time.perf_counter()
            try:
                results = t.transcribe_files(wave, cand_budget=cand_budget)
            except Exception:
                # one bad file fails the whole batched read — only THIS
                # wave falls back to the per-file path; later waves
                # keep batching
                singles.extend(wave)
                continue
            for p, r in zip(wave, results):
                _write(p, r, t0, wave_n=len(wave))
                done.add(p.name)
                processed += 1
        for p in singles + pending:
            t0 = time.perf_counter()
            _write(p, _one_file(p), t0)
            done.add(p.name)
            processed += 1
        if once:
            break
        time.sleep(poll_s)
    if verbose:
        print(f"[serve] stopped after {processed} files")
    return processed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--in_dir", type=Path, required=True)
    ap.add_argument("--out_dir", type=Path, required=True)
    ap.add_argument("--once", action="store_true",
                    help="process current contents and exit")
    ap.add_argument("--poll_s", type=float, default=0.5)
    ap.add_argument("--pitch_prior", type=float, default=0.0,
                    help="YIN pitch-prior mixture weight (0 disables)")
    ap.add_argument("--batch", type=int, default=1,
                    help="files per device dispatch (>1 routes arrival "
                         "waves through the batched fused multi-file "
                         "program)")
    ap.add_argument("--cand_budget", type=int, default=None,
                    help="onset candidate-scan budget per file (the "
                         "serving-speed lever for content of known onset "
                         "density; truncation sets onset_overflow in the "
                         "result JSON, never silent)")
    args = ap.parse_args()
    t = None
    if args.pitch_prior > 0:
        from gat_tpu.infer import Transcriber
        t = Transcriber(pitch_prior_weight=args.pitch_prior)
    serve(args.in_dir, args.out_dir, once=args.once, poll_s=args.poll_s,
          transcriber=t, batch=args.batch, cand_budget=args.cand_budget)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
