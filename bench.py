#!/usr/bin/env python
"""Benchmark: batched transcription throughput on the current device.

Measures the fused clip-batch graph (MFCC+pitch feature, mel-spec, MLP +
CNN forwards, ensemble, batched YIN baseline) — the compute path of
Transcriber.transcribe_clips — in audio-seconds transcribed per second
per chip.

vs_baseline: ratio against a reference-equivalent CPU baseline — the
same work executed clip-by-clip (batch=1) on CPU, which is how the
reference processes clips (per-clip librosa loops, SURVEY §3.1). The
baseline is measured once in a CPU subprocess and cached in
.bench_cpu_baseline.json.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

# batch 256 is the measured throughput sweet spot on v5e (median ~133k
# audio_s/s vs ~102k at 1024 and ~89k at 2048): smaller intermediate
# buffers tile/pipeline better through the memory system, and the graph
# is latency-hidden well past batch ~200
BATCH = int(os.environ.get("BENCH_BATCH", "256"))
# the single end-of-loop sync pays one ~30 ms tunnel round trip; at 20
# iterations that inflated per-step time by ~1.5 ms (~20%). 100
# iterations amortize it to ~0.3 ms — closer to the sustained
# throughput a serving loop (which never syncs) actually gets.
ITERS = int(os.environ.get("BENCH_ITERS", "100"))
_CACHE = REPO / ".bench_cpu_baseline.json"


def _ckpt_sr() -> int:
    """Sample rate the fused graph runs at — from the shipped checkpoint
    (the clip→audio-seconds conversion must track it, not a constant)."""
    from gat_tpu.config import MLP_CONFIG
    from gat_tpu.train.checkpoint import load_checkpoint
    ck = load_checkpoint(MLP_CONFIG.CHECKPOINTS_DIR
                         / MLP_CONFIG.DEFAULT_CKPT_NAME)
    return int(ck["config"]["target_sr"])


def _make_clips(batch: int, clip_len: int, sr: int, seed: int = 0):
    import numpy as np
    rng = np.random.default_rng(seed)
    t = np.arange(clip_len) / float(sr)
    freqs = rng.uniform(80.0, 700.0, batch)
    clips = 0.3 * np.sin(2 * np.pi * freqs[:, None] * t[None, :])
    clips += rng.normal(0, 0.01, clips.shape)
    return clips.astype(np.float32)


def _input_pool(batch: int, clip_len: int, sr: int, n: int = 4):
    """Distinct device-resident input batches. Timing loops MUST cycle
    distinct inputs: repeated execution on the SAME buffers measures
    ~0.02 ms/iter regardless of the program (verified — some layer of
    the tunneled-TPU stack elides duplicate executions), which silently
    inflated earlier throughput numbers."""
    import jax
    pool = [jax.device_put(_make_clips(batch, clip_len, sr, seed=i))
            for i in range(n)]
    # device_put is async through the tunnel — force residency NOW, or
    # the timed loop pays the (slow, ~MB/ms) host→device uploads
    jax.block_until_ready(pool)
    return pool


def _warm_clip(batch: int, clip_len: int, sr: int):
    """Warmup buffer OUTSIDE the timing pool's seeds, so the first timed
    iteration never repeats the warmup input (and gets elided)."""
    import jax
    return jax.device_put(_make_clips(batch, clip_len, sr, seed=997))


# v5e peak: 197 TFLOP/s bf16 (MXU); fp32 operands run through bf16
# passes, so this is the conservative denominator for MFU.
PEAK_FLOPS = float(os.environ.get("BENCH_PEAK_FLOPS", 197e12))
# v5e HBM bandwidth. Denominator for the serving graph's apparent-BW
# number — see docs/PERF.md round-5 roofline for why "apparent": XLA's
# "bytes accessed" counts every HLO-boundary operand, including traffic
# that fusion keeps in VMEM, so it is an UPPER bound on real HBM bytes
# and the derived utilization can legitimately exceed 1.0 (which is
# itself the measurement that the program is not HBM-bound).
PEAK_HBM = float(os.environ.get("BENCH_PEAK_HBM", 819e9))


def _compiled_flops(compiled) -> float | None:
    """XLA's own per-execution FLOP estimate for a compiled executable."""
    return _compiled_cost(compiled)[0]


def _compiled_cost(compiled) -> tuple[float | None, float | None]:
    """(flops, bytes accessed) from XLA's cost model for one execution."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return (float(ca.get("flops", 0.0)) or None,
                float(ca.get("bytes accessed", 0.0)) or None)
    except Exception:
        return None, None


def measure(batch: int, iters: int, warmup: int = 2,
            return_details: bool = False, scan_chunks: int | None = None,
            repeats: int = 1):
    """audio-seconds/sec of the fused graph at the given batch size.

    Iterations are dispatched back-to-back with one synchronization at the
    end: that measures sustained device throughput. (Per-call sync would
    instead measure the host↔device link round-trip — ~30 ms through the
    tunneled TPU here — which a production serving loop pipelines away.)

    scan_chunks=K runs K micro-batches of `batch` per dispatch via ONE
    lax.scan over a (K, batch, L) super-batch — the same compiled step,
    serialized on-device. Per-dispatch host/tunnel overhead (profiled
    ~0.29 ms against a traced 0.574 ms device step at batch 256)
    amortizes K×, while the per-step working set stays at the batch-256
    memory sweet spot instead of ballooning the batch. Measured on v5e:
    K=1 148k, K=8 171k, K=32 199k audio-s/s — against a traced on-chip
    ceiling of ~223k."""
    import jax
    from __graft_entry__ import entry
    fn, (example,) = entry(batch=batch)
    clip_len = example.shape[1]
    sr = _ckpt_sr()
    k = scan_chunks or 1
    if k > 1:
        import numpy as np
        step = fn

        def fn(xs):  # noqa: F811 — scanned wrapper over the same step
            return jax.lax.scan(lambda _, x: (None, step(x)), None, xs)[1]

        pool = [jax.device_put(np.stack(
            [_make_clips(batch, clip_len, sr, seed=i * k + j)
             for j in range(k)])) for i in range(4)]
        jax.block_until_ready(pool)
        warm = jax.device_put(np.stack(
            [_make_clips(batch, clip_len, sr, seed=990 + j)
             for j in range(k)]))
    else:
        pool = _input_pool(batch, clip_len, sr)
        warm = _warm_clip(batch, clip_len, sr)
    compiled = jax.jit(fn).lower(warm).compile()
    for _ in range(warmup):
        out = compiled(warm)
        jax.block_until_ready(out)
    # repeats run INSIDE one call so the input pools (4×722 MB at the
    # default K=128 — minutes of tunnel upload) and the compiled
    # executable are built once; the median timing loop is reported
    times = []
    for _ in range(max(1, repeats)):
        t0 = time.perf_counter()
        for i in range(iters):
            out = compiled(pool[i % len(pool)])
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    audio_seconds = batch * (clip_len / float(sr)) * iters * k
    value = audio_seconds / dt
    if not return_details:
        return value
    if k > 1:
        # XLA's cost analysis counts a while-loop body ONCE (trip count
        # unknown to it), so take FLOPs from the single-step executable
        # and scale by k
        flops = _compiled_flops(
            jax.jit(step).lower(pool[0][0]).compile())
        flops = flops * k if flops else None
    else:
        flops = _compiled_flops(compiled)
    mfu = (flops * iters / dt / PEAK_FLOPS) if flops else None
    return value, {
        "step_ms": round(dt / iters / k * 1000, 3),
        "scan_chunks": k,
        "xla_flops_per_step": (flops / k if flops else None) if k > 1
        else flops,
        "mfu": round(mfu, 6) if mfu is not None else None,
    }


# v5e TensorCore clock, for converting XLA's estimated cycles to ms
_TPU_CLOCK_HZ = float(os.environ.get("BENCH_TPU_CLOCK_HZ", 940e6))

_STAGE_TAGS = (
    ("melspec_frontend", "melspec_features"),
    ("mfcc_pitch_frontend", "mfcc_feature_vectors"),
    ("yin_baseline", "yin_pitch"),
    ("cnn_forward", "CNN"),
    ("mlp_forward", "MLP"),
)


def measure_stages(batch: int) -> dict:
    """Per-stage cost partition of the FULL fused graph, from XLA's own
    per-op cycle estimates in the compiled HLO, grouped by the op_name
    metadata each op carries. (Wall-clock timing of isolated sub-graphs
    is not usable through this TPU tunnel: repeat executions of small
    programs are elided/pipelined into meaninglessly small numbers, while
    the cycle estimates match the real profiler trace — see CLAUDE.md.)"""
    import re
    import jax
    from __graft_entry__ import entry

    fn, (example,) = entry(batch=batch)
    compiled = jax.jit(fn).lower(example).compile()
    txt = compiled.as_text()
    stages = {name: 0 for name, _ in _STAGE_TAGS}
    stages["other"] = 0
    for m in re.finditer(
            r'"estimated_cycles":"(\d+)"', txt):
        # walk back to this op's op_name metadata on the same line
        line_start = txt.rfind("\n", 0, m.start()) + 1
        line = txt[line_start:m.end()]
        mm = re.search(r'op_name="([^"]*)"', line)
        op = mm.group(1) if mm else ""
        for name, tag in _STAGE_TAGS:
            if tag in op:
                stages[name] += int(m.group(1))
                break
        else:
            stages["other"] += int(m.group(1))
    total = sum(stages.values())
    out = {k: round(v / _TPU_CLOCK_HZ * 1000, 3) for k, v in stages.items()}
    out["total_estimated_ms"] = round(total / _TPU_CLOCK_HZ * 1000, 3)
    return out


def _read_cache() -> dict:
    if _CACHE.exists():
        try:
            return json.loads(_CACHE.read_text())
        except Exception:
            pass
    return {}


def cpu_baseline() -> float:
    """Reference-equivalent CPU throughput: per-clip (batch=1) sequential
    processing on the CPU backend, measured in a subprocess."""
    cache = _read_cache()
    # a floor without its measurement timestamp is pre-audit-format:
    # re-measure so the emitted JSON line is fully self-contained
    if "audio_s_per_s" in cache and "audio_s_per_s_measured_at" in cache:
        return float(cache["audio_s_per_s"])
    code = (
        "import jax, json;"
        "jax.config.update('jax_platforms','cpu');"
        "import sys; sys.path.insert(0, %r);"
        "from bench import measure;"
        "v = measure(batch=1, iters=20, warmup=2);"
        "print('CPU_BASELINE=' + json.dumps(v))" % str(REPO))
    env = dict(os.environ)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=1200)
    for line in out.stdout.splitlines():
        if line.startswith("CPU_BASELINE="):
            v = float(json.loads(line.split("=", 1)[1]))
            cache["audio_s_per_s"] = v
            cache["audio_s_per_s_measured_at"] = time.strftime(
                "%Y-%m-%dT%H:%M:%S")
            _CACHE.write_text(json.dumps(cache))
            return v
    raise RuntimeError(f"cpu baseline failed: {out.stderr[-2000:]}")


def numpy_baseline() -> float:
    """The fairer floor (VERDICT r1 §next-8): the reference-shaped pure-
    numpy per-clip loop (tools/numpy_reference_pipeline.py), no JAX
    dispatch overhead, measured in a subprocess and cached."""
    cache = _read_cache()
    if ("numpy_audio_s_per_s" in cache
            and "numpy_audio_s_per_s_measured_at" in cache):
        return float(cache["numpy_audio_s_per_s"])
    out = subprocess.run(
        [sys.executable, str(REPO / "tools/numpy_reference_pipeline.py")],
        capture_output=True, text=True, timeout=1200, env=dict(os.environ))
    for line in out.stdout.splitlines():
        if line.startswith("NUMPY_BASELINE="):
            v = float(json.loads(line.split("=", 1)[1]))
            cache["numpy_audio_s_per_s"] = v
            cache["numpy_audio_s_per_s_measured_at"] = time.strftime(
                "%Y-%m-%dT%H:%M:%S")
            _CACHE.write_text(json.dumps(cache))
            return v
    raise RuntimeError(f"numpy baseline failed: {out.stderr[-2000:]}")


def files_cpu_baseline() -> float:
    """Reference-equivalent CPU floor for the SERVING metric: one whole
    recording at a time through the fused file program on the CPU
    backend (the reference transcribes files sequentially, one per call
    — ref transcribe.py:77-144). Measured in a subprocess, cached with
    its timestamp like the clip floors."""
    cache = _read_cache()
    if ("files_cpu_audio_s_per_s" in cache
            and "files_cpu_audio_s_per_s_measured_at" in cache):
        return float(cache["files_cpu_audio_s_per_s"])
    code = (
        "import jax, json;"
        "jax.config.update('jax_platforms','cpu');"
        "import sys; sys.path.insert(0, %r);"
        "from bench import measure_file;"
        "v = measure_file(duration_s=60.0, iters=3)['audio_s_per_s'];"
        "print('FILES_CPU_BASELINE=' + json.dumps(v))" % str(REPO))
    out = subprocess.run([sys.executable, "-c", code], env=dict(os.environ),
                         capture_output=True, text=True, timeout=1800)
    for line in out.stdout.splitlines():
        if line.startswith("FILES_CPU_BASELINE="):
            v = float(json.loads(line.split("=", 1)[1]))
            cache["files_cpu_audio_s_per_s"] = v
            cache["files_cpu_audio_s_per_s_measured_at"] = time.strftime(
                "%Y-%m-%dT%H:%M:%S")
            _CACHE.write_text(json.dumps(cache))
            return v
    raise RuntimeError(f"files cpu baseline failed: {out.stderr[-2000:]}")


def measure_latency(iters: int = 50) -> float:
    """p50 single-clip latency (s): one clip through the fused graph with
    a host sync per call — the BASELINE.md latency metric. Includes the
    host↔device link, as a serving request would."""
    import numpy as np
    import jax
    from __graft_entry__ import entry
    fn, (example,) = entry(batch=1)
    jfn = jax.jit(fn)
    sr = _ckpt_sr()
    pool = _input_pool(1, example.shape[1], sr, n=8)
    warm = _warm_clip(1, example.shape[1], sr)
    for _ in range(3):
        jax.block_until_ready(jfn(warm))
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(jfn(pool[i % len(pool)]))
        times.append(time.perf_counter() - t0)
    return float(np.percentile(times, 50))


def measure_transcribe_stages(duration_s: float = 4.0, iters: int = 20,
                              warmup: int = 3) -> dict:
    """Per-stage budget of `Transcriber.transcribe()` — the reference's
    primary interactive path (ref transcribe_cli.py:16-114) — so the
    "sub-ms on-chip" claim becomes a number a co-located deployment can
    check stage by stage (VERDICT r4 §next-8).

    Two views of the same work:
      * `stages_ms` — p50 wall per stage WITH a sync after each device
        stage. Through this tunneled TPU every sync pays the ~30 ms
        round trip, so these rows measure the LINK, not the chip; they
        are what a remote client of this exact stack sees.
      * `device_sustained_ms` — the two device stages (segmentation,
        clip ensemble) re-measured as ONE jitted lax.map over K distinct
        stacked inputs, per-file cost from the wall(2K)−wall(K)
        difference: the per-dispatch tunnel RPC floor cancels, leaving
        pure on-chip time per file. (Pipelined per-call dispatch is NOT
        enough here: the tunnel serializes one RPC per program per call,
        ~30-40 ms each, and the unjitted segmentation composition is ~3
        programs/call — measured 123 ms/call of pure link that way.)
      * `colocated_estimate_ms` — host stages (decode, result assembly,
        host transfers of result-sized arrays are ~free co-located) +
        sustained device stages: what a non-tunneled deployment should
        expect end-to-end for one file, up to ~0.1 ms/dispatch of
        co-located runtime overhead not modeled here.
    """
    import tempfile
    import numpy as np
    import jax
    import jax.numpy as jnp
    from gat_tpu.config import TARGET_SR
    from gat_tpu.infer import Transcriber
    from gat_tpu.ops.resample import resample, fix_length
    from gat_tpu.segment.slicing import segment_waveform
    from gat_tpu.utils.wavio import read_wav, write_wav

    t = Transcriber()
    sr = TARGET_SR
    n = int(duration_s * sr)
    bucket = -(-n // sr) * sr
    # distinct FILES on disk: decode is part of the budget, and repeat
    # executions of identical device inputs are elided by the tunnel
    # stack (CLAUDE.md) — every stage must see fresh content
    td = tempfile.TemporaryDirectory()
    paths = []
    for i in range(iters + warmup):
        p = Path(td.name) / f"lat_{i}.wav"
        write_wav(p, _riff_waveform(bucket, n, sr, seed=i)[:n], sr)
        paths.append(p)

    stages = {k: [] for k in ("decode_host", "resample_upload",
                              "segment_dispatch", "segment_transfer",
                              "ensemble_dispatch", "assemble_host",
                              "total")}
    kept_batch = None
    for i, p in enumerate(paths):
        rec = {}
        t0 = time.perf_counter()
        y, sr_in = read_wav(p)
        rec["decode_host"] = time.perf_counter() - t0

        t1 = time.perf_counter()
        y22 = jnp.asarray(resample(y, sr_in, sr))
        jax.block_until_ready(y22)
        rec["resample_upload"] = time.perf_counter() - t1

        t2 = time.perf_counter()
        seg = segment_waveform(y22, sr=sr, length_sec=t.clip_length,
                               max_onsets=64)
        jax.block_until_ready(seg)
        rec["segment_dispatch"] = time.perf_counter() - t2

        t3 = time.perf_counter()
        seg_h = jax.device_get(seg)
        rec["segment_transfer"] = time.perf_counter() - t3

        clips, kept = seg_h[0], seg_h[1]
        clips_np = np.asarray(clips)[np.asarray(kept)]
        t4 = time.perf_counter()
        clips_ckpt = fix_length(resample(jnp.asarray(clips_np), sr,
                                         t.ckpt_sr),
                                int(t.ckpt_sr * t.clip_length))
        result = t.transcribe_clips(clips_ckpt)
        rec["ensemble_dispatch"] = time.perf_counter() - t4

        t5 = time.perf_counter()
        _ = {"labels": result["labels"],
             "onsets_s": (np.asarray(seg_h[2])[np.asarray(kept)]
                          / float(sr)).tolist()}
        rec["assemble_host"] = time.perf_counter() - t5
        rec["total"] = time.perf_counter() - t0
        kept_batch = len(clips_np)
        if i >= warmup:
            for k, v in rec.items():
                stages[k].append(v)

    p50 = {k: round(float(np.percentile(v, 50)) * 1000, 2)
           for k, v in stages.items()}

    # sustained ON-CHIP cost of the two device stages. Two traps stack
    # here: (1) repeat executions on identical buffers are elided by the
    # tunnel stack (CLAUDE.md), so inputs must be distinct; (2) even
    # PIPELINED per-call dispatch through the tunnel serializes one RPC
    # per compiled program per call (~30-40 ms each — the unjitted
    # segmentation composition is ~3 programs/call and measured 123 ms
    # "sustained", i.e. pure link). So each stage is measured as ONE
    # jitted program that lax.map's over K distinct stacked inputs —
    # one RPC amortized over K files — and the per-file device cost is
    # wall/K with the K=2·K' vs K' difference canceling the RPC floor.
    import jax.lax as lax

    def _scan_sustained(jfn_k, stack_k, jfn_2k, stack_2k, k, reps=8):
        """Per-item device ms from the K vs 2K difference: wall(2K) -
        wall(K) = K items of pure device time (the per-dispatch RPC
        floor cancels; both programs pipelined over distinct pools,
        one end sync each)."""
        def run(fn, pools):
            out = fn(pools[-1])
            jax.block_until_ready(out)
            tt = time.perf_counter()
            for j in range(reps):
                out = fn(pools[j % len(pools)])
            jax.block_until_ready(out)
            return (time.perf_counter() - tt) / reps
        w_k = run(jfn_k, stack_k)
        w_2k = run(jfn_2k, stack_2k)
        return max(w_2k - w_k, 0.0) / k * 1000

    k = 8
    seg_body = (lambda y: segment_waveform(
        y, sr=sr, length_sec=t.clip_length, max_onsets=64))

    def _seg_stacks(kk):
        return [jax.device_put(np.stack(
            [_riff_waveform(bucket, n, sr, 500 + 97 * p + j)[:bucket]
             for j in range(kk)])) for p in range(2)]

    jseg_k = jax.jit(lambda ys: lax.map(seg_body, ys))
    jseg_2k = jax.jit(lambda ys: lax.map(seg_body, ys))
    s_k, s_2k = _seg_stacks(k), _seg_stacks(2 * k)
    jax.block_until_ready([s_k, s_2k])
    seg_ms = _scan_sustained(jseg_k, s_k, jseg_2k, s_2k, k)

    from __graft_entry__ import entry
    b = max(1, kept_batch or 1)
    fn, (ex,) = entry(batch=b)

    def _clip_stacks(kk):
        return [jax.device_put(np.stack(
            [_make_clips(b, ex.shape[1], t.ckpt_sr, seed=700 + 89 * p + j)
             for j in range(kk)])) for p in range(2)]

    jens_k = jax.jit(lambda cs: lax.map(fn, cs))
    jens_2k = jax.jit(lambda cs: lax.map(fn, cs))
    c_k, c_2k = _clip_stacks(k), _clip_stacks(2 * k)
    jax.block_until_ready([c_k, c_2k])
    ens_ms = _scan_sustained(jens_k, c_k, jens_2k, c_2k, k)

    colocated = (p50["decode_host"] + seg_ms + ens_ms
                 + p50["assemble_host"])
    return {
        "file_s": duration_s,
        "clips_kept": kept_batch,
        "stages_ms_p50_tunnel": p50,
        "device_sustained_ms": {"segmentation": round(seg_ms, 3),
                                "clip_ensemble": round(ens_ms, 3)},
        "colocated_estimate_ms": round(colocated, 2),
        "note": "tunnel rows include ~30 ms/sync link RTT; "
                "colocated = decode + sustained device stages + assembly",
    }


def measure_stream_chunk(iters: int = 40) -> float:
    """p50 per-chunk latency (ms) of the device-side streaming engine:
    one 0.5 s chunk through the ScanStreamer scan step (ring slide +
    onset detect + K-slot ensemble), synced per chunk as a live session
    would be."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from gat_tpu.infer import Transcriber
    from gat_tpu.stream.scan import ScanStreamer

    st = ScanStreamer(Transcriber(), sr=22050)
    rng = np.random.default_rng(0)
    chunks = [jnp.asarray(rng.normal(0, 0.1, (1, st.chunk))
                          .astype(np.float32)) for i in range(9)]
    jax.block_until_ready(st._scan_fn(chunks.pop()))  # warm, not reused
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(st._scan_fn(chunks[i % len(chunks)]))
        times.append(time.perf_counter() - t0)
    return float(np.percentile(times, 50))


def measure_train(model_name: str, batch: int, iters: int = 60,
                  bf16: bool = True) -> dict:
    """Training-step throughput (clips/s) for one model: forward + CE +
    backward + global-norm clip + AdamW update, the jit step the Trainer
    runs per batch. Inputs are pre-extracted features (the reference
    trains on precomputed features too — DataLoaders of tensors, SURVEY
    C12/C13), so this isolates the training loop itself. Same honest
    protocol as `measure`: distinct device-resident batches, pipelined
    dispatch, one end sync."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from gat_tpu.models import CNN, MLP
    from gat_tpu.train.data import ArrayDataLoader
    from gat_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    n_classes = 47
    if model_name == "mlp":
        model = MLP(num_features=65)
        shape = (batch, 65)
    else:
        model = CNN(dtype=jnp.bfloat16 if bf16 else jnp.float32)
        shape = (batch, 64, 22, 1)  # n_mels × T(hop 256, 0.5 s @ 11025)

    def make_x(seed):
        # seed-determined so distinctness never depends on call order
        return np.random.default_rng(seed).normal(
            0, 1, shape).astype(np.float32)

    X0 = make_x(0)
    y0 = rng.integers(0, n_classes, batch).astype(np.int32)
    dl = ArrayDataLoader(X0, y0, batch_size=batch, shuffle=False)
    tr = Trainer(model, dl, reverse_map={i: f"c{i}" for i in range(n_classes)})

    pool = [jax.device_put(make_x(i + 1)) for i in range(4)]
    yb = jax.device_put(y0)
    key = jax.random.PRNGKey(0)
    jax.block_until_ready(pool)
    warm = jax.device_put(make_x(997))
    params, extra, opt = tr.params, tr.extra, tr.opt_state
    for _ in range(2):
        params, extra, opt, *_ = tr._train_step(params, extra, opt,
                                                warm, yb, key)
    jax.block_until_ready(params)
    t0 = time.perf_counter()
    for i in range(iters):
        params, extra, opt, loss, correct, gnorm = tr._train_step(
            params, extra, opt, pool[i % len(pool)], yb, key)
    jax.block_until_ready(params)
    dt = time.perf_counter() - t0
    return {
        "model": model_name,
        "clips_per_s": round(batch * iters / dt, 1),
        "step_ms": round(dt / iters * 1000, 3),
        "batch": batch,
        "loss_final": round(float(loss), 4),
    }


def _riff_waveform(bucket: int, n: int, sr: int, seed: int):
    """Synthetic test recording for the file benches: decaying plucks at
    random pitches over a low noise floor, `n` valid samples padded to
    `bucket`. Shared by measure_file and measure_files so both measure
    the SAME workload."""
    import numpy as np
    rng = np.random.default_rng(seed)
    y = np.zeros(bucket, np.float32)
    pos = int(0.3 * sr)
    while pos + sr // 2 < n:
        f = rng.uniform(82.0, 660.0)
        dur = int(0.45 * sr)
        tt = np.arange(dur) / sr
        note = (np.sin(2 * np.pi * f * tt)
                * np.exp(-3.0 * tt)).astype(np.float32)
        y[pos:pos + dur] += 0.5 * note
        pos += int(rng.uniform(0.55, 0.75) * sr)
    return y + rng.normal(0, 1e-3, bucket).astype(np.float32)


def measure_file(duration_s: float = 60.0, iters: int = 30,
                 max_onsets: int = 128) -> dict:
    """Sustained FILE-path throughput (audio-s/s): whole recordings
    through the fused one-graph file program — gating, onset detection,
    static-budget slicing, clip re-rating, features, both forwards,
    ensemble, YIN — pipelined over distinct waveforms, one end sync.
    This is the path `Transcriber.transcribe(fused=True)` runs; the
    default clip-batch metric (measure) excludes segmentation."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from gat_tpu.config import TARGET_SR, CLIP_DURATION
    from gat_tpu.infer import Transcriber

    t = Transcriber()
    run = t._fused_file_fn(TARGET_SR, CLIP_DURATION, max_onsets)
    n = int(duration_s * TARGET_SR)
    bucket = -(-n // TARGET_SR) * TARGET_SR

    pool = [jax.device_put(_riff_waveform(bucket, n, TARGET_SR, i))
            for i in range(4)]
    nvalid = jax.device_put(jnp.asarray(n))
    jax.block_until_ready(pool)
    warm = jax.device_put(_riff_waveform(bucket, n, TARGET_SR, 997))
    for _ in range(2):
        out = run(warm, nvalid)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = run(pool[i % len(pool)], nvalid)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    kept = int(np.asarray(out[4]).sum())
    return {
        "audio_s_per_s": round(duration_s * iters / dt, 1),
        "file_ms": round(dt / iters * 1000, 2),
        "file_s": duration_s,
        "clips_kept_last": kept,
        "max_onsets": max_onsets,
    }


def measure_files(n_files: int = 4, duration_s: float = 60.0,
                  iters: int = 30, max_onsets: int = 128,
                  scan_chunks: int = 1,
                  wave_clip_budget: int | None = None,
                  cand_budget: int | None = None,
                  pool_n: int = 4) -> dict:
    """Sustained MULTI-file throughput (audio-s/s): B whole recordings
    per dispatch through the batched fused file program
    (`Transcriber.transcribe_files` compute path) — per-file segmentation
    under vmap (the greedy onset scans advance all B lanes per step),
    then one flat (B·K) clip batch through the ensemble.
    scan_chunks=K scans K file-batches per dispatch (the serving path's
    bucket super-batches)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from gat_tpu.config import TARGET_SR, CLIP_DURATION
    from gat_tpu.infer import Transcriber

    t = Transcriber()
    run, run_scan = t._fused_files_fn(TARGET_SR, CLIP_DURATION, max_onsets,
                                      wave_clip_budget, cand_budget)
    n = int(duration_s * TARGET_SR)
    bucket = -(-n // TARGET_SR) * TARGET_SR
    k = max(1, scan_chunks)

    def batch(seed0):
        b = np.stack([_riff_waveform(bucket, n, TARGET_SR, seed0 + i)
                      for i in range(n_files * k)])
        return b.reshape(k, n_files, bucket) if k > 1 else b

    if k > 1:
        fn = run_scan
        nv = jax.device_put(jnp.full((k, n_files), n, jnp.int32))
    else:
        fn = run
        nv = jax.device_put(jnp.full((n_files,), n, jnp.int32))
    pool = [jax.device_put(batch(1000 * i)) for i in range(max(pool_n, 2))]
    jax.block_until_ready(pool)
    warm = jax.device_put(batch(99000))
    for _ in range(2):
        out = fn(warm, nv)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(pool[i % len(pool)], nv)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    kept = int(np.asarray(out[4]).sum())
    # overflow accounting: with transcribe_files' exact-fallback, only
    # FIXABLE flags (out[8]: overflow an exact re-run could change —
    # cap-only max_onsets truncation is excluded) cost re-dispatches,
    # batched into pow2 waves — report both counts so aggressive-budget
    # settings can be costed end-to-end
    flagged = int(np.asarray(out[7]).sum())
    fixable = int(np.asarray(out[8]).sum())
    # FLOP accounting for the serving graph: XLA's estimate for ONE wave
    # program (the scan body — cost_analysis counts a while-loop body
    # once, so lower the single-wave `run` and scale by K). The compile
    # is cached persistently (.jax_cache), so repeat benches pay nothing.
    if k > 1:  # pool entries are (K, B, n) super-batches; nv is (K, B)
        wave_flops, wave_bytes = _compiled_cost(
            run.lower(pool[0][0], nv[0]).compile())
    else:
        wave_flops, wave_bytes = _compiled_cost(
            run.lower(pool[0], nv).compile())
    mfu = (wave_flops * k * iters / dt / PEAK_FLOPS
           if wave_flops else None)
    # apparent HBM bandwidth: XLA-counted boundary bytes / measured time.
    # An UPPER bound on real traffic (fusion keeps some counted buffers
    # in VMEM), so utilization > 1.0 is a meaningful reading: the program
    # demonstrably is NOT HBM-bandwidth-bound (docs/PERF.md round 5).
    bw = (wave_bytes * k * iters / dt if wave_bytes else None)
    return {
        "audio_s_per_s": round(duration_s * n_files * k * iters / dt, 1),
        "dispatch_ms": round(dt / iters * 1000, 2),
        "n_files": n_files,
        "scan_chunks": k,
        "file_s": duration_s,
        "clips_kept_last": kept,
        "overflow_files_last": flagged,
        "fixable_files_last": fixable,
        "max_onsets": max_onsets,
        "wave_clip_budget": wave_clip_budget,
        "cand_budget": cand_budget,
        "xla_flops_per_wave": wave_flops,
        "mfu": round(mfu, 4) if mfu is not None else None,
        "xla_bytes_per_wave": wave_bytes,
        "apparent_hbm_GBps": round(bw / 1e9, 1) if bw else None,
        "bw_util_vs_xla_traffic": (round(bw / PEAK_HBM, 3)
                                   if bw else None),
    }


def _device_or_bail(timeout_s: float) -> None:
    """Initialize the backend with a bound: a dead TPU tunnel makes
    jax.devices() hang forever, which would stall the whole bench run.
    The probe runs in a daemon thread (jax caches the backend, so the
    real run pays no second init); on timeout, ONE error JSON line is
    emitted — same contract as a measurement — and the process exits."""
    import threading

    done = threading.Event()
    err: list[str] = []

    def _probe():
        try:
            import jax
            jax.devices()
        except Exception as e:  # fast failure: surface the real cause
            err.append(f"{type(e).__name__}: {e}")
        done.set()

    threading.Thread(target=_probe, daemon=True).start()
    if not done.wait(timeout_s) or err:
        mode = os.environ.get("BENCH_MODE", "")
        # metric names AND units must match the success path per mode, or
        # a dashboard keyed on the metric name never correlates the error
        # line with the series it belongs to
        metric, unit = {
            "files": ("batched_file_throughput", "audio_s/s"),
            "file": ("file_path_throughput", "audio_s/s"),
            "train": ("train_step_throughput", "clips/s"),
            "stream": ("p50_stream_chunk_latency", "ms"),
            "latency": ("p50_single_clip_latency", "ms"),
            "stages": ("stage_times", "ms_per_step"),
        }.get(mode, ("audio_seconds_transcribed_per_sec_per_chip",
                     "audio_s/s"))
        reason = err[0] if err else (f"no response in {timeout_s:.0f}s "
                                     "— TPU tunnel down?")
        print(json.dumps({
            "metric": metric, "value": 0.0, "unit": unit,
            "vs_baseline": 0.0,
            "error": f"device backend unavailable ({reason})",
        }), flush=True)
        sys.stdout.flush()
        os._exit(1)


def main():
    import jax
    _device_or_bail(float(os.environ.get("BENCH_DEVICE_TIMEOUT_S", "900")))
    jax.config.update("jax_compilation_cache_dir",
                      str(REPO / ".jax_cache"))
    if os.environ.get("BENCH_MODE") == "files":
        # Defaults = the round-3 swept sweet spot (docs/PERF.md): 4 files
        # x 32 scanned file-batches per dispatch, onset budget 112,
        # wave clip budget 384, candidate-scan budget 448 (verified
        # exact on the bench riff: identical clips_kept to cand=None;
        # truncation would raise the per-file overflow flag).
        budget = os.environ.get("BENCH_FILES_BUDGET", "384")
        cand = os.environ.get("BENCH_FILES_CAND", "448")
        out = measure_files(
            n_files=int(os.environ.get("BENCH_FILES", "4")),
            scan_chunks=int(os.environ.get("BENCH_FILES_SCAN", "32")),
            max_onsets=int(os.environ.get("BENCH_FILES_ONSETS", "112")),
            wave_clip_budget=(int(budget) if budget.lower() != "none"
                              else None),
            cand_budget=(int(cand) if cand.lower() != "none" else None))
        print(json.dumps({
            "metric": "batched_file_throughput",
            "value": out["audio_s_per_s"],
            "unit": "audio_s/s",
            "vs_baseline": 1.0,
            "detail": out,
        }))
        return
    if os.environ.get("BENCH_MODE") == "file":
        out = measure_file()
        print(json.dumps({
            "metric": "file_path_throughput",
            "value": out["audio_s_per_s"],
            "unit": "audio_s/s",
            "vs_baseline": 1.0,
            "detail": out,
        }))
        return
    if os.environ.get("BENCH_MODE") == "train":
        batch = int(os.environ.get("BENCH_BATCH", "1024"))
        out = {m: measure_train(m, batch) for m in ("mlp", "cnn")}
        print(json.dumps({
            "metric": "train_step_throughput",
            "value": out,
            "unit": "clips/s",
            "vs_baseline": 1.0,
        }))
        return
    if os.environ.get("BENCH_MODE") == "stream":
        p50 = measure_stream_chunk()
        print(json.dumps({
            "metric": "p50_stream_chunk_latency",
            "value": round(p50 * 1000, 3),
            "unit": "ms",
            "vs_baseline": 1.0,
        }))
        return
    if os.environ.get("BENCH_MODE") == "latency":
        p50 = measure_latency()
        # the end-to-end transcribe() stage budget (VERDICT r4 §next-8):
        # tunnel-inclusive per-stage walls + sustained device costs + a
        # co-located end-to-end estimate. Guarded like the default
        # line's files leg: the stage budget pays fresh lax.map compiles
        # (~25 min cold through the tunnel) and must not be able to
        # destroy the already-measured headline p50 on failure.
        try:
            stages = measure_transcribe_stages()
        except Exception as e:  # noqa: BLE001 — headline must survive
            stages = {"error": f"{type(e).__name__}: {e}"}
        print(json.dumps({
            "metric": "p50_single_clip_latency",
            "value": round(p50 * 1000, 3),
            "unit": "ms",
            "vs_baseline": 1.0,
            "transcribe_stage_budget": stages,
        }))
        return
    if os.environ.get("BENCH_MODE") == "stages":
        print(json.dumps({
            "metric": "stage_times",
            "value": measure_stages(BATCH),
            "unit": "ms_per_step",
            "vs_baseline": 1.0,
        }))
        return
    baseline = cpu_baseline()
    np_base = numpy_baseline()
    # median of N runs: throughput through the shared tunnel swings
    # run-to-run (~±8% observed), and the compile is cached after the
    # first run so repeats are cheap.
    # BENCH_SCAN (default 128) scans K micro-batches per dispatch — the
    # throughput-serving pattern; BENCH_SCAN=1 is one batch per dispatch.
    # K sweep on v5e: 1→148k, 8→171k, 32→188-199k, 64→204k, 128→215k
    # audio-s/s (per-step 0.86→0.60 ms against the 0.574 ms traced
    # on-chip floor; input pools 4×722 MB at K=128 — well inside HBM).
    scan_k = int(os.environ.get("BENCH_SCAN", "128"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    iters = ITERS if scan_k == 1 else max(8, ITERS // scan_k)
    value, details = measure(BATCH, iters, return_details=True,
                             scan_chunks=scan_k, repeats=repeats)
    # the SERVING metric rides in the same driver-audited line (VERDICT
    # r4 §next-3): the batched file path at the shipped transcribe_files
    # config (B=4 waves, K=32 scanned, onsets 112, budget 384, cand 448
    # — the BENCH_MODE=files defaults), with its own reference-equivalent
    # CPU floor (sequential per-file processing). A files-leg failure
    # degrades to an error field, never the headline metric.
    files_fields: dict = {}
    if os.environ.get("BENCH_SKIP_FILES", "") != "1":
        try:
            # pool_n=2 (vs measure_files' default 4) halves the ~1.4 GB
            # of wave-pool uploads this leg adds to the default line.
            # Two buffers still alternate every iteration, and the
            # tunnel's duplicate-execution elision (CLAUDE.md) was
            # checked not to trigger on revisited buffers: same-day
            # pool_n=2 (93.5k) vs pool_n=4 (94.3k) agree within drift,
            # where elision would have read ~2x high.
            fdet = measure_files(n_files=4, scan_chunks=32, iters=20,
                                 max_onsets=112, wave_clip_budget=384,
                                 cand_budget=448, pool_n=2)
            ffloor = files_cpu_baseline()
            fcache = _read_cache()
            files_fields = {
                "files_audio_s_per_s": fdet["audio_s_per_s"],
                "files_vs_cpu": round(fdet["audio_s_per_s"] / ffloor, 2),
                "files_mfu": fdet["mfu"],
                "files_bw_util_vs_xla_traffic":
                    fdet["bw_util_vs_xla_traffic"],
                "files_dispatch_ms": fdet["dispatch_ms"],
                "files_floors": {
                    "cpu_audio_s_per_s": round(ffloor, 2),
                    "cpu_measured_at": fcache.get(
                        "files_cpu_audio_s_per_s_measured_at"),
                },
            }
        except Exception as e:  # noqa: BLE001 — headline must survive
            files_fields = {"files_error": f"{type(e).__name__}: {e}"}
    # self-contained ratios (VERDICT r3 §weak-5): the floor VALUES this
    # run divided by, and when each was measured, ride in the same JSON
    # line — a vs_baseline swing is auditable as numerator vs denominator
    # movement without digging up the cache file
    cache = _read_cache()
    print(json.dumps({
        "metric": "audio_seconds_transcribed_per_sec_per_chip",
        "value": round(value, 2),
        "unit": "audio_s/s",
        "vs_baseline": round(value / baseline, 2),
        "vs_baseline_numpy": round(value / np_base, 2),
        "baseline_floors": {
            "cpu_audio_s_per_s": round(baseline, 2),
            "cpu_measured_at": cache.get("audio_s_per_s_measured_at"),
            "numpy_audio_s_per_s": round(np_base, 2),
            "numpy_measured_at": cache.get(
                "numpy_audio_s_per_s_measured_at"),
        },
        "mfu": details["mfu"],
        "step_ms": details["step_ms"],
        "scan_chunks": scan_k,
        **files_fields,
    }))


if __name__ == "__main__":
    main()
