"""Transcriber: the file-level and array-level inference APIs.

Behavioral spec: version_1/source/transcribe.py (C17/C18). Checkpoints
are the source of truth — feature params, scaler, and target_sr all come
from the embedded checkpoint config, never the live config
(ref transcribe.py:113-129). Differences by design (TPU-first):

  * No disk round-trip: the reference writes sliced clips as .wav and
    re-reads them (ref transcribe.py:100-121, SURVEY §3.1); here slicing,
    clip resampling, feature extraction, both model forwards, the
    ensemble, and the YIN baseline are device ops over one in-memory
    batch. `save_clips=True` restores the reference's side effect.
  * One YIN pass: the reference runs YIN per clip twice (pitch feature +
    dsp_info baseline, SURVEY §3.1); the baseline pass here is one
    batched kernel (and the pitch-feature pass lives inside the feature
    graph).
"""
from __future__ import annotations

from datetime import datetime
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (TARGET_SR, CLIP_DURATION, MLP_CONFIG, CNN_CONFIG,
                      INFERENCE_OUTPUT_ROOT)
from ..features import FeatureBuilder
from ..ops.resample import resample, fix_length
from ..ops.yin import yin_pitch, estimate_note
from ..segment.slicing import segment_waveform, AudioSlicer
from ..train.checkpoint import load_checkpoint
from ..utils.scaler import FeatureScaler
from ..utils.wavio import read_wav
from .predictor import NotePredictor

# waves per device dispatch in transcribe_files (the swept v5e sweet
# spot — docs/PERF.md). serve.py's warmup derives its compile shapes
# from this so the warmed program family always matches what
# transcribe_files actually dispatches.
DEFAULT_MAX_BATCH = 4
# per-file onset-slot default (transcribe_files / the exact-fallback
# programs) — named so serve.warmup compiles the same family
DEFAULT_MAX_ONSETS = 64


def bucket_seconds(duration_s: float) -> int:
    """The pow2 duration bucket (whole seconds) transcribe_files groups
    a file into. ONE definition shared with serve.warmup, so warmed
    program shapes can never drift from what transcribe_files actually
    dispatches."""
    sec = max(1, int(-(-float(duration_s) // 1)))  # ceil to whole seconds
    return 1 << (sec - 1).bit_length()

__all__ = ["Transcriber"]


def _next_onset_cap(n_detected: int, prev_cap: int,
                    ceiling: int | None) -> int | None:
    """The next `max_onsets` for one cap auto-scaling re-run: the pow2
    that FITS the detected count (strictly above the previous cap, so a
    censored count still makes progress), clamped to the ceiling. None
    = no larger cap is allowed (ceiling disabled or already reached) —
    the caller keeps the honest overflow flag. ONE definition shared by
    transcribe_files, the fused single-file path, and the two-stage
    path, so the cap-scaling arithmetic can never drift between them."""
    if not ceiling:
        return None
    m = 1 << (max(int(n_detected), prev_cap + 1) - 1).bit_length()
    m = min(m, int(ceiling))
    return m if m > prev_cap else None


class Transcriber:
    def __init__(self, mlp_ckpt=None, cnn_ckpt=None, mlp_root=None,
                 cnn_root=None, cnn_weight: float = 0.80,
                 require_cnn: bool = True,
                 pitch_prior_weight: float = 0.0,
                 cnn_dtype=None, use_cnn: bool = True, mesh=None):
        """Resolve + load both checkpoints, validate their embedded
        configs, and initialize the ensemble (ref transcribe.py:26-75).
        `require_cnn=False` permits MLP-only operation (the reference
        repo itself ships without the CNN blob); `use_cnn=False` goes
        further and skips resolving/loading the CNN checkpoint entirely
        (MLP-only by choice: no CNN weights on device, no CNN-vs-MLP
        config cross-validation against a model that won't run).
        `pitch_prior_weight>0`
        enables the YIN pitch prior on the ensemble (see
        predictor.apply_pitch_prior) — off by default for reference
        parity. `cnn_dtype=jnp.bfloat16` runs the CNN forward in bf16
        (weights stay f32): measured +10% throughput at batch ≥1024 on
        v5e with 100% label agreement, but −5% at the batch-256 sweet
        spot, so f32 stays the default — docs/PERF.md.

        `mesh` (a jax.sharding.Mesh, e.g. parallel.make_mesh(N)) runs
        the BATCH serving path (`transcribe_files`, so `serve.py
        --mesh N`) data-parallel over it: weights replicate once,
        file waves shard over the `data` axis (each device segments
        and transcribes its own files end-to-end, no cross-device
        traffic), and wave sizes floor at the data-axis size so every
        dispatch divides evenly. Same results as single-device
        (pure data parallelism — tested bit-equal on the virtual
        mesh). Single-file paths (`transcribe`) ignore the mesh: one
        file has no batch axis to shard."""
        self.feature_builder = FeatureBuilder()
        self.predictor = NotePredictor(cnn_weight=cnn_weight,
                                       pitch_prior_weight=pitch_prior_weight,
                                       cnn_dtype=cnn_dtype)
        # program cache: check-then-build runs under a lock so
        # concurrent callers (serve --http_dispatchers N share one
        # Transcriber) agree on ONE jit wrapper per key — two wrappers
        # for the same program would each pay the multi-minute first
        # compile instead of the second caller reusing the first's
        import threading
        self._fused_cache: dict = {}
        self._fused_lock = threading.Lock()

        mlp_root = Path(mlp_root) if mlp_root else MLP_CONFIG.CHECKPOINTS_DIR
        cnn_root = Path(cnn_root) if cnn_root else CNN_CONFIG.CHECKPOINTS_DIR
        mlp_path = (Path(mlp_ckpt) if mlp_ckpt and Path(mlp_ckpt).is_file()
                    else mlp_root / (mlp_ckpt or MLP_CONFIG.DEFAULT_CKPT_NAME))
        cnn_path = (Path(cnn_ckpt) if cnn_ckpt and Path(cnn_ckpt).is_file()
                    else cnn_root / (cnn_ckpt or CNN_CONFIG.DEFAULT_CKPT_NAME))

        _hint = ("; shipped checkpoints live in a repo checkout's data/ — "
                 "run from a checkout (pip install -e .) or set "
                 "GAT_TPU_DATA_ROOT to its data/ dir")
        if not mlp_path.is_file():
            raise FileNotFoundError(
                f"[Transcriber] Missing MLP checkpoint: {mlp_path}{_hint}")
        if use_cnn and require_cnn and not cnn_path.is_file():
            raise FileNotFoundError(
                f"[Transcriber] Missing CNN checkpoint: {cnn_path}{_hint}")

        self.model_ckpts = {"mlp": load_checkpoint(mlp_path)}
        if use_cnn and cnn_path.is_file():
            self.model_ckpts["cnn"] = load_checkpoint(cnn_path)

        self.model_configs = {k: v.get("config")
                              for k, v in self.model_ckpts.items()}
        if any(not c for c in self.model_configs.values()):
            raise ValueError("[Transcriber] Checkpoints missing 'config' "
                             "field.")

        srs = {c["target_sr"] for c in self.model_configs.values()}
        if len(srs) > 1:
            raise ValueError("[Transcriber] Target SR mismatch.")
        self.ckpt_sr = int(srs.pop())
        cls = {float(c.get("clip_length", CLIP_DURATION))
               for c in self.model_configs.values()}
        if len(cls) > 1:
            raise ValueError("[Transcriber] Checkpoint clip_length mismatch: "
                             f"{sorted(cls)} — these models saw different "
                             "clip durations in training.")
        # checkpoints are the source of truth (like target_sr above): the
        # trained clip duration drives slicing defaults in transcribe*()
        self.clip_length = cls.pop()

        sc = self.model_ckpts["mlp"].get("scaler")
        self.scaler = FeatureScaler.from_dict(sc) if sc is not None else None

        self.predictor.load_models(self.model_ckpts.get("mlp"),
                                   self.model_ckpts.get("cnn"))

        self.mesh = mesh
        self._data_par = 1
        if mesh is not None:
            # replicate weights over the mesh ONCE (the per-dispatch
            # alternative would re-place them every wave); the new dicts'
            # id()s key fresh _fused_cache entries automatically
            from ..parallel.mesh import replicated, DATA
            self._data_par = int(mesh.shape[DATA])
            rep = replicated(mesh)
            self.predictor.mlp_variables = jax.device_put(
                self.predictor.mlp_variables, rep)
            if self.predictor.cnn_variables is not None:
                self.predictor.cnn_variables = jax.device_put(
                    self.predictor.cnn_variables, rep)

    # ------------------------------------------------------------------
    def _feature_params(self):
        mfcc_params = self.model_configs["mlp"]["features"]["params"]
        cnn_cfg = self.model_configs.get("cnn")
        melspec_params = (cnn_cfg["features"]["params"] if cnn_cfg
                          else None)
        return mfcc_params, melspec_params

    def _fused_file_fn(self, target_sr: int, clip_duration: float,
                       max_onsets: int, cand_budget: int | None = None):
        """One jit program: whole (padded) waveform → masked clip probs,
        YIN pitches, onsets, kept mask — segmentation, clip re-rating,
        features, both model forwards, ensemble and the DSP baseline with
        no intermediate host round trip (the north-star 'raw waveform to
        pitch label is one traced graph'). Cached per parameter set; jit
        re-specializes per padded audio length (lengths are bucketed to
        whole seconds by the caller)."""
        # key includes mutable predictor state: a changed ensemble weight,
        # label map, or freshly loaded variables must rebuild the closure,
        # or the fused path would silently serve stale weights. The cache
        # value pins the keyed variables dicts, so a freed dict's id()
        # can never alias an old entry.
        rm = self.predictor.reverse_map
        key = (target_sr, clip_duration, max_onsets, cand_budget,
               self.predictor.cnn_weight,
               self.predictor.pitch_prior_weight,
               self.predictor.pitch_prior_sigma,
               tuple(sorted(rm.items())) if rm else None,
               id(self.predictor.mlp_variables),
               id(self.predictor.cnn_variables))
        with self._fused_lock:
            if key in self._fused_cache:
                return self._fused_cache[key][0]

            mfcc_params, melspec_params = self._feature_params()
            if "cnn" not in self.model_ckpts:
                melspec_params = None
            from .pipeline import build_files_fn
            # the single-file fused program IS the batch body at B=1:
            # one copy of the parity-critical recipe (EOF zero-tail
            # mask, segment, re-rate, ensemble, YIN) shared with the
            # serving path
            body = build_files_fn(
                self.predictor, self.scaler, self.ckpt_sr, mfcc_params,
                melspec_params, target_sr, clip_duration, max_onsets,
                cand_budget=cand_budget)

            @jax.jit
            def run(y, n_valid):
                outs = body(y[None], jnp.asarray(n_valid)[None])
                return tuple(o[0] if o is not None else None
                             for o in outs)

            self._fused_cache[key] = (run, self.predictor.mlp_variables,
                                      self.predictor.cnn_variables)
            return run

    def _fused_files_fn(self, target_sr: int, clip_duration: float,
                        max_onsets: int,
                        wave_clip_budget: int | None = None,
                        cand_budget: int | None = None):
        """One jit program over a BATCH of padded waveforms (B, n):
        per-file segmentation under vmap (the greedy onset scans advance
        all B lanes per step, amortizing the sequential frame walk), then
        ONE flat (B·K, L) clip batch through re-rating, features, both
        forwards, the ensemble, and the YIN baseline — the clip-batch
        sweet-spot regime instead of per-file small batches. Returns
        per-file (B, K, ...) outputs. Cached like _fused_file_fn
        (one entry per parameter set; jit re-specializes per
        (B, n) shape on its own)."""
        rm = self.predictor.reverse_map
        key = ("files", target_sr, clip_duration, max_onsets,
               wave_clip_budget, cand_budget, id(self.mesh),
               self.predictor.cnn_weight,
               self.predictor.pitch_prior_weight,
               self.predictor.pitch_prior_sigma,
               tuple(sorted(rm.items())) if rm else None,
               id(self.predictor.mlp_variables),
               id(self.predictor.cnn_variables))
        with self._fused_lock:
            if key in self._fused_cache:
                return self._fused_cache[key][0]

            mfcc_params, melspec_params = self._feature_params()
            if "cnn" not in self.model_ckpts:
                melspec_params = None
            from .pipeline import build_files_fn
            body = build_files_fn(
                self.predictor, self.scaler, self.ckpt_sr, mfcc_params,
                melspec_params, target_sr, clip_duration, max_onsets,
                wave_clip_budget=wave_clip_budget,
                cand_budget=cand_budget)
            scan_body = (lambda yss, nvs: jax.lax.scan(
                lambda _, xs: (None, body(*xs)), None, (yss, nvs))[1])
            if self.mesh is not None:
                # data-parallel serving: the file batch shards over
                # `data` (B leading for full waves, axis 1 under the
                # scan's (K, B, n) super-batch — K stays a device-local
                # scan), weights already replicated by __init__; XLA
                # inserts no collectives because each device's files
                # are independent end-to-end
                from ..parallel.mesh import (data_sharding,
                                             data_sharding_axis)
                run = jax.jit(body, in_shardings=(
                    data_sharding(self.mesh, 2),
                    data_sharding(self.mesh, 1)))
                run_scan = jax.jit(scan_body, in_shardings=(
                    data_sharding_axis(self.mesh, 1, 3),
                    data_sharding_axis(self.mesh, 1, 2)))
            else:
                run = jax.jit(body)
                # scanned variant: K file-batches per dispatch,
                # serialized on-device via ONE lax.scan over (K, B, n)
                # — the micro-batch dispatch amortization that won the
                # clip path (docs/PERF.md "Scanned micro-batches"),
                # applied to the serving path (VERDICT r2 §next-2)
                run_scan = jax.jit(scan_body)

            self._fused_cache[key] = ((run, run_scan),
                                      self.predictor.mlp_variables,
                                      self.predictor.cnn_variables)
            return run, run_scan

    @staticmethod
    def _dispatch_pow2_wave(run, entries, n_bucket: int, b_floor: int = 2):
        """Dispatch one wave of (y, n_valid) entries through a batched
        files program: pad to power-of-two B with silent zero rows
        (n_valid=0 → no onsets, so padding never changes results), stack,
        run, and return ALL outputs in one host transfer (each
        np.asarray on a device array is a separate blocking ~30 ms
        tunnel round trip). Shared by the bucket remainder loop and the
        exact-fallback re-dispatches so the pad/nv semantics exist
        exactly once.

        B floors at 2, so a B=1 program never exists in the family: a
        lone file (single-file exact fallback, a mixed-duration bucket's
        singleton, a 5-file group's remainder) rides the B=2 program the
        serve warmup already compiled — one zero row costs microseconds,
        a fresh B=1 jit through the tunnel costs minutes on the first
        live request. `b_floor` raises the floor when a mesh shards B
        over the data axis: every dispatch pads to a multiple of it
        (equal to the pow2 max for pow2 floors, the common case)."""
        b = max(2, 1 << (len(entries) - 1).bit_length())
        if b_floor > 1:
            b = -(-b // b_floor) * b_floor
        ys = jnp.stack([y for y, _ in entries]
                       + [jnp.zeros((n_bucket,), jnp.float32)]
                       * (b - len(entries)))
        nv = jnp.asarray([n for _, n in entries]
                         + [0] * (b - len(entries)), jnp.int32)
        return jax.device_get(run(ys, nv))

    def _build_result(self, probs, mlp_p, cnn_p, pitch, kept, onsets,
                      times, target_sr: int, empty_ok: bool = False,
                      overflow=False) -> dict:
        """Assemble the per-file result dict from fused-graph outputs
        (budget-slot arrays + kept mask), mirroring transcribe_clips'
        schema. `onset_overflow` surfaces budget truncation (earliest
        onsets kept) so pathological audio can't drop notes silently."""
        overflow = bool(np.asarray(overflow))
        kept_np = np.asarray(kept)
        if not kept_np.any():
            if not empty_ok:
                raise ValueError("[transcribe] No clips survived slicing.")
            # schema-consistent empties: per_model_probs entries are
            # (0, C) arrays for LOADED models (None only when the model
            # is absent), exactly like the non-empty branch — consumers
            # that concatenate/shape-inspect across a batch must not
            # TypeError on the one silent file in it
            c = np.asarray(probs).shape[1:]
            return {"indices": np.zeros(0, np.int64), "labels": [],
                    "confidences": np.zeros(0, np.float32),
                    "probs": np.zeros((0,) + c, np.float32),
                    "per_model_probs": {
                        "mlp": np.zeros((0,) + c, np.float32),
                        "cnn": (np.zeros((0,) + c, np.float32)
                                if cnn_p is not None else None)},
                    "dsp_info": [], "onsets_s": [], "times": [],
                    "onset_overflow": overflow}
        probs = np.asarray(probs)[kept_np]
        idx = probs.argmax(axis=1)
        rm = self.predictor.reverse_map
        result = {
            "indices": idx,
            "labels": ([rm[int(i)] for i in idx] if rm
                       else [int(i) for i in idx]),
            "confidences": probs[np.arange(len(idx)), idx],
            "probs": probs,
            "per_model_probs": {
                "mlp": np.asarray(mlp_p)[kept_np],
                "cnn": (np.asarray(cnn_p)[kept_np]
                        if cnn_p is not None else None),
            },
            "dsp_info": [],
        }
        for hz in np.asarray(pitch)[kept_np]:
            midi, name, midi_f = estimate_note(float(hz))
            result["dsp_info"].append((float(hz), {
                "midi": midi, "note_name": name, "midi_float": midi_f}))
        result["onsets_s"] = (np.asarray(onsets)[kept_np]
                              / float(target_sr)).tolist()
        result["times"] = np.asarray(times)[kept_np].tolist()
        result["onset_overflow"] = overflow
        return result

    def transcribe_files(self, paths, target_sr: int = TARGET_SR,
                         clip_duration: float | None = None,
                         max_onsets: int = DEFAULT_MAX_ONSETS,
                         max_batch: int = DEFAULT_MAX_BATCH,
                         wave_clip_budget: int | None | str = "auto",
                         cand_budget: int | None | str = "auto",
                         exact_fallback: bool = True,
                         max_onsets_ceiling: int | None = 1024
                         ) -> list[dict]:
        """Batch transcription of MANY files (the serving path;
        `tools/serve.py --batch`). Files group into power-of-two DURATION
        buckets (1, 2, 4, … s — one 10-minute file no longer pads a wave
        of 5 s files, and the (B, n) compile space is log-bounded), are
        resampled to `target_sr` (exact: the polyphase filter
        zero-extends edges either way), and dispatch per bucket in waves
        of up to `max_batch` files (B = next power of two; dummy rows
        carry n_valid=0 → no onsets). When a bucket holds several FULL
        waves, they run as ONE device dispatch via a lax.scan over the
        (K, B, n) super-batch — the micro-batch amortization from the
        clip path; K is decomposed into power-of-two chunks so it is
        log-bounded like B and n (a raw K would compile a fresh program
        per distinct wave count). Files with no surviving clips yield a result with
        empty labels instead of raising (batch semantics). Returns one
        result dict per input path, in order.

        max_batch default 4: the B sweep on v5e put waves of 4 (a
        512-slot ensemble batch) ahead of 8 (75.2k vs 64.1k audio-s/s) —
        docs/PERF.md. `wave_clip_budget` caps how many clip slots per
        wave run the ensemble (kept slots compact to the front; overflow
        raises the flag); None = every slot computed. `cand_budget`
        sizes the per-wave onset candidate scan (the serving-speed
        lever — see segment_waveform); truncation raises the same
        per-file `onset_overflow` flag, never silent.

        Budgets default to "auto" = AGGRESSIVE (wave_clip_budget 3/4 of
        the wave's slots, cand_budget the proportional onset default),
        backed by `exact_fallback` (VERDICT r3 §next-2): any file whose
        overflow an exact re-run could CHANGE (the fused program's
        `fixable` flag) is transparently re-dispatched through the EXACT
        program (full-length candidate scan, every clip slot computed) —
        so the common case gets the aggressive budgets' speed while
        flagged files get provably exact results. Cap-only flags
        (`max_onsets` itself truncated) skip the re-dispatch entirely:
        the exact scan provably returns the same first max_onsets onsets
        (pick_onsets_from_envelope's repairability contract), so after
        fallback the only `onset_overflow` flags left are genuine
        `max_onsets` truncations. Pass exact_fallback=False to keep raw
        budget semantics (flags surface, nothing re-runs).

        Those surviving cap truncations are then repaired too: the
        reference's per-onset loop has no cap at all (ref
        version_1/source/audio/slicing.py:147-165 slices EVERY detected
        onset), so each file still flagged after the exact pass
        re-dispatches ONCE through the exact program at the pow2
        `max_onsets` that fits its detected count (`_next_onset_cap`;
        the count is exact under cap-only overflow), clamped to
        `max_onsets_ceiling` — the compile family stays log-bounded,
        the common case never pays for dense-file headroom, files
        grouped per target cap share a dispatch, and a flag that
        survives now means the file has more than `max_onsets_ceiling`
        onsets (raise the ceiling, or pass None/0 to disable
        auto-scaling and keep raw cap semantics)."""
        if clip_duration is None:
            clip_duration = self.clip_length  # checkpoint-trained duration
        if self._data_par > 1 and max_batch % self._data_par:
            # mesh serving shards each wave's B over the data axis, so
            # waves must divide it: round max_batch up (each device then
            # handles max_batch // data_par files per dispatch)
            max_batch = -(-max_batch // self._data_par) * self._data_par
        if isinstance(wave_clip_budget, str):
            if wave_clip_budget != "auto":
                raise ValueError(f"wave_clip_budget must be an int, None, "
                                 f"or 'auto'; got {wave_clip_budget!r}")
            wave_clip_budget = max(1, (max_batch * max_onsets * 3) // 4)
        if isinstance(cand_budget, str):
            if cand_budget != "auto":
                raise ValueError(f"cand_budget must be an int, None, or "
                                 f"'auto'; got {cand_budget!r}")
            cand_budget = None  # the proportional default (ops/onset.py)
        paths = list(paths)
        if not paths:
            return []
        from ..utils.native_wav import read_wav_batch
        decoded = read_wav_batch(paths)  # threaded native decode
        buckets: dict[int, list[tuple[int, jnp.ndarray, int]]] = {}
        for idx, (y_raw, sr_in) in enumerate(decoded):
            y_np = np.asarray(y_raw, np.float32)
            n_raw = int(y_np.shape[-1])
            sec = max(1, -(-n_raw // sr_in))  # whole seconds (ceil)
            bsec = bucket_seconds(sec)  # duration bucket (pow2 s)
            if n_raw < sec * sr_in:
                # whole-second pad on the HOST, pre-upload: device-side
                # padding would compile a fresh jnp.pad program per raw
                # length, so steady-state serving of never-seen lengths
                # would recompile forever; quantized to whole seconds,
                # the device signatures (resample + bucket pad) are the
                # bounded (sec, sr_in)/(sec, bsec) families
                y_np = np.pad(y_np, (0, sec * sr_in - n_raw))
            y = resample(jnp.asarray(y_np), sr_in, target_sr)
            y = fix_length(y, bsec * target_sr)  # sec·target_sr → bucket
            nv = -(-n_raw * target_sr // sr_in)
            buckets.setdefault(bsec, []).append((idx, y, nv))

        results: list[dict | None] = [None] * len(paths)
        fixable: list[bool] = [False] * len(paths)
        n_det: list[int] = [0] * len(paths)

        def _emit(idx, o):
            # o = per-file tuple (probs, mlp, cnn|None, pitch, kept,
            # onsets, times, overflow, fixable, n_detected), on the host
            results[idx] = self._build_result(
                o[0], o[1], o[2], o[3], o[4], o[5], o[6], target_sr,
                empty_ok=True, overflow=o[7])
            fixable[idx] = bool(np.asarray(o[8]))
            n_det[idx] = int(np.asarray(o[9]))

        def _run_bucket(fns, group, n_bucket):
            """One bucket through a (run, run_scan) program pair: full
            waves of max_batch scan together in power-of-two K chunks so
            the scan-length axis is log-bounded like B and n (a raw K
            would compile a fresh program per distinct wave count); the
            remainder (or a small group) dispatches on its own padded
            power-of-two B. ONE host transfer per dispatch:
            _build_result reads ~8 arrays per file, and each np.asarray
            on a device array is a separate blocking round trip over the
            ~30 ms tunnel — a K-chunk would pay K·B·8 of them after
            compute finished. Shared by the budgeted primary pass and
            the exact-fallback pass (same shapes, different program)."""
            bfns, bscan = fns
            k_full = len(group) // max_batch
            off = 0
            while k_full >= 2:
                kc = 1 << (k_full.bit_length() - 1)  # largest pow2 ≤ k
                chunk = group[off:off + kc * max_batch]
                stack = jnp.stack(
                    [y for _, y, _ in chunk]
                ).reshape(kc, max_batch, n_bucket)
                nvs = jnp.asarray(
                    [nv for _, _, nv in chunk],
                    jnp.int32).reshape(kc, max_batch)
                outs = jax.device_get(bscan(stack, nvs))
                for kk in range(kc):
                    wave = chunk[kk * max_batch:(kk + 1) * max_batch]
                    for j, (idx, _, _) in enumerate(wave):
                        _emit(idx, tuple(
                            o[kk][j] if o is not None else None
                            for o in outs))
                off += kc * max_batch
                k_full -= kc
            group = group[off:]
            for w0 in range(0, len(group), max_batch):
                wave = group[w0:w0 + max_batch]
                outs = self._dispatch_pow2_wave(
                    bfns, [(y, nv) for _, y, nv in wave], n_bucket,
                    b_floor=self._data_par)
                for j, (idx, _, _) in enumerate(wave):
                    _emit(idx, tuple(
                        o[j] if o is not None else None for o in outs))

        fns = self._fused_files_fn(target_sr, clip_duration, max_onsets,
                                   wave_clip_budget, cand_budget)
        for bsec in sorted(buckets):
            _run_bucket(fns, buckets[bsec], bsec * target_sr)

        if exact_fallback:
            # re-dispatch on the FIXABLE bit, not the raw overflow flag:
            # a cap-only file (max_onsets itself truncated) provably gets
            # the same first max_onsets onsets from the exact program
            # (pick_onsets_from_envelope's repairability contract), so an
            # exact re-run is pure waste — its surviving flag already
            # tells the caller to raise max_onsets
            fset = {i for i, f in enumerate(fixable) if f}
            if fset:
                # exact program: full-length candidate scan (cand 0),
                # every clip slot computed (budget None). Flagged files
                # re-run through the SAME bucket runner — regrouped into
                # waves of max_batch and scan-amortized when many files
                # flag (dense content over the ~30 ms tunnel would
                # otherwise pay one round trip per flagged wave), and the
                # (pow2 B, pow2 K, pow2-seconds n) signatures stay inside
                # the fast path's bounded compile family
                exact_fns = self._fused_files_fn(
                    target_sr, clip_duration, max_onsets, None, 0)
                for bsec, group in buckets.items():
                    rerun = [e for e in group if e[0] in fset]
                    if rerun:
                        _run_bucket(exact_fns, rerun, bsec * target_sr)
            # cap auto-scaling: flags that survive the exact pass are
            # genuine max_onsets truncations — the reference's slicer has
            # no cap (it loops over every detected onset), so re-dispatch
            # each still-flagged file at the pow2 cap that FITS its
            # detected count (n_detected is exact whenever the candidate
            # bits are clean, which cap-only overflow guarantees — a
            # 1000-onset file pays ONE re-dispatch at 1024, not a ladder
            # of doublings and their one-time compiles), grouped per cap
            # so a mixed-density batch pays one dispatch per distinct
            # cap. The compile family stays the pow2 caps ≤ ceiling;
            # only flagged (rare, dense) files ever pay for headroom. A
            # file denser than the ceiling gets one final run AT the
            # ceiling — the most onsets honesty allows — and keeps its
            # flag (its cap stops growing, so the loop exits).
            if max_onsets_ceiling:
                caps = {i: max_onsets for i in range(len(paths))}
                while True:
                    todo: dict[int, set[int]] = {}
                    for i, r in enumerate(results):
                        if r is None or not r["onset_overflow"]:
                            continue
                        m = _next_onset_cap(n_det[i], caps[i],
                                            max_onsets_ceiling)
                        if m is not None:
                            todo.setdefault(m, set()).add(i)
                    if not todo:
                        break
                    for m, fset_m in sorted(todo.items()):
                        fns_m = self._fused_files_fn(
                            target_sr, clip_duration, m, None, 0)
                        for bsec, group in buckets.items():
                            rerun = [e for e in group if e[0] in fset_m]
                            if rerun:
                                _run_bucket(fns_m, rerun,
                                            bsec * target_sr)
                        for i in fset_m:
                            caps[i] = m
        return results

    def transcribe_clips(self, clips_ckpt_sr: jnp.ndarray) -> dict:
        """Batched core: clips already at checkpoint SR, (N, L) →
        prediction dict + batched YIN baseline. All device compute; the
        mel branch is skipped entirely in MLP-only operation."""
        mfcc_params, melspec_params = self._feature_params()
        if "cnn" not in self.model_ckpts:
            melspec_params = None
        mf, ms = self.feature_builder.extract_inference_features_from_clips(
            clips_ckpt_sr, self.ckpt_sr, mfcc_params, melspec_params,
            self.scaler)
        pitch_dev = yin_pitch(clips_ckpt_sr, self.ckpt_sr)
        # ONE blocking transfer for the ensemble outputs AND the pitch
        # track (a separate np.asarray(pitch_dev) after predict() would
        # be a second ~30 ms tunnel round trip per file on the default
        # single-file path)
        probs, mlp_p, cnn_p, pitches = jax.device_get(
            (*self.predictor.ensemble_probs(mf, ms, pitch_hz=pitch_dev),
             pitch_dev))
        result = self.predictor._result_dict(probs, mlp_p, cnn_p)

        pitches = np.asarray(pitches)
        result["dsp_info"] = []
        for hz in pitches:
            midi, name, midi_f = estimate_note(float(hz))
            result["dsp_info"].append((float(hz), {
                "midi": midi, "note_name": name, "midi_float": midi_f}))
        return result

    def transcribe(self, audio_path, out_root=INFERENCE_OUTPUT_ROOT,
                   audio_name: str = "transcribe_audio",
                   target_sr: int = TARGET_SR,
                   clip_duration: float | None = None,
                   save_clips: bool = False,
                   max_onsets: int = DEFAULT_MAX_ONSETS,
                   fused: bool = False,
                   exact_fallback: bool = True,
                   cand_budget: int | None = None,
                   max_onsets_ceiling: int | None = 1024) -> dict:
        """Full transcription of one audio file (ref transcribe.py:77-144):
        slice at `target_sr`, re-rate clips to the checkpoint SR, extract
        features with checkpoint params, ensemble-predict, YIN baseline.

        fused=True: the whole chain runs as ONE device program over the
        padded waveform (audio lengths bucket to whole seconds to bound
        recompilation), at the cost of computing every max_onsets budget
        slot. Measured per-file latency favors the two-stage path on both
        CPU (28 vs 136 ms — budget-slot compute dominates) and the
        tunneled TPU (21 vs 116 ms — extra result transfers dominate),
        so two-stage is the default; fused remains available for
        co-located serving where host↔device hops are microseconds.
        save_clips always uses the two-stage path (the clips must visit
        the host anyway).

        `exact_fallback` (default on, same contract as transcribe_files):
        if the onset candidate budget's overflow flag raises, the file
        re-runs through the exact program (full-length candidate scan) —
        a surviving flag means `max_onsets` itself truncated, and that is
        then repaired too by re-running with pow2-doubled max_onsets up
        to `max_onsets_ceiling` (the reference slicer has no cap; None/0
        disables, a flag that survives means > ceiling onsets).
        `cand_budget` sizes the onset candidate scan exactly as in
        transcribe_files (None = the proportional default)."""
        if clip_duration is None:
            clip_duration = self.clip_length  # checkpoint-trained duration
        y, sr_in = read_wav(audio_path)

        # whole-second host pad BEFORE resample (both branches; same
        # quantization as transcribe_files): device program signatures
        # specialize per LENGTH, so an unquantized path would compile a
        # fresh program family for every never-seen raw duration —
        # minutes each on a tunneled TPU, unbounded jit-cache growth on
        # a serving box. Padding costs one n_valid mask instead (the
        # EOF zero-tail contract, padded-vs-exact parity in
        # docs/PARITY.md); the polyphase filter zero-extends edges
        # either way, so the first n samples are identical —
        # regression-tested in test_infer.
        y_np = np.asarray(y, np.float32)
        n_raw = int(y_np.shape[-1])
        sec = max(1, -(-n_raw // sr_in))
        if n_raw < sec * sr_in:
            y_np = np.pad(y_np, (0, sec * sr_in - n_raw))
        n = -(-n_raw * target_sr // sr_in)  # true resampled length

        if fused and not save_clips:
            y_pad = resample(jnp.asarray(y_np), sr_in, target_sr)
            run = self._fused_file_fn(target_sr, clip_duration, max_onsets,
                                      cand_budget)
            (probs, mlp_p, cnn_p, pitch, kept, onsets, times, ovf, fix,
             nd) = jax.device_get(run(y_pad, jnp.asarray(n)))  # 1 transfer
            if exact_fallback and bool(np.asarray(fix)):
                # exact re-run: full-length candidate scan through the
                # SINGLE-FILE program family (cand_budget is part of its
                # cache key; y_pad is already whole-second shaped) — a
                # B=1 batched files program here would compile a second,
                # distinct program per duration for nothing: the fused
                # file program already computes every slot
                exact_run = self._fused_file_fn(target_sr, clip_duration,
                                                max_onsets, 0)
                (probs, mlp_p, cnn_p, pitch, kept, onsets, times, ovf, _,
                 nd) = jax.device_get(exact_run(y_pad, jnp.asarray(n)))
            # cap auto-scaling: a surviving flag is a genuine max_onsets
            # truncation — re-run at the pow2 cap that FITS the detected
            # count (n_detected is exact once the candidate bits are
            # clean, which cap-only overflow guarantees), so a 1000-onset
            # file pays ONE re-dispatch, not a ladder of doublings. The
            # loop only repeats if the count was still censored (never
            # with a clean scan); m grows strictly, bounded by the
            # ceiling. Same contract as transcribe_files.
            m_prev = max_onsets
            while exact_fallback and bool(np.asarray(ovf)):
                # denser than the ceiling: one final run AT the ceiling
                # returns the most onsets honesty allows, then the flag
                # survives (the next cap is None → loop exits)
                m = _next_onset_cap(int(nd), m_prev, max_onsets_ceiling)
                if m is None:
                    break
                run_m = self._fused_file_fn(target_sr, clip_duration, m, 0)
                (probs, mlp_p, cnn_p, pitch, kept, onsets, times, ovf, _,
                 nd) = jax.device_get(run_m(y_pad, jnp.asarray(n)))
                m_prev = m
            return self._build_result(probs, mlp_p, cnn_p, pitch, kept,
                                      onsets, times, target_sr,
                                      overflow=ovf)

        # stays on device (jnp.asarray on a device array is free; at equal
        # rates resample no-ops to the host array and this is the single
        # upload): an np.asarray here would block-download the whole
        # waveform over the tunnel only to re-upload it for segmentation
        y22 = jnp.asarray(resample(jnp.asarray(y_np), sr_in, target_sr))
        nv = jnp.asarray(n, jnp.int32)  # dynamic: no per-length recompile
        # one device->host transfer for all six segmentation outputs (the
        # per-array np.asarray calls below would each be a blocking ~30 ms
        # tunnel round trip on the default single-file path)
        (clips, kept, onsets, ovalid, times, overflow, cap,
         nd) = jax.device_get(
            segment_waveform(y22, sr=target_sr, length_sec=clip_duration,
                             max_onsets=max_onsets,
                             n_valid_samples=nv,
                             cand_budget=cand_budget))
        if exact_fallback and bool(np.asarray(overflow)) \
                and not bool(np.asarray(cap)):
            # candidate-budget overflow: re-segment with the full-length
            # exact scan (cand_budget=0); a flag that survives is a
            # genuine max_onsets truncation. Cap-only overflow skips the
            # re-run — the exact scan provably returns the same first
            # max_onsets onsets (pick_onsets_from_envelope contract)
            clips, kept, onsets, ovalid, times, overflow, _, nd = \
                jax.device_get(segment_waveform(
                    y22, sr=target_sr, length_sec=clip_duration,
                    max_onsets=max_onsets, n_valid_samples=nv,
                    cand_budget=0))
        # cap auto-scaling: a flag that survives (or was cap-only from
        # the start) is a genuine max_onsets truncation — re-segment ONCE
        # at the pow2 cap that fits the detected count (exact when the
        # candidate bits are clean), clamped to the ceiling; see the
        # fused branch above for the loop contract
        m_prev = max_onsets
        while exact_fallback and bool(np.asarray(overflow)):
            m = _next_onset_cap(int(nd), m_prev, max_onsets_ceiling)
            if m is None:
                break  # ceiling reached/disabled: honest flag survives
            clips, kept, onsets, ovalid, times, overflow, _, nd = \
                jax.device_get(segment_waveform(
                    y22, sr=target_sr, length_sec=clip_duration,
                    max_onsets=m, n_valid_samples=nv, cand_budget=0))
            m_prev = m
        kept_np = np.asarray(kept)
        clips_np = np.asarray(clips)[kept_np]
        if clips_np.shape[0] == 0:
            raise ValueError("[transcribe] No clips survived slicing.")

        if save_clips:
            out_root = Path(out_root)
            stamp = datetime.now().strftime("%m-%d_%H-%M-%S")
            out_dir = out_root / f"{audio_name}_{stamp}" / audio_name
            onsets_np = np.asarray(onsets)
            idx_kept = np.flatnonzero(kept_np)
            for i in idx_kept:
                AudioSlicer.save_clip(np.asarray(clips)[i], target_sr,
                                      out_dir, int(i),
                                      onsets_np[i] / target_sr)

        # adopt the checkpoint's sample rate (ref transcribe.py:113-121)
        clips_ckpt = resample(jnp.asarray(clips_np), target_sr, self.ckpt_sr)
        clips_ckpt = fix_length(clips_ckpt,
                                int(self.ckpt_sr * clip_duration))
        result = self.transcribe_clips(clips_ckpt)
        result["onsets_s"] = (np.asarray(onsets)[kept_np]
                              / float(target_sr)).tolist()
        result["times"] = np.asarray(times)[kept_np].tolist()
        result["onset_overflow"] = bool(np.asarray(overflow))
        return result

    def transcribe_note(self, audio, clip_duration: float | None = None,
                        sr_in: int = TARGET_SR) -> dict:
        """Single in-memory note (ref transcribe.py:147-199): resample to
        the checkpoint SR, zero-pad/trim to clip_duration, batch-of-1
        features, predict."""
        if clip_duration is None:
            clip_duration = self.clip_length  # checkpoint-trained duration
        audio = jnp.asarray(audio, jnp.float32)
        if sr_in != self.ckpt_sr:
            audio = resample(audio, sr_in, self.ckpt_sr)
        audio = fix_length(audio, int(clip_duration * self.ckpt_sr))

        mfcc_params, melspec_params = self._feature_params()
        if "cnn" not in self.model_ckpts:
            melspec_params = None
        mf, ms = self.feature_builder.extract_inference_features_from_audio(
            audio, self.ckpt_sr, mfcc_params, melspec_params, self.scaler)
        hz = (yin_pitch(audio[None], self.ckpt_sr)
              if self.predictor.pitch_prior_weight > 0 else None)
        return self.predictor.predict(mf, ms, pitch_hz=hz)
