from pathlib import Path

import numpy as np
import pytest

from gat_tpu.infer import Transcriber, NotePredictor
from gat_tpu.train.checkpoint import load_checkpoint
from gat_tpu.utils.wavio import write_wav
from tests.conftest import make_pluck

NATIVE_MLP = Path(__file__).resolve().parent.parent / \
    "data/checkpoints/mlp/mlp_v1.0.0.gtckpt.npz"

SR = 22050
# notes the reference MLP classifies confidently from synthetic plucks;
# the final note only feeds the last-onset quirk (it is always dropped)
NOTES = [(0.4, 110.0, "A2"), (1.1, 146.83, "D3"), (1.8, 196.0, "G3"),
         (2.5, 246.94, "B3"), (3.2, 329.63, "E4")]


def _riff(notes=NOTES, dur=None):
    dur = dur or (notes[-1][0] + 0.8)
    y = np.zeros(int(dur * SR), np.float32)
    for t0, f, _ in notes:
        n = make_pluck(f, SR, 0.45, seed=int(f))
        fade = int(0.3 * len(n))
        n[-fade:] *= np.linspace(1, 0, fade, dtype=np.float32)
        s = int(t0 * SR)
        y[s:s + len(n)] += n
    return y


@pytest.fixture(scope="module")
def transcriber():
    return Transcriber(mlp_ckpt=str(NATIVE_MLP), require_cnn=False)


def test_ctor_validates_missing_ckpt():
    with pytest.raises(FileNotFoundError):
        Transcriber(mlp_ckpt="/nonexistent/m.npz", require_cnn=False)


def test_transcriber_adopts_ckpt_sr(transcriber):
    # shipped checkpoint was trained at 11025 while live config says 22050;
    # checkpoint wins (ref transcribe.py:113-116)
    assert transcriber.ckpt_sr == 11025
    assert transcriber.scaler is not None


def test_transcribe_file_end_to_end(tmp_path, transcriber):
    """Synthetic riff → slicing → features → imported reference MLP →
    SPN labels. The last note is sacrificed to the reference's
    final-onset quirk; every other note must label correctly and agree
    with the YIN baseline."""
    y = _riff()
    p = tmp_path / "riff.wav"
    write_wav(p, y, SR)
    result = transcriber.transcribe(p)
    labels = result["labels"]
    expected = [n for _, _, n in NOTES[:-1]]
    assert labels == expected, f"{labels} != {expected}"
    # YIN baseline agrees (ASCII vs unicode naming differ only on sharps)
    yin_names = [info["note_name"] for _, info in result["dsp_info"]]
    assert yin_names == expected
    assert all(c > 0.2 for c in result["confidences"])
    assert result["probs"].shape == (4, 47)


def test_transcribe_saves_clips(tmp_path, transcriber):
    y = _riff(NOTES[:3])
    p = tmp_path / "r.wav"
    write_wav(p, y, SR)
    out = tmp_path / "out"
    transcriber.transcribe(p, out_root=out, save_clips=True,
                           audio_name="r")
    clips = list(out.glob("r_*/r/*.wav"))
    assert len(clips) == 2  # 3 onsets − final-onset quirk


def test_transcribe_note_array(transcriber):
    note = make_pluck(110.0, SR, 0.5, seed=7)
    result = transcriber.transcribe_note(note, sr_in=SR)
    assert result["labels"] == ["A2"]
    # already at ckpt SR → no resample branch
    note11 = make_pluck(110.0, 11025, 0.5, seed=7)
    r2 = transcriber.transcribe_note(note11, sr_in=11025)
    assert r2["labels"] == ["A2"]


def test_predictor_requires_some_features():
    p = NotePredictor()
    p.load_models(load_checkpoint(NATIVE_MLP), None)
    with pytest.raises(ValueError):
        p.predict(None, None)


def test_predict_debug_weight_sweep(transcriber):
    note = make_pluck(146.83, SR, 0.5, seed=3)
    from gat_tpu.ops.resample import resample
    from gat_tpu.features import mfcc_feature_vectors
    import jax.numpy as jnp
    c = np.asarray(resample(note, SR, 11025))[:5512]
    mf = transcriber.scaler.transform(
        mfcc_feature_vectors(jnp.asarray(c)[None], 11025))
    preds = transcriber.predictor.predict_debug([0.0], np.asarray(mf))
    # with cnn absent, weight 0.0 → pure MLP
    assert preds[0][1]["labels"] == ["D3"]


def test_fused_matches_two_stage(tmp_path, transcriber):
    """The one-graph fused file path must produce the same labels,
    confidences, YIN notes, and onsets as the two-stage path."""
    y = _riff()
    p = tmp_path / "fz.wav"
    write_wav(p, y, SR)
    r_f = transcriber.transcribe(p, fused=True)
    r_2 = transcriber.transcribe(p, fused=False)
    assert r_f["labels"] == r_2["labels"]
    np.testing.assert_allclose(r_f["confidences"], r_2["confidences"],
                               atol=1e-5)
    assert [i["note_name"] for _, i in r_f["dsp_info"]] == \
        [i["note_name"] for _, i in r_2["dsp_info"]]
    assert r_f["onsets_s"] == r_2["onsets_s"]
    np.testing.assert_allclose(r_f["per_model_probs"]["mlp"],
                               r_2["per_model_probs"]["mlp"], atol=1e-5)


def test_transcribe_files_matches_single(tmp_path, transcriber):
    """Batched multi-file transcription must agree with the single-file
    path per file — mixed lengths, a silent file (empty result, no
    raise), order preserved, and a non-power-of-two batch size."""
    paths = []
    riffs = [_riff(NOTES[:3]), _riff(), np.zeros(int(1.3 * SR), np.float32)]
    for i, y in enumerate(riffs):
        p = tmp_path / f"f{i}.wav"
        write_wav(p, y, SR)
        paths.append(p)
    batch = transcriber.transcribe_files(paths)
    assert len(batch) == 3
    for p, rb in zip(paths[:2], batch[:2]):
        r1 = transcriber.transcribe(p)
        assert rb["labels"] == r1["labels"], (p, rb["labels"], r1["labels"])
        np.testing.assert_allclose(rb["confidences"], r1["confidences"],
                                   atol=1e-5)
        assert rb["onsets_s"] == r1["onsets_s"]
        assert [i_["note_name"] for _, i_ in rb["dsp_info"]] == \
            [i_["note_name"] for _, i_ in r1["dsp_info"]]
    # silent file: empty result, not an exception
    assert batch[2]["labels"] == []
    assert batch[2]["probs"].shape[0] == 0
    assert transcriber.transcribe_files([]) == []


@pytest.mark.parametrize("dur", [0.04, 0.2])
def test_ultra_short_audio_clean_error(tmp_path, transcriber, dur):
    """Sub-clip-length files must fail with the clean no-clips error,
    never a shape/pad crash."""
    sr = 22050
    y = (0.3 * np.sin(2 * np.pi * 220 * np.arange(int(dur * sr)) / sr)
         ).astype(np.float32)
    p = tmp_path / "short.wav"
    write_wav(p, y, sr)
    with pytest.raises(ValueError, match="No clips survived"):
        transcriber.transcribe(p)


def test_predict_debug_does_not_mutate_weights():
    from gat_tpu.infer import Transcriber
    t = Transcriber()
    w0 = t.predictor.cnn_weight
    note = make_pluck(196.0, SR, 0.5, seed=9)
    r = t.transcribe_note(note, sr_in=SR)
    t.predictor.predict_debug([1.0, 0.5, 0.0],
                              np.zeros((1, 65), np.float32))
    assert t.predictor.cnn_weight == w0


def test_cnn_bf16_inference_label_parity():
    """cnn_dtype=bfloat16 (the large-batch serving option, docs/PERF.md)
    must plumb through to the CNN module and agree with f32 labels."""
    import jax.numpy as jnp
    from gat_tpu.infer import Transcriber
    t32 = Transcriber()
    t16 = Transcriber(cnn_dtype=jnp.bfloat16)
    assert t16.predictor.cnn.dtype == jnp.bfloat16
    assert t32.predictor.cnn.dtype == jnp.float32
    for f, note in ((110.0, "A2"), (196.0, "G3"), (329.63, "E4")):
        clip = make_pluck(f, SR, 0.5, seed=11)
        a = t32.transcribe_note(clip, sr_in=SR)["labels"]
        b = t16.transcribe_note(clip, sr_in=SR)["labels"]
        assert a == b == [note]


def test_results_carry_onset_overflow_flag(tmp_path, transcriber):
    """Every result dict exposes onset_overflow; a roomy budget reads
    False, a starved one (max_onsets=2 on a 5-note riff, cap
    auto-scaling disabled) True — through the two-stage path AND the
    batched files path."""
    y = _riff()
    p = tmp_path / "ovf.wav"
    write_wav(p, y, SR)
    r = transcriber.transcribe(p)
    assert r["onset_overflow"] is False
    r2 = transcriber.transcribe(p, max_onsets=2, max_onsets_ceiling=None)
    assert r2["onset_overflow"] is True
    rb = transcriber.transcribe_files([p], max_onsets=2,
                                      max_onsets_ceiling=None)[0]
    assert rb["onset_overflow"] is True
    assert rb["labels"] == r2["labels"]


def test_transcribe_files_buckets_mixed_durations(tmp_path, transcriber):
    """Duration bucketing: a long file must not pad the short files'
    wave — results still match the single-file path per file and return
    in input order (short, long, short interleaved)."""
    short_a = _riff(NOTES[:3])                    # ~2.6 s → bucket 4
    long_y = _riff(NOTES, dur=9.5)                # 9.5 s → bucket 16
    short_b = _riff(NOTES[:2])                    # ~1.9 s → bucket 2
    paths = []
    for i, y in enumerate([short_a, long_y, short_b]):
        p = tmp_path / f"mix{i}.wav"
        write_wav(p, y, SR)
        paths.append(p)
    batch = transcriber.transcribe_files(paths)
    assert len(batch) == 3
    for p, rb in zip(paths, batch):
        r1 = transcriber.transcribe(p)
        assert rb["labels"] == r1["labels"]
        assert rb["onsets_s"] == r1["onsets_s"]


def test_transcribe_files_scanned_waves_match(tmp_path, transcriber):
    """When one bucket holds several full waves, the scanned (K, B, n)
    dispatch must produce per-file results identical to per-wave
    dispatch (max_batch=2 over 6 same-length files → 3 full waves,
    decomposed into a K=2 scan chunk + one plain wave so compiled K
    values stay power-of-two/log-bounded)."""
    paths = []
    for i in range(6):
        y = _riff(NOTES[:3])
        p = tmp_path / f"scan{i}.wav"
        write_wav(p, y, SR)
        paths.append(p)
    batch = transcriber.transcribe_files(paths, max_batch=2)
    single = transcriber.transcribe(paths[0])
    for rb in batch:
        assert rb["labels"] == single["labels"]
        np.testing.assert_allclose(rb["confidences"],
                                   single["confidences"], atol=1e-5)


def test_wave_clip_budget_exact_below_and_flags_above(tmp_path,
                                                      transcriber):
    """Wave clip-budget compaction: with a budget that covers every kept
    clip the results are IDENTICAL to the exact path; with a starved
    budget every file keeps its EARLIEST clips, the budget spreads
    fairly across the wave's files, and the overflow flag raises."""
    paths = []
    for i in range(2):
        y = _riff(NOTES[:4])
        p = tmp_path / f"wb{i}.wav"
        write_wav(p, y, SR)
        paths.append(p)
    exact = transcriber.transcribe_files(paths, max_onsets=8)
    roomy = transcriber.transcribe_files(paths, max_onsets=8,
                                         wave_clip_budget=8)
    for re_, rr in zip(exact, roomy):
        assert rr["labels"] == re_["labels"]
        np.testing.assert_allclose(rr["confidences"], re_["confidences"],
                                   atol=1e-5)
        assert rr["onsets_s"] == re_["onsets_s"]
        assert rr["onset_overflow"] is False
    starved = transcriber.transcribe_files(paths, max_onsets=8,
                                           wave_clip_budget=3,
                                           exact_fallback=False)
    counts = [len(r["labels"]) for r in starved]
    assert sum(counts) == 3
    assert any(r["onset_overflow"] for r in starved)
    # fair interleave: each file keeps its earliest clips, and the
    # budget spreads across the wave (no file starved by another)
    assert max(counts) - min(counts) <= 1
    for rs, re_ in zip(starved, exact):
        assert rs["labels"] == re_["labels"][:len(rs["labels"])]


def test_exact_fallback_redispatches_flagged_files(tmp_path, transcriber):
    """VERDICT r3 §next-2: with exact_fallback (the default), files whose
    overflow flag raised under a starved budget are transparently re-run
    through the exact program — results equal the cand_budget=0 /
    wave_clip_budget=None run, flags cleared. Five same-bucket files so
    the BATCHED fallback regroups them into pow2 waves (4 + 1) rather
    than five B=1 dispatches."""
    paths = []
    for i in range(5):
        y = _riff(NOTES[:4])
        p = tmp_path / f"fb{i}.wav"
        write_wav(p, y, SR)
        paths.append(p)
    exact = transcriber.transcribe_files(paths, max_onsets=8,
                                         wave_clip_budget=None,
                                         cand_budget=0,
                                         exact_fallback=False)
    # starved wave budget AND starved candidate scan both force flags;
    # the fallback must repair them to the exact results
    fixed = transcriber.transcribe_files(paths, max_onsets=8,
                                         wave_clip_budget=3, cand_budget=1)
    for rf, re_ in zip(fixed, exact):
        assert rf["onset_overflow"] is False
        assert rf["labels"] == re_["labels"]
        np.testing.assert_allclose(rf["confidences"], re_["confidences"],
                                   atol=1e-5)
        assert rf["onsets_s"] == re_["onsets_s"]
    # with cap auto-scaling disabled, the irreparable overflow
    # (max_onsets itself) keeps its flag even after the exact
    # re-dispatch — honesty preserved
    still = transcriber.transcribe_files([paths[0]], max_onsets=2,
                                         max_onsets_ceiling=None)[0]
    assert still["onset_overflow"] is True


def test_cap_only_overflow_skips_exact_redispatch(tmp_path, transcriber,
                                                  monkeypatch):
    """A file whose ONLY overflow is the max_onsets cap is provably
    unchanged by the exact program (pick_onsets_from_envelope's
    repairability contract), so exact_fallback must NOT pay a re-dispatch
    for it — the flag survives to say 'raise max_onsets' — while a
    candidate-starved file still re-runs. Spied via _fused_files_fn:
    the exact program is the (wave_clip_budget=None, cand_budget=0)
    build."""
    y = _riff()  # 5 notes; max_onsets=2 trips ONLY the cap bit
    p = tmp_path / "cap.wav"
    write_wav(p, y, SR)
    calls: list[tuple] = []
    orig = type(transcriber)._fused_files_fn

    def spy(self, *a, **kw):
        calls.append((a, kw))
        return orig(self, *a, **kw)

    monkeypatch.setattr(type(transcriber), "_fused_files_fn", spy)

    def exact_builds():
        return [c for c, kw in calls
                if len(c) >= 5 and c[3] is None and c[4] == 0]

    r = transcriber.transcribe_files([p], max_onsets=2,
                                     max_onsets_ceiling=None)[0]
    assert r["onset_overflow"] is True  # honest: cap truncation surfaced
    assert not exact_builds(), "cap-only overflow paid an exact re-run"
    # result identical to the no-fallback run (nothing was re-dispatched)
    raw = transcriber.transcribe_files([p], max_onsets=2,
                                       exact_fallback=False)[0]
    assert r["labels"] == raw["labels"]
    assert r["onsets_s"] == raw["onsets_s"]
    # ...while a candidate-budget overflow still triggers the re-dispatch
    calls.clear()
    fixed = transcriber.transcribe_files([p], max_onsets=8,
                                         cand_budget=1)[0]
    assert exact_builds(), "fixable overflow did not re-dispatch"
    assert fixed["onset_overflow"] is False


def test_cap_autoscale_repairs_max_onsets_truncation(tmp_path, transcriber):
    """Cap flags that survive the exact pass auto-repair by default: the
    reference slicer has NO onset cap (version_1/source/audio/
    slicing.py:147-165 loops over every detected onset), so still-capped
    files re-dispatch through pow2-doubled max_onsets exact programs
    until the flag clears — a tiny cap yields the same output as a roomy
    one. The ceiling bounds the compile family: a file denser than it
    keeps the honest flag and its first-`ceiling` onsets."""
    y = _riff()  # 5 notes
    p = tmp_path / "dense.wav"
    write_wav(p, y, SR)
    roomy = transcriber.transcribe_files([p], max_onsets=16)[0]
    assert roomy["onset_overflow"] is False
    auto = transcriber.transcribe_files([p], max_onsets=2)[0]
    assert auto["onset_overflow"] is False
    assert auto["labels"] == roomy["labels"]
    assert auto["onsets_s"] == roomy["onsets_s"]
    np.testing.assert_allclose(auto["confidences"], roomy["confidences"],
                               atol=1e-5)
    # ceiling hit: the flag survives and the output is the exact run's
    # first-`ceiling` onsets (prefix of the roomy result)
    low = transcriber.transcribe_files([p], max_onsets=2,
                                       max_onsets_ceiling=4)[0]
    assert low["onset_overflow"] is True
    assert low["labels"] == roomy["labels"][:len(low["labels"])]
    assert 0 < len(low["labels"]) < len(roomy["labels"])
    # single-file transcribe() carries the same contract on both paths
    for fused in (False, True):
        s = transcriber.transcribe(p, max_onsets=2, fused=fused)
        assert s["onset_overflow"] is False
        assert s["labels"] == roomy["labels"]
        assert s["onsets_s"] == roomy["onsets_s"]


def test_cap_autoscale_single_redispatch_sized_by_count(tmp_path,
                                                        transcriber,
                                                        monkeypatch):
    """Cap auto-scaling jumps straight to the pow2 cap that FITS the
    detected onset count (n_detected rides out of the fused program,
    exact under cap-only overflow) — a 5-note file at max_onsets=2 pays
    ONE cap re-dispatch at m=8, never the intermediate m=4 doubling and
    its one-time compile."""
    y = _riff()  # 5 notes
    p = tmp_path / "dense5.wav"
    write_wav(p, y, SR)
    calls: list[tuple] = []
    orig = type(transcriber)._fused_files_fn

    def spy(self, *a, **kw):
        calls.append(a)
        return orig(self, *a, **kw)

    monkeypatch.setattr(type(transcriber), "_fused_files_fn", spy)
    r = transcriber.transcribe_files([p], max_onsets=2)[0]
    assert r["onset_overflow"] is False
    # cap re-runs are the exact builds (budget None, cand 0) ABOVE the
    # requested cap; exactly one, at the count-fitting pow2
    cap_ms = [a[2] for a in calls
              if len(a) >= 5 and a[3] is None and a[4] == 0 and a[2] > 2]
    assert cap_ms == [8], f"expected one m=8 cap re-dispatch, got {cap_ms}"
    # the single-file fused path sizes its re-run the same way
    calls.clear()
    orig1 = type(transcriber)._fused_file_fn

    def spy1(self, *a, **kw):
        calls.append(a)
        return orig1(self, *a, **kw)

    monkeypatch.setattr(type(transcriber), "_fused_file_fn", spy1)
    s = transcriber.transcribe(p, max_onsets=2, fused=True)
    assert s["onset_overflow"] is False
    cap_ms1 = [a[2] for a in calls if len(a) >= 4 and a[2] > 2]
    assert cap_ms1 == [8], \
        f"single-file path: expected one m=8 re-run, got {cap_ms1}"


def test_single_file_exact_fallback(tmp_path, transcriber):
    """transcribe() carries the same exact-fallback contract as
    transcribe_files: a starved cand_budget raises the flag with
    exact_fallback=False, and with the default the file transparently
    re-runs through the exact scan — results equal the cand_budget=0
    run, flag cleared. Covers the two-stage default AND the fused
    single-graph path."""
    y = _riff(NOTES[:4])
    p = tmp_path / "sf.wav"
    write_wav(p, y, SR)
    exact = transcriber.transcribe(p, max_onsets=8, cand_budget=0)
    assert exact["onset_overflow"] is False
    for fused in (False, True):
        # budget 2: one clip survives the last-onset quirk, so the raw
        # run still returns a (flagged) result instead of raising
        raw = transcriber.transcribe(p, max_onsets=8, cand_budget=2,
                                     fused=fused, exact_fallback=False)
        assert raw["onset_overflow"] is True
        fixed = transcriber.transcribe(p, max_onsets=8, cand_budget=2,
                                       fused=fused)
        assert fixed["onset_overflow"] is False
        assert fixed["labels"] == exact["labels"]
        assert fixed["onsets_s"] == exact["onsets_s"]
        np.testing.assert_allclose(fixed["confidences"],
                                   exact["confidences"], atol=1e-5)


def test_dispatch_pow2_wave_floors_at_b2():
    """A lone file (mixed-duration bucket singleton, 5-file remainder,
    single-file exact fallback) must ride the B=2 program the serve
    warmup compiled, never a fresh B=1 signature: a cold B=1 jit through
    the tunnel stalls the first live request for minutes, while one
    zero-padded row costs microseconds."""
    import jax.numpy as jnp
    from gat_tpu.infer.transcriber import Transcriber

    shapes = []

    def fake_run(ys, nv):
        shapes.append((int(ys.shape[0]), int(nv.shape[0])))
        return (jnp.asarray(ys[:, :1]),)  # device_get-able

    Transcriber._dispatch_pow2_wave(
        fake_run, [(jnp.zeros(8, jnp.float32), 8)], 8)
    Transcriber._dispatch_pow2_wave(
        fake_run, [(jnp.zeros(8, jnp.float32), 8)] * 3, 8)
    assert shapes == [(2, 2), (4, 4)]


def test_extract_inference_features_mlp_only(tmp_path):
    """melspec_params=None on the DIRECTORY path skips the mel branch
    (MLP-only operation), matching the from_clips/from_audio contract —
    it used to coalesce None into the config defaults and run the CNN
    front-end anyway."""
    from gat_tpu.data.loader import AudioDatasetLoader
    from gat_tpu.data.synth import synthesize_note_dataset
    from gat_tpu.features import FeatureBuilder

    ds = synthesize_note_dataset(tmp_path / "ds", class_names=["A3"],
                                 variants_per_class=2, verbose=False)
    loader = AudioDatasetLoader([ds], target_sr=11025, duration=0.5)
    mf, ms = FeatureBuilder().extract_inference_features(
        loader, melspec_params=None)
    assert ms is None
    assert mf.shape[0] == 2


def test_serving_signatures_quantized_to_whole_seconds(tmp_path,
                                                       transcriber):
    """Never-seen raw lengths must NOT compile new device programs when
    they fall in an already-served whole-second bucket: padding to whole
    seconds happens on the host pre-upload, so steady-state serving of
    arbitrary-length files is compile-free (a device-side pad would key
    one jnp.pad program per raw sample count)."""
    import logging

    import jax

    p1 = tmp_path / "a.wav"
    p2 = tmp_path / "b.wav"
    two = NOTES[:3]  # onsets 0.4/1.1 fit; 1.8 feeds the last-onset quirk
    write_wav(p1, _riff(notes=two, dur=2.31), SR)   # sec bucket 3
    write_wav(p2, _riff(notes=two, dur=2.73), SR)   # same bucket, new len

    records: list[str] = []

    class _H(logging.Handler):
        def emit(self, r):
            records.append(r.getMessage())

    h = _H()
    logger = logging.getLogger("jax")
    old_level = logger.level
    jax.config.update("jax_log_compiles", True)
    logger.addHandler(h)
    logger.setLevel(logging.DEBUG)
    try:
        # warm every (B=1, sec=3) program — and use the compiles this
        # triggers as the positive control that the capture mechanism
        # actually sees jax's compile logs (otherwise the zero-compile
        # assertion below could pass vacuously after a jax upgrade)
        transcriber.transcribe_files([p1])
        transcriber.transcribe(p1, fused=True)
        warm_compiles = [m for m in records if m.startswith("Compiling")]
        assert warm_compiles, "compile-log capture saw nothing during "\
            "warm-up — the mechanism is broken, not the serving path"
        n_warm = len(records)
        r = transcriber.transcribe_files([p2])
        rf = transcriber.transcribe(p2, fused=True)
    finally:
        jax.config.update("jax_log_compiles", False)
        logger.removeHandler(h)
        logger.setLevel(old_level)
    assert r[0]["labels"] and rf["labels"]
    compiles = [m for m in records[n_warm:] if m.startswith("Compiling")]
    assert not compiles, compiles


def test_fused_parity_with_energy_at_eof(tmp_path, transcriber):
    """Non-whole-second 44.1 kHz file with sustained energy right at EOF:
    the fused paths pad to whole seconds BEFORE resampling, so polyphase
    edge continuation leaks nonzero samples past the true length — the
    programs' entry mask must zero [n, bucket) or a clip window crossing
    EOF diverges from the unpadded two-stage path."""
    sr_in = 44100
    y = np.zeros(int(1.7 * sr_in), np.float32)
    for t0, f in [(0.3, 110.0), (0.85, 146.83)]:
        n = make_pluck(f, sr_in, 0.45, seed=int(f))
        fade = int(0.3 * len(n))
        n[-fade:] *= np.linspace(1, 0, fade, dtype=np.float32)
        s = int(t0 * sr_in)
        y[s:s + len(n)] += n
    # sustained tone to the very last sample (no fade): its clip window
    # crosses EOF, and the resampler's continuation past EOF is nonzero
    s = int(1.25 * sr_in)
    t = np.arange(len(y) - s, dtype=np.float32) / sr_in
    tail = (0.3 * np.sin(2 * np.pi * 196.0 * t)).astype(np.float32)
    tail[:256] *= np.linspace(0, 1, 256, dtype=np.float32)
    y[s:] += tail
    p = tmp_path / "eof.wav"
    write_wav(p, y, sr_in)
    r_f = transcriber.transcribe(p, fused=True)
    r_2 = transcriber.transcribe(p, fused=False)
    rs = transcriber.transcribe_files([p])[0]
    assert r_f["labels"] == r_2["labels"] == rs["labels"]
    np.testing.assert_allclose(r_f["confidences"], r_2["confidences"],
                               atol=1e-6)
    np.testing.assert_allclose(rs["confidences"], r_2["confidences"],
                               atol=1e-6)
    np.testing.assert_allclose(r_f["per_model_probs"]["mlp"],
                               r_2["per_model_probs"]["mlp"], atol=1e-6)


def test_ctor_rejects_clip_length_mismatch(tmp_path):
    """Checkpoints that saw different clip durations in training must not
    silently ensemble (the same source-of-truth rule as target_sr)."""
    from gat_tpu.config import MLP_CONFIG
    from gat_tpu.train.checkpoint import save_checkpoint
    d = load_checkpoint(MLP_CONFIG.CHECKPOINTS_DIR
                        / MLP_CONFIG.DEFAULT_CKPT_NAME)
    d["config"]["clip_length"] = 1.0  # default CNN ckpt stores 0.5
    p = tmp_path / "mlp_long.gtckpt.npz"
    save_checkpoint(p, d)
    with pytest.raises(ValueError, match="clip_length"):
        Transcriber(mlp_ckpt=str(p))


def test_clip_duration_defaults_to_checkpoint(transcriber):
    """transcribe*() slice at the checkpoint-trained duration by default
    (checkpoints are the source of truth, like target_sr)."""
    assert transcriber.clip_length == 0.5


def test_load_models_rejects_label_map_mismatch(tmp_path):
    """Same class count, different ordering: the positional softmax blend
    would mislabel silently, so the ensemble must refuse to load."""
    from gat_tpu.config import CNN_CONFIG
    from gat_tpu.train.checkpoint import save_checkpoint
    d = load_checkpoint(CNN_CONFIG.CHECKPOINTS_DIR
                        / CNN_CONFIG.DEFAULT_CKPT_NAME)
    rm = {int(k): v for k, v in d["reverse_map"].items()}
    rm[0], rm[1] = rm[1], rm[0]
    d["reverse_map"] = rm
    p = tmp_path / "cnn_swapped.gtckpt.npz"
    save_checkpoint(p, d)
    with pytest.raises(ValueError, match="label map"):
        Transcriber(cnn_ckpt=str(p))


def test_transcribe_files_rejects_negative_wave_clip_budget(
        tmp_path, transcriber):
    """A negative wave_clip_budget would Python-slice the compaction
    argsort from the END, silently dropping kept clips — must raise
    like cand_budget does."""
    p = tmp_path / "r.wav"
    write_wav(p, _riff(), SR)
    with pytest.raises(ValueError, match="wave_clip_budget"):
        transcriber.transcribe_files([p], wave_clip_budget=-1)


def test_concurrent_cold_cache_builds_one_program(tmp_path):
    """serve --http_dispatchers N shares one Transcriber across threads:
    concurrent FIRST uses of an uncached (duration, budget) key must
    agree on ONE jit wrapper (the check-then-build runs under
    _fused_lock) — two wrappers would each pay the full cold compile —
    and every thread's result must be correct."""
    import threading

    p = tmp_path / "r.wav"
    write_wav(p, _riff(), SR)
    t = Transcriber()
    assert not t._fused_cache  # cold

    results, errs = [], []

    def go():
        try:
            # fused=True is the path that populates the single-file
            # program cache (the default two-stage path uses
            # module-level jits); transcribe_files exercises the
            # "files" key the HTTP dispatchers actually share
            results.append((list(t.transcribe(p, fused=True)["labels"]),
                            list(t.transcribe_files([p])[0]["labels"])))
        except Exception as e:  # noqa: BLE001 — surfaced by the assert
            errs.append(repr(e))

    threads = [threading.Thread(target=go) for _ in range(4)]
    for x in threads:
        x.start()
    for x in threads:
        x.join(timeout=300)
    assert not errs, errs
    assert len(results) == 4
    assert all(r == results[0] and r[0] for r in results)
    # exactly one entry per program key; no duplicate/overwritten builds
    single_keys = [k for k in t._fused_cache if k[0] != "files"]
    files_keys = [k for k in t._fused_cache if k[0] == "files"]
    assert len(single_keys) == 1, list(t._fused_cache)
    assert len(files_keys) == 1, list(t._fused_cache)


def test_transcribe_two_stage_quantizes_program_shapes(tmp_path,
                                                       transcriber,
                                                       monkeypatch):
    """Two raw durations inside the same whole-second bucket must reach
    segment_waveform with the SAME padded length and distinct n_valid
    masks (round-5 review): an unquantized single-file path compiles a
    fresh device program family for every never-seen raw duration —
    minutes each on a tunneled TPU, unbounded jit-cache growth on a
    serving box — while the padded-vs-exact parity contract
    (docs/PARITY.md) keeps the results identical."""
    import gat_tpu.infer.transcriber as tr_mod
    seen = []
    orig = tr_mod.segment_waveform

    def spy(y, **kw):
        nv = kw.get("n_valid_samples")
        seen.append((int(y.shape[-1]), None if nv is None else int(nv)))
        return orig(y, **kw)

    monkeypatch.setattr(tr_mod, "segment_waveform", spy)
    labels = []
    for i, dur in enumerate((3.71, 3.832)):
        y = _riff(NOTES[:3], dur=dur)
        p = tmp_path / f"quant_{i}.wav"
        write_wav(p, y, SR)
        labels.append(transcriber.transcribe(p)["labels"])
    assert labels[0] == labels[1] == [n for _, _, n in NOTES[:2]]
    lens = {ln for ln, _ in seen}
    assert lens == {4 * SR}, f"unquantized segment shapes: {seen}"
    nvs = [nv for _, nv in seen]
    assert all(nv is not None for nv in nvs), seen
    assert nvs[0] != nvs[1]  # true lengths differ; the program shape not


def test_inference_honors_checkpoint_to_db():
    """The checkpoint-embedded TO_DB melspec param is honored at
    inference (round-5 review): a CNN trained on linear-power mels
    (TO_DB=False in its checkpoint) must not be fed dB-scaled inputs.
    A params dict without the key (legacy checkpoint) keeps dB on."""
    import jax.numpy as jnp
    from gat_tpu.features import FeatureBuilder
    from gat_tpu.ops.spectral import amplitude_to_db_torchaudio

    fb = FeatureBuilder()
    rng = np.random.default_rng(3)
    clips = jnp.asarray(rng.normal(size=(2, 5512)).astype(np.float32))
    mfccp = {"N_MFCC": 64, "NORMALIZE_AUDIO_VOLUME": True,
             "ADD_PITCH_FEATURES": True}
    msp = {"N_MELS": 64, "N_FFT": 2048, "HOP_LENGTH": 256,
           "NORMALIZE_AUDIO_VOLUME": True}

    _, ms_legacy = fb.extract_inference_features_from_clips(
        clips, 11025, mfccp, dict(msp))
    _, ms_db = fb.extract_inference_features_from_clips(
        clips, 11025, mfccp, {**msp, "TO_DB": True})
    _, ms_lin = fb.extract_inference_features_from_clips(
        clips, 11025, mfccp, {**msp, "TO_DB": False})
    np.testing.assert_allclose(np.asarray(ms_legacy), np.asarray(ms_db))
    # linear-power mels relate to the dB ones by exactly the dB map
    np.testing.assert_allclose(
        np.asarray(amplitude_to_db_torchaudio(ms_lin[..., 0],
                                              stype="power")),
        np.asarray(ms_db[..., 0]), atol=1e-4)
    # the single-clip path honors the same key
    _, ms1 = fb.extract_inference_features_from_audio(
        np.asarray(clips[0]), 11025, mfccp, {**msp, "TO_DB": False})
    np.testing.assert_allclose(np.asarray(ms1[0]), np.asarray(ms_lin[0]),
                               atol=1e-5)
