import numpy as np
import pytest
import jax.numpy as jnp

from gat_tpu.ops.onset import detect_onsets, peak_pick_mask
from gat_tpu.segment import gating
from gat_tpu.segment.slicing import segment_waveform, AudioSlicer
from gat_tpu.utils.wavio import write_wav
from tests.conftest import make_pluck


SR = 22050


def _song(onsets_s, freqs, dur=3.0, note_len=0.45):
    """Synthetic 'song': plucked notes at known onset times over silence.
    Notes are faded out so the cutoff itself doesn't register as an onset
    (a real plucked string decays; an abrupt cut is a broadband click)."""
    y = np.zeros(int(dur * SR), np.float32)
    for t0, f in zip(onsets_s, freqs):
        note = make_pluck(f, SR, note_len, seed=int(f))
        fade = int(0.3 * len(note))
        note[-fade:] *= np.linspace(1.0, 0.0, fade, dtype=np.float32)
        s = int(t0 * SR)
        y[s:s + len(note)] += note
    return y


def _peak_pick_direct(x, pre_max, post_max, pre_avg, post_avg, delta, wait):
    """Direct numpy replication of the librosa.util.peak_pick recipe,
    INCLUDING its boundary handling: maximum filter padded with x.min()
    (mode='constant', cval=x.min()) and the explicit truncated-window
    mean corrections librosa applies over the first pre_avg and last
    post_avg frames (librosa/util/utils.py peak_pick)."""
    import scipy.ndimage as ndi
    max_origin = int(np.ceil(0.5 * (pre_max - post_max)))
    avg_origin = int(np.ceil(0.5 * (pre_avg - post_avg)))
    mov_max = ndi.maximum_filter1d(x, int(pre_max + post_max),
                                   mode="constant", origin=max_origin,
                                   cval=x.min())
    mov_avg = ndi.uniform_filter1d(x, int(pre_avg + post_avg),
                                   mode="nearest", origin=avg_origin)
    n = 0
    while n - pre_avg < 0 and n < x.shape[0]:  # head correction
        start = max(n - pre_avg, 0)
        mov_avg[n] = np.mean(x[start:n + post_avg])
        n += 1
    n = max(x.shape[0] - post_avg, 0)
    while n < x.shape[0]:  # tail correction
        start = max(n - pre_avg, 0)
        mov_avg[n] = np.mean(x[start:x.shape[0]])
        n += 1
    det = x * (x == mov_max)
    det = det * (det >= mov_avg + delta)
    peaks, last = [], -np.inf
    for i in np.flatnonzero(det):
        if i > last + wait:
            peaks.append(i)
            last = i
    return np.array(peaks)


def test_peak_pick_matches_direct(rng):
    for trial in range(5):
        env = np.maximum(0, rng.normal(size=300)).astype(np.float32)
        env[rng.integers(0, 300, 12)] += rng.uniform(1, 3, 12)
        params = dict(pre_max=1, post_max=1, pre_avg=4, post_avg=5,
                      delta=0.07, wait=1)
        keep = np.asarray(peak_pick_mask(jnp.asarray(env), **params))
        ref = _peak_pick_direct(env, **params)
        np.testing.assert_array_equal(np.flatnonzero(keep), ref)


def test_peak_pick_boundary_parity(rng):
    """librosa corrects the moving average to TRUNCATED means over the
    first pre_avg / last post_avg frames — a moderate peak at the very
    start or end of the envelope is kept or dropped by that correction.
    Exercise peaks inside both boundary regions, plus a negative
    envelope (mov-max cval=x.min(), nonzero-detection semantics)."""
    params = dict(pre_max=3, post_max=1, pre_avg=4, post_avg=5,
                  delta=0.07, wait=2)
    cases = []
    # isolated leading peak in the corrected head region: librosa's
    # truncated mean (v/5) admits peaks the uncorrected 9-frame
    # edge-replicated mean (~5v/9) would reject
    for v in (0.09, 0.12, 0.157, 0.2):
        env = np.zeros(64, np.float32)
        env[0] = v
        cases.append(env)
        env2 = np.zeros(64, np.float32)
        env2[63] = v  # trailing peak in the corrected tail region
        cases.append(env2)
        env3 = np.zeros(64, np.float32)
        env3[2], env3[61] = v, v  # inside head/tail windows, not the edge
        cases.append(env3)
    for trial in range(4):  # negative stretches: the public-API case
        env = rng.normal(-1.0, 0.5, 96).astype(np.float32)
        env[rng.integers(0, 96, 6)] += rng.uniform(0.5, 2.0, 6)
        cases.append(env)
    for env in cases:
        keep = np.asarray(peak_pick_mask(jnp.asarray(env), **params))
        ref = _peak_pick_direct(env, **params)
        np.testing.assert_array_equal(np.flatnonzero(keep), ref,
                                      err_msg=f"env head={env[:6]}")


def test_compacted_scan_matches_full_scan(rng):
    """The compacted-candidate fused greedy scan (default) must agree
    exactly with a full-length-scan run (cand_budget=0) — on clean songs
    AND on dense noisy audio where candidates are plentiful."""
    songs = [_song([0.5, 1.2, 1.9], [110.0, 220.0, 330.0])]
    # dense, noisy: 10 notes in 4 s + broadband noise → many raw candidates
    times = list(np.arange(0.3, 3.9, 0.36))
    freqs = list(rng.uniform(90, 600, len(times)))
    dense = _song(times, freqs, dur=4.2, note_len=0.3)
    dense = dense + rng.normal(0, 0.01, len(dense)).astype(np.float32)
    songs.append(dense)
    for y in songs:
        o_c, v_c, *_ = detect_onsets(jnp.asarray(y), sr=SR, min_sep=0.25,
                                     max_onsets=64)
        o_f, v_f, *_ = detect_onsets(jnp.asarray(y), sr=SR, min_sep=0.25,
                                     max_onsets=64, cand_budget=0)
        np.testing.assert_array_equal(np.asarray(v_c), np.asarray(v_f))
        np.testing.assert_array_equal(np.asarray(o_c), np.asarray(o_f))


@pytest.mark.slow
def test_compacted_scan_matches_full_on_random_envelopes(rng):
    """Property check at the envelope level: for random spiky envelopes
    (many raw candidates, clustered peaks, flat stretches) the compacted
    scan must equal the full scan whenever the candidate count fits the
    budget — across backtrack on/off and different min_sep."""
    from gat_tpu.ops.onset import pick_onsets_from_envelope
    for trial in range(8):
        t = int(rng.integers(80, 400))
        env = np.maximum(0, rng.normal(0.1, 0.3, t)).astype(np.float32)
        env[rng.integers(0, t, t // 8)] += rng.uniform(0.5, 3.0, t // 8)
        for backtrack in (True, False):
            for min_sep in (0.1, 0.4):
                a = pick_onsets_from_envelope(
                    jnp.asarray(env), SR, 512, min_sep, 32,
                    backtrack=backtrack, cand_budget=0)
                b = pick_onsets_from_envelope(
                    jnp.asarray(env), SR, 512, min_sep, 32,
                    backtrack=backtrack, cand_budget=t)  # full budget
                np.testing.assert_array_equal(np.asarray(a[0]),
                                              np.asarray(b[0]))
                np.testing.assert_array_equal(np.asarray(a[1]),
                                              np.asarray(b[1]))


def test_compacted_scan_tiny_budget_keeps_earliest():
    """Candidate-budget overflow drops the LATEST candidates (mirrors the
    earliest-first max_onsets truncation): with a budget of 2 raw
    candidates, the detected onsets are a prefix of the full result."""
    y = _song([0.4, 1.1, 1.8], [146.83, 196.0, 246.94])
    o_f, v_f, *_ = detect_onsets(jnp.asarray(y), sr=SR, cand_budget=0)
    o_t, v_t, *_ = detect_onsets(jnp.asarray(y), sr=SR, cand_budget=2)
    full = np.asarray(o_f)[np.asarray(v_f)]
    tiny = np.asarray(o_t)[np.asarray(v_t)]
    assert len(tiny) <= 2
    np.testing.assert_array_equal(tiny, full[:len(tiny)])


def test_detect_onsets_finds_notes():
    onset_times = [0.5, 1.2, 1.9]
    y = _song(onset_times, [110.0, 220.0, 330.0])
    onsets, valid, *_ = detect_onsets(jnp.asarray(y), sr=SR, min_sep=0.3)
    got = np.asarray(onsets)[np.asarray(valid)] / SR
    assert len(got) == 3, f"got onsets at {got}"
    for t_exp, t_got in zip(onset_times, got):
        # backtracking can land slightly before the attack
        assert abs(t_got - t_exp) < 0.1, f"{t_exp} vs {t_got}"


def test_detect_onsets_min_separation():
    # two notes 0.15 s apart with min_sep=0.3 → only the first survives
    y = _song([0.5, 0.65, 1.5], [110.0, 165.0, 220.0])
    onsets, valid, *_ = detect_onsets(jnp.asarray(y), sr=SR, min_sep=0.3)
    got = np.asarray(onsets)[np.asarray(valid)] / SR
    diffs = np.diff(got)
    assert np.all(diffs >= 0.3)


def test_padded_detection_matches_exact():
    """Fixed-budget padding with n_valid_samples must not change onsets."""
    y = _song([0.5, 1.2, 1.9], [110.0, 220.0, 330.0])
    o1, v1, *_ = detect_onsets(jnp.asarray(y), sr=SR)
    ypad = np.concatenate([y, np.zeros(SR, np.float32)])
    o2, v2, *_ = detect_onsets(jnp.asarray(ypad), sr=SR,
                               n_valid_samples=jnp.asarray(len(y)))
    got1 = np.asarray(o1)[np.asarray(v1)]
    got2 = np.asarray(o2)[np.asarray(v2)]
    np.testing.assert_array_equal(got1, got2)


def test_segment_waveform_end_to_end():
    onset_times = [0.4, 1.1, 1.8]
    y = _song(onset_times, [146.83, 196.0, 246.94])
    clips, kept, onsets, ovalid, times, *_ = segment_waveform(
        jnp.asarray(y), sr=SR)
    clips, kept = np.asarray(clips), np.asarray(kept)
    ovalid = np.asarray(ovalid)
    n_onsets = int(ovalid.sum())
    n_kept = int(kept.sum())
    assert n_onsets == 3
    # reference quirk: last onset slices against itself → empty → dropped
    assert n_kept == n_onsets - 1
    assert clips.shape[1] == int(0.5 * SR)
    # kept clips carry signal
    assert np.abs(clips[kept]).max() > 0.01
    # non-strict mode keeps the final note too
    _, kept2, *_ = segment_waveform(jnp.asarray(y), sr=SR,
                                    strict_reference_compat=False)
    assert int(np.asarray(kept2).sum()) == n_onsets


def test_block_slicing_matches_general_gather():
    """The hop-aligned row-gather slicing (onset_hop=512) must reproduce
    the general per-element-gather path bit-for-bit, including edge
    windows, the final-onset quirk, and padded tails."""
    from gat_tpu.segment.slicing import slice_at_onsets
    from gat_tpu.ops.onset import detect_onsets
    y = _song([0.4, 1.1, 1.8, 2.4], [110.0, 146.83, 196.0, 246.94],
              dur=2.95)
    ypad = np.concatenate([y, np.zeros(1000, np.float32)])
    onsets, valid, *_ = detect_onsets(jnp.asarray(ypad), sr=SR,
                                      n_valid_samples=jnp.asarray(len(y)))
    for strict in (True, False):
        a = slice_at_onsets(jnp.asarray(ypad), onsets, valid, sr=SR,
                            strict_reference_compat=strict,
                            n_valid_samples=jnp.asarray(len(y)))
        b = slice_at_onsets(jnp.asarray(ypad), onsets, valid, sr=SR,
                            strict_reference_compat=strict,
                            n_valid_samples=jnp.asarray(len(y)),
                            onset_hop=512)
        for xa, xb in zip(a, b):
            np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_gating_silences_noise_floor(rng):
    y = _song([0.5], [220.0], dur=1.5)
    noise = (rng.normal(size=len(y)) * 1e-4).astype(np.float32)
    noisy = y + noise
    gated = np.asarray(gating.gate_waveform(jnp.asarray(noisy), -32.5))
    # noise-only tail must be zeroed, note must survive
    assert np.abs(gated[: int(0.3 * SR)]).max() == 0.0
    assert np.abs(gated[int(0.5 * SR): int(0.9 * SR)]).max() > 0.01


def test_audio_slicer_file_roundtrip(tmp_path):
    y = _song([0.4, 1.1, 1.8], [146.83, 196.0, 246.94])
    write_wav(tmp_path / "song.wav", y, SR)
    slicer = AudioSlicer()
    out = tmp_path / "clips"
    onsets = slicer.slice_and_save(tmp_path / "song.wav", out, verbose=False)
    assert len(onsets) == 3
    wavs = sorted(out.glob("*.wav"))
    assert len(wavs) == 2  # last onset dropped (reference behavior)
    # filename pattern: 0000_clip__0.xxxs.wav
    assert wavs[0].name.startswith("0000_clip__")


def test_onset_overflow_flag(rng):
    """Budget truncation must be SIGNALED, never silent (VERDICT r2
    §next-4): overflow is False on clean songs with roomy budgets, True
    when either the candidate budget or max_onsets truncates, and the
    kept onsets are the earliest ones."""
    y = _song([0.4, 1.1, 1.8], [146.83, 196.0, 246.94])
    # roomy budgets: no overflow; n_kept reports the true onset count
    _, _, ovf, cap, nk = detect_onsets(jnp.asarray(y), sr=SR, max_onsets=64)
    assert not bool(ovf) and not bool(cap)
    assert int(nk) == 3
    # candidate budget of 2 on a 3-candidate song: overflow — and the
    # cap bit stays clear (an exact re-run COULD repair it)
    o_t, v_t, ovf_t, cap_t, _ = detect_onsets(jnp.asarray(y), sr=SR,
                                              cand_budget=2)
    assert bool(ovf_t) and not bool(cap_t)
    # max_onsets=2 with 3 kept onsets: overflow, earliest two kept,
    # the cap bit raised (no candidate scan can repair it) — and n_kept
    # still counts ALL 3 accepted onsets (clean candidate bits make it
    # exact), which is what cap-auto-scaling sizes its re-run from
    o_m, v_m, ovf_m, cap_m, nk_m = detect_onsets(jnp.asarray(y), sr=SR,
                                                 max_onsets=2)
    assert bool(ovf_m) and bool(cap_m)
    assert int(nk_m) == 3
    o_f, v_f, *_ = detect_onsets(jnp.asarray(y), sr=SR, max_onsets=64)
    full = np.asarray(o_f)[np.asarray(v_f)]
    np.testing.assert_array_equal(np.asarray(o_m)[np.asarray(v_m)],
                                  full[:2])
    # a pathologically dense envelope (most frames are raw candidates)
    # must set the flag through the default proportional budget
    from gat_tpu.ops.onset import pick_onsets_from_envelope
    t = 400
    env = rng.uniform(0.5, 1.0, t).astype(np.float32)
    env[::2] += 2.0  # every other frame a local max over a high floor
    _, _, ovf_d, *_ = pick_onsets_from_envelope(
        jnp.asarray(env), SR, 512, 0.0, 8, backtrack=False,
        cand_budget=16)
    assert bool(ovf_d)


def test_cap_overflow_is_unrepairable_by_exact_rescan(rng):
    """The repairability contract exact-fallback relies on
    (pick_onsets_from_envelope): whenever cap_overflow raises — even
    with a truncating candidate budget — an exact full-length scan
    returns the SAME first max_onsets onsets. Dropped candidates are
    the latest ones; their backtracked samples are ≥ every scanned
    one (bt is a cummax) and greedy keep decisions about earlier
    onsets never depend on later candidates, so they sort past the
    cap. Random spiky envelopes, both backtrack modes."""
    from gat_tpu.ops.onset import pick_onsets_from_envelope
    checked = 0
    for trial in range(10):
        t = (128, 384)[trial % 2]
        env = np.maximum(0, rng.normal(0.1, 0.4, t)).astype(np.float32)
        env[rng.integers(0, t, t // 4)] += rng.uniform(0.5, 3.0, t // 4)
        for budget in (8, 16, 32):
            for bt in (False, True):
                o_b, v_b, _, cap, _nk = pick_onsets_from_envelope(
                    jnp.asarray(env), SR, 512, 0.0, 4,
                    backtrack=bt, cand_budget=budget)
                if not bool(cap):
                    continue
                o_f, v_f, *_ = pick_onsets_from_envelope(
                    jnp.asarray(env), SR, 512, 0.0, 4,
                    backtrack=bt, cand_budget=0)
                np.testing.assert_array_equal(np.asarray(v_b),
                                              np.asarray(v_f))
                np.testing.assert_array_equal(np.asarray(o_b),
                                              np.asarray(o_f))
                checked += 1
    assert checked > 0  # the property was actually exercised


def test_segment_waveform_overflow_surfaces():
    """segment_waveform passes the flag through; a tiny max_onsets on a
    3-note song trips it."""
    y = _song([0.4, 1.1, 1.8], [146.83, 196.0, 246.94])
    *_, ovf, cap, nd = segment_waveform(jnp.asarray(y), sr=SR, max_onsets=2)
    assert bool(ovf)
    assert bool(cap)  # a max_onsets truncation is cap overflow
    assert int(nd) == 3  # ...and the true count rides along
    *_, ovf2, cap2, _ = segment_waveform(jnp.asarray(y), sr=SR,
                                         max_onsets=64)
    assert not bool(ovf2) and not bool(cap2)


def test_segment_waveform_cand_budget_knob():
    """The explicit cand_budget knob (serving-speed lever): an adequate
    budget reproduces the default's segmentation exactly, and a
    too-small one trips the overflow flag instead of failing silently."""
    y = _song([0.4, 1.1, 1.8], [146.83, 196.0, 246.94])
    clips_d, kept_d, on_d, ov_d, _, ovf_d, *_ = segment_waveform(
        jnp.asarray(y), sr=SR, max_onsets=16)
    clips_c, kept_c, on_c, ov_c, _, ovf_c, *_ = segment_waveform(
        jnp.asarray(y), sr=SR, max_onsets=16, cand_budget=64)
    assert not bool(ovf_d) and not bool(ovf_c)
    np.testing.assert_array_equal(np.asarray(kept_d), np.asarray(kept_c))
    np.testing.assert_array_equal(np.asarray(on_d)[np.asarray(ov_d)],
                                  np.asarray(on_c)[np.asarray(ov_c)])
    np.testing.assert_allclose(np.asarray(clips_d), np.asarray(clips_c))
    *_, ovf_tiny, cap_tiny, _ = segment_waveform(jnp.asarray(y), sr=SR,
                                                 max_onsets=16,
                                                 cand_budget=2)
    assert bool(ovf_tiny)
    assert not bool(cap_tiny)  # candidate truncation is repairable


def test_onset_overflow_not_flagged_when_provably_exact():
    """A candidate budget that truncates only greedy-rejected peaks must
    NOT flag overflow: the dropped (latest) candidates sit inside the
    wait window after the last kept peak, so the prefix result is
    provably the full result."""
    from gat_tpu.ops.onset import pick_onsets_from_envelope
    t, hop = 400, 64  # wait = int(0.03*SR/64) = 10 frames
    env = np.zeros(t, np.float32)
    env[100] = env[105] = 3.0  # equal peaks 5 < wait frames apart
    kw = dict(sr=SR, hop_length=hop, min_sep=0.0, max_onsets=8,
              backtrack=False)
    o_f, v_f, ovf_f, *_ = pick_onsets_from_envelope(
        jnp.asarray(env), cand_budget=0, **kw)
    o_1, v_1, ovf_1, *_ = pick_onsets_from_envelope(
        jnp.asarray(env), cand_budget=1, **kw)
    assert not bool(ovf_f)
    assert not bool(ovf_1)  # truncated, but provably unchanged
    np.testing.assert_array_equal(np.asarray(o_1)[np.asarray(v_1)],
                                  np.asarray(o_f)[np.asarray(v_f)])


def test_overflow_flag_is_sound_on_random_envelopes(rng):
    """Soundness property of the refined overflow flag: for random
    envelopes under aggressive candidate budgets, whenever the flag is
    False the truncated result must EQUAL the exact (full-budget) scan.
    (A True flag makes no claim — it may be conservative.) Covers both
    backtrack modes: backtrack=True exercises the exact dominance check
    on the TRUE backtracked sample bt[i_max] (round 4 — the frame·hop
    upper bound flagged bit-identical results)."""
    from gat_tpu.ops.onset import pick_onsets_from_envelope
    checked_unflagged = 0
    for trial in range(12):
        # two fixed lengths (not random) so jit signatures cache across
        # trials — random t compiled ~144 programs and took 76 s
        t = (128, 384)[trial % 2]
        env = np.maximum(0, rng.normal(0.1, 0.3, t)).astype(np.float32)
        env[rng.integers(0, t, t // 6)] += rng.uniform(0.5, 3.0, t // 6)
        for budget in (2, 4, 8, 16, 32, 64):
            for min_sep in (0.1, 0.4):
                for bt in (False, True):
                    o_b, v_b, ovf, *_ = pick_onsets_from_envelope(
                        jnp.asarray(env), SR, 512, min_sep, 32,
                        backtrack=bt, cand_budget=budget)
                    if bool(ovf):
                        continue
                    o_f, v_f, *_ = pick_onsets_from_envelope(
                        jnp.asarray(env), SR, 512, min_sep, 32,
                        backtrack=bt, cand_budget=0)
                    np.testing.assert_array_equal(np.asarray(v_b),
                                                  np.asarray(v_f))
                    np.testing.assert_array_equal(np.asarray(o_b),
                                                  np.asarray(o_f))
                    checked_unflagged += 1
    assert checked_unflagged > 0  # the property was actually exercised


def test_padded_detection_matches_exact_ring_to_end():
    """Batching invariance on audio that RINGS TO THE FINAL SAMPLE (the
    bucketed transcribe_files case): n_valid_samples must reproduce the
    unpadded run exactly — the padded path reconstructs the centered
    STFT's reflect edge and truncates the peak-pick filters and
    backtrack minima at the valid end."""
    y = _song([0.5, 1.2, 1.9], [110.0, 220.0, 330.0], dur=2.4)
    # a last note whose decay continues through the final sample
    note = make_pluck(196.0, SR, 0.6, seed=7)
    y2 = np.concatenate([y, note[: int(0.35 * SR)]])
    o1, v1, *_ = detect_onsets(jnp.asarray(y2), sr=SR)
    ypad = np.concatenate([y2, np.zeros(int(1.3 * SR), np.float32)])
    o2, v2, *_ = detect_onsets(jnp.asarray(ypad), sr=SR,
                               n_valid_samples=jnp.asarray(len(y2)))
    np.testing.assert_array_equal(np.asarray(o1)[np.asarray(v1)],
                                  np.asarray(o2)[np.asarray(v2)])


def test_cand_budget_rejects_negative():
    y = _song([0.5], [110.0])
    with pytest.raises(ValueError, match="cand_budget"):
        detect_onsets(jnp.asarray(y), sr=SR, cand_budget=-1)


def test_rms_gate_batched_matches_per_item(rng):
    """rms_gate on (B, n) input must equal per-item calls (thresholds are
    percentiles of each recording's own RMS distribution)."""
    Y = rng.normal(0, 0.1, (3, 8192)).astype(np.float32)
    Y[1] *= 5.0
    out = np.asarray(gating.rms_gate(jnp.asarray(Y)))
    for i in range(3):
        np.testing.assert_array_equal(
            out[i], np.asarray(gating.rms_gate(jnp.asarray(Y[i]))))
    nv = jnp.asarray([8192, 4096, 6000])
    out_v = np.asarray(gating.rms_gate(jnp.asarray(Y), n_valid_samples=nv))
    for i, n in enumerate([8192, 4096, 6000]):
        np.testing.assert_array_equal(
            out_v[i], np.asarray(gating.rms_gate(jnp.asarray(Y[i]),
                                 n_valid_samples=jnp.asarray(n))))


def test_peak_pick_long_envelope_conditioning(rng):
    """Hour-scale envelopes: the moving average must not lose precision
    to the prefix-sum magnitude. A raw float32 cumsum of a ~0.9-offset
    300k-frame envelope reaches ~2.7e5 where one ulp is ~0.03 — window
    differences would carry ~1e-2 error, flipping peaks whose margin to
    mov_avg + delta is small. The mean-centered cumsum keeps the error
    t-independent; engineered ±2e-4-margin peaks must match the float64
    direct reference exactly."""
    t = 300_000
    delta, params = 0.07, dict(pre_max=2, post_max=2, pre_avg=4,
                               post_avg=5, delta=0.07, wait=10)
    env = (0.9 + rng.uniform(0.0, 0.002, t)).astype(np.float32)
    # flat background around each peak so the truncated-window mean is
    # analytic: mean = bg + (peak - bg)/9 → threshold at delta*9/8
    thresh = delta * 9 / 8
    expected_kept = []
    for k, pos in enumerate(range(5_000, t - 5_000, 9_973)):
        env[pos - 8:pos + 9] = 0.9
        margin = 2e-4 if k % 2 == 0 else -2e-4
        env[pos] = 0.9 + thresh + margin
        if margin > 0:
            expected_kept.append(pos)
    keep = np.flatnonzero(np.asarray(peak_pick_mask(jnp.asarray(env),
                                                    **params)))
    ref = _peak_pick_direct(env.astype(np.float64), **params)
    np.testing.assert_array_equal(keep, ref)
    # the engineered positive-margin peaks are all among them
    assert set(expected_kept) <= set(keep.tolist())


def test_rms_gate_padded_bit_identical_to_exact_loud_tail(rng):
    """A zero-padded batch slot must gate BIT-identically to the
    exact-length audio — including the final frames, whose RMS windows
    cross the valid end (reference reflect-pads there; the padded slot
    used to read zeros) and whose median-smoother windows cross the
    envelope end. Loud tail = the regime where the divergence flipped
    gate decisions."""
    for nv, budget in [(40000, 65536), (65536, 65536), (65000, 65536)]:
        y = rng.normal(size=nv).astype(np.float32)
        y[-2000:] *= 5.0
        pad = np.zeros(budget, np.float32)
        pad[:nv] = y
        exact = np.asarray(gating.rms_gate(jnp.asarray(y)))
        padded = np.asarray(gating.rms_gate(jnp.asarray(pad),
                                            n_valid_samples=nv))
        np.testing.assert_array_equal(exact, padded[:nv])
        assert not padded[nv:].any()  # tail stays silent


def test_note_to_midi_octave_crossing_accidentals():
    """Accidentals carry across the octave boundary (librosa semantics):
    Cb4 is one semitone BELOW C4, B#3 one above B3."""
    from gat_tpu.ops.pitch import note_to_midi
    assert note_to_midi("C4") == 60
    assert note_to_midi("Cb4") == 59
    assert note_to_midi("B#3") == 60
    assert note_to_midi("B3") == 59
    assert note_to_midi("F#3") == 54
    assert note_to_midi("Gb3") == 54


def test_padded_detection_matches_exact_straddling_transient():
    """The top_db clamp's per-clip peak must ignore padded-only frames:
    a loud transient just before the valid end lands in a straddling
    frame (center past the last exact frame) at a higher Hann weight,
    and an unmasked peak would shift the clamp floor — and the detected
    onsets — of the padded run (review-confirmed repro)."""
    nv = 23028
    y = np.zeros(nv, np.float32)
    y[2000] = 0.02                      # quiet click: near the clamp floor
    y[nv - 2] = 1.0                     # loud transient at the valid end
    from gat_tpu.ops.onset import onset_strength
    e1 = np.asarray(onset_strength(jnp.asarray(y), SR))
    ypad = np.concatenate([y, np.zeros(2 * SR - nv % SR, np.float32)])
    t = 1 + len(ypad) // 512
    nvf = 1 + nv // 512
    vf = jnp.arange(t) < nvf
    e2 = np.asarray(onset_strength(jnp.asarray(ypad), SR,
                                   valid_frames=vf))
    np.testing.assert_array_equal(e1, e2[:len(e1)])

    o1, v1, *_ = detect_onsets(jnp.asarray(y), sr=SR)
    o2, v2, *_ = detect_onsets(jnp.asarray(ypad), sr=SR,
                               n_valid_samples=jnp.asarray(nv))
    np.testing.assert_array_equal(np.asarray(o1)[np.asarray(v1)],
                                  np.asarray(o2)[np.asarray(v2)])


def test_detect_onsets_short_audio_keeps_static_budget():
    """Envelopes with fewer frames than max_onsets must still return the
    documented (max_onsets,) static shapes — a bare [:max_onsets] slice
    silently yielded (t,) and broke cross-file stacking."""
    y = _song([0.3], [196.0], dur=1.0)  # 44 frames < 64 budget
    onsets, valid, *_ = detect_onsets(jnp.asarray(y), sr=SR,
                                      max_onsets=64)
    assert onsets.shape == (64,)
    assert valid.shape == (64,)
    got = np.asarray(onsets)[np.asarray(valid)]
    assert len(got) == 1
    # stacking against a longer file's result must now work
    y2 = _song([0.4, 1.2], [110.0, 220.0], dur=3.0)
    o2, v2, *_ = detect_onsets(jnp.asarray(y2), sr=SR, max_onsets=64)
    stacked = np.stack([np.asarray(onsets), np.asarray(o2)])
    assert stacked.shape == (2, 64)


def test_padded_vs_exact_detection_property(rng):
    """Randomized padded-vs-exact property: for random click/decay trains
    (including energy at the very end, the straddling-frame case) the
    padded-bucket run with n_valid_samples must reproduce the exact run's
    onsets AND overflow flag. Lengths are fixed per bucket so the jit
    signatures cache across trials."""
    for trial in range(8):
        nv = (int(1.3 * SR), int(2.7 * SR))[trial % 2]
        bucket = (2 * SR, 4 * SR)[trial % 2]
        y = np.zeros(nv, np.float32)
        n_clicks = int(rng.integers(2, 6))
        pos = rng.integers(0, nv - 1, n_clicks)
        for p in pos:
            amp = float(rng.uniform(0.05, 1.0))
            tail = min(nv - p, int(0.1 * SR))
            y[p:p + tail] += amp * np.exp(
                -np.arange(tail, dtype=np.float32) / (0.02 * SR))
        if trial % 3 == 0:
            y[nv - 2] += 1.0  # loud transient AT the valid end
        o1, v1, f1, c1, n1 = detect_onsets(jnp.asarray(y), sr=SR)
        ypad = np.zeros(bucket, np.float32)
        ypad[:nv] = y
        o2, v2, f2, c2, n2 = detect_onsets(jnp.asarray(ypad), sr=SR,
                                           n_valid_samples=jnp.asarray(nv))
        np.testing.assert_array_equal(np.asarray(o1)[np.asarray(v1)],
                                      np.asarray(o2)[np.asarray(v2)])
        assert bool(f1) == bool(f2)
        assert bool(c1) == bool(c2)
        assert int(n1) == int(n2)


def test_rms_envelope_tiny_valid_region_mirror_stays_in_place():
    """nv < frame_length has no exact reflect counterpart (numpy errors
    when the pad exceeds the signal); the mirror must degrade to zeros
    past the signal start (round-5 review) — the old clamped slice
    copied the signal's HEAD into the pad at a displaced offset,
    synthesizing energy ~700 samples after the valid end."""
    import jax.numpy as jnp
    from gat_tpu.segment.gating import rms_db_envelope

    frame, hop, n, nv = 2048, 512, 8192, 300
    y = np.zeros(n, np.float32)
    y[:nv] = 1.0  # loud valid region, silence after
    env = np.asarray(rms_db_envelope(jnp.asarray(y), frame, hop,
                                     smooth=False, n_valid_samples=nv))
    assert np.all(np.isfinite(env))
    # frame 0 covers the valid ones -> loud
    assert env[0] > -40.0, env[0]
    # frame 4 covers samples [1024, 3072): the proper mirror of a
    # 300-sample signal about nv-1 ends by sample ~600, so this window
    # is pure silence; the clamped-slice bug wrote ones into
    # [nv+724, nv+1024) = [1024, 1324) and lit this frame up
    assert env[4] < -150.0, env[4]


def test_melspectrogram_torchaudio_magnitude_db_scale():
    """power=1.0 + to_db must use the magnitude dB scale (20*log10):
    torchaudio pairs MelSpectrogram(power=1) with
    AmplitudeToDB(stype='magnitude') — the old hardcoded stype='power'
    halved every dB value for magnitude spectrograms (round-5 review)."""
    import jax.numpy as jnp
    from gat_tpu.ops.spectral import (melspectrogram_torchaudio,
                                      amplitude_to_db_torchaudio)

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=4096).astype(np.float32))
    raw = melspectrogram_torchaudio(y, 22050, power=1.0, to_db=False)
    db = melspectrogram_torchaudio(y, 22050, power=1.0, to_db=True)
    expect = amplitude_to_db_torchaudio(raw, stype="magnitude")
    np.testing.assert_allclose(np.asarray(db), np.asarray(expect),
                               atol=1e-5)
    # and the default power=2.0 keeps the power scale
    raw2 = melspectrogram_torchaudio(y, 22050, power=2.0, to_db=False)
    db2 = melspectrogram_torchaudio(y, 22050, power=2.0, to_db=True)
    np.testing.assert_allclose(
        np.asarray(db2),
        np.asarray(amplitude_to_db_torchaudio(raw2, stype="power")),
        atol=1e-5)
