import sys
import time
from pathlib import Path

import numpy as np
import pytest

from gat_tpu.cli import main as cli_main
from gat_tpu.utils.wavio import write_wav
from gat_tpu.utils.reports import audio_report, feature_report
from tests.conftest import make_pluck

SR = 22050
TOOLS = Path(__file__).resolve().parent.parent / "tools"
sys.path.insert(0, str(TOOLS))


def _riff_wav(path):
    y = np.zeros(int(3.2 * SR), np.float32)
    for t0, f in [(0.4, 110.0), (1.3, 196.0), (2.2, 246.94)]:
        n = make_pluck(f, SR, 0.45, seed=int(f))
        fade = int(0.3 * len(n))
        n[-fade:] *= np.linspace(1, 0, fade, dtype=np.float32)
        s = int(t0 * SR)
        y[s:s + len(n)] += n
    write_wav(path, y, SR)
    return path


def test_cli_end_to_end(tmp_path, capsys):
    p = _riff_wav(tmp_path / "riff.wav")
    rc = cli_main(["--audio", str(p), "--out", str(tmp_path / "out"),
                   "--save_results"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Transcription Results:" in out
    assert "A2" in out and "G3" in out
    txt = (tmp_path / "out" / "riff_transcription.txt").read_text()
    assert txt.startswith("0,A2")
    assert "Full result dict:" in txt


def test_cli_multi_file_batch(tmp_path, capsys):
    """Several --audio paths batch through one device program, with a
    per-file results table and per-file saved transcriptions."""
    p1 = _riff_wav(tmp_path / "one.wav")
    p2 = _riff_wav(tmp_path / "two.wav")
    rc = cli_main(["--audio", str(p1), str(p2),
                   "--out", str(tmp_path / "out"), "--save_results"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "one.wav" in out and "two.wav" in out
    assert out.count("A2") >= 2
    for stem in ("one", "two"):
        txt = (tmp_path / "out" / f"{stem}_transcription.txt").read_text()
        assert txt.startswith("0,A2")


def test_cli_duplicate_stems_do_not_clobber(tmp_path, capsys):
    """a/take.wav + b/take.wav must yield two distinct output files."""
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    p1 = _riff_wav(tmp_path / "a" / "take.wav")
    p2 = _riff_wav(tmp_path / "b" / "take.wav")
    rc = cli_main(["--audio", str(p1), str(p2),
                   "--out", str(tmp_path / "out"), "--save_results"])
    assert rc == 0
    outs = sorted((tmp_path / "out").glob("take*_transcription.txt"))
    assert [o.name for o in outs] == ["take_1_transcription.txt",
                                      "take_transcription.txt"]
    capsys.readouterr()


def test_cli_rejects_non_wav(tmp_path):
    bad = tmp_path / "x.mp3"
    bad.write_bytes(b"junk")
    with pytest.raises(ValueError, match="must be a .wav"):
        cli_main(["--audio", str(bad)])


def test_cli_missing_file_errors_directly(tmp_path):
    with pytest.raises(FileNotFoundError, match="not found"):
        cli_main(["--audio", str(tmp_path / "nope.wav")])


def test_cli_save_clips(tmp_path):
    p = _riff_wav(tmp_path / "r.wav")
    rc = cli_main(["--audio", str(p), "--out", str(tmp_path / "o"),
                   "--save_clips"])
    assert rc == 0
    assert list((tmp_path / "o").glob("r_*/r/*.wav"))


def test_dataset_creator_pipeline(tmp_path):
    """slice-all → pitch-dataset → count on synthetic 'recordings'."""
    import dataset_creator as dc

    # one recording for string 5 (A2) fret 0 with three plucks
    raw = tmp_path / "raw" / "String_5" / "Fret_0"
    raw.mkdir(parents=True)
    y = np.zeros(int(4.0 * 44100), np.float32)
    for t0 in (0.5, 1.7, 2.9):
        n = make_pluck(110.0, 44100, 0.6, seed=int(t0 * 10))
        fade = int(0.3 * len(n))
        n[-fade:] *= np.linspace(1, 0, fade, dtype=np.float32)
        s = int(t0 * 44100)
        y[s:s + len(n)] += n
    write_wav(raw / "rec.wav", y, 44100)

    clips = tmp_path / "clips"
    total = dc.slice_all_clips(tmp_path / "raw", clips)
    assert total == 3
    wavs = list(clips.glob("String_5/Fret_0/*.wav"))
    assert len(wavs) == 2  # final-onset quirk

    ds = tmp_path / "ds"
    n = dc.create_pitch_dataset(clips, ds)
    assert n == 2
    assert (ds / "A2").is_dir()
    counts = dc.count_clips(ds)
    assert counts == {"A2": 2}


def test_eda_dataset_and_features(tmp_path, capsys):
    import eda
    from gat_tpu.data.synth import synthesize_note_dataset
    ds = synthesize_note_dataset(tmp_path / "mini",
                                 class_names=["A2", "E3"],
                                 variants_per_class=4, verbose=False)
    out = eda.dataset_analysis(ds, plot_path=tmp_path / "dist.png")
    assert out["counts"] == {"A2": 4, "E3": 4}
    assert (tmp_path / "dist.png").exists()
    rep = eda.feature_analysis(ds)
    assert rep["n_samples"] == 8
    assert rep["X_nan_frac"] == 0.0


def test_reports_on_loader(tmp_path):
    from gat_tpu.data.loader import AudioDatasetLoader
    from gat_tpu.data.synth import synthesize_note_dataset
    ds = synthesize_note_dataset(tmp_path / "m", class_names=["D3"],
                                 variants_per_class=3, verbose=False)
    loader = AudioDatasetLoader([ds], target_sr=11025, duration=0.5)
    rep = audio_report(loader, print_report=False)
    # SOURCE rates, not the post-resample target (round-5 review: the
    # loader resamples everything, so reporting the returned srs could
    # never surface a rate inconsistency — the report's whole job)
    assert rep["unique_srs"] == [22050]
    assert rep["target_sr"] == 11025
    assert abs(rep["duration_mean"] - 0.5) < 0.01
    X = np.random.default_rng(0).normal(size=(6, 4))
    rep2 = feature_report(X, [0, 0, 0, 1, 1, 1], {0: "D3", 1: "E3"},
                          out_root=tmp_path, out_filename="rep.json",
                          print_report=False)
    assert (tmp_path / "rep.json").exists()
    assert rep2["per_class_counts"] == {"D3": 3, "E3": 3}


def test_serve_once(tmp_path, capsys):
    """Directory-watch serving: wavs in → JSON results out."""
    import serve as serve_mod
    import json
    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    _riff_wav(in_dir / "a.wav")
    write_wav(in_dir / "silence.wav", np.zeros(SR, np.float32), SR)
    n = serve_mod.serve(in_dir, out_dir, once=True, verbose=False)
    assert n == 2
    a = json.loads((out_dir / "a.json").read_text())
    assert a["labels"] == ["A2", "G3"]
    assert len(a["yin"]) == 2 and a["yin"][0]["note_name"] == "A2"
    s = json.loads((out_dir / "silence.json").read_text())
    assert s["labels"] == [] and "error" in s


def test_serve_batched(tmp_path):
    """--batch routes arrival waves through the batched fused multi-file
    program: same JSON results as the per-file path, garbage file falls
    back to a per-file error entry without poisoning the batch."""
    import serve as serve_mod
    import json
    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    _riff_wav(in_dir / "a.wav")
    _riff_wav(in_dir / "b.wav")
    write_wav(in_dir / "silence.wav", np.zeros(SR, np.float32), SR)
    (in_dir / "garbage.wav").write_bytes(b"not a wav" * 9)
    n = serve_mod.serve(in_dir, out_dir, once=True, verbose=False, batch=4)
    assert n == 4
    for stem in ("a", "b"):
        r = json.loads((out_dir / f"{stem}.json").read_text())
        assert r["labels"] == ["A2", "G3"]
        assert r["yin"][0]["note_name"] == "A2"
    s = json.loads((out_dir / "silence.json").read_text())
    assert s["labels"] == [] and "error" in s
    g = json.loads((out_dir / "garbage.json").read_text())
    assert g["labels"] == [] and "error" in g


def test_serve_http_endpoint(tmp_path):
    """--http mode end-to-end on a real socket: POST /transcribe with a
    .wav body returns the transcription JSON, silence returns empty
    labels + error (200, batch semantics), garbage is a 400, /healthz
    answers, unknown paths 404."""
    import json
    import threading
    import urllib.error
    import urllib.request
    import serve as serve_mod

    holder: list = []
    th = threading.Thread(
        target=serve_mod.serve_http,
        kwargs=dict(port=0, verbose=False, server_holder=holder),
        daemon=True)
    th.start()
    for _ in range(200):
        if holder:
            break
        time.sleep(0.05)
    assert holder, "http server never bound"
    port = holder[0].server_address[1]
    base = f"http://127.0.0.1:{port}"

    def post(body: bytes, path="/transcribe"):
        req = urllib.request.Request(f"{base}{path}", data=body,
                                     method="POST")
        with urllib.request.urlopen(req, timeout=120) as resp:
            return resp.status, json.loads(resp.read())

    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert json.loads(r.read()) == {"ok": True}

        p = _riff_wav(tmp_path / "riff.wav")
        status, rj = post(p.read_bytes())
        assert status == 200
        assert rj["labels"] == ["A2", "G3"]
        assert rj["yin"][0]["note_name"] == "A2"
        assert rj["onset_overflow"] is False

        silence = tmp_path / "silence.wav"
        write_wav(silence, np.zeros(SR, np.float32), SR)
        status, rj = post(silence.read_bytes())
        assert status == 200
        assert rj["labels"] == [] and "error" in rj

        with pytest.raises(urllib.error.HTTPError) as ei:
            post(b"not a wav" * 9)
        assert ei.value.code == 400
        assert json.loads(ei.value.read())["labels"] == []

        with pytest.raises(urllib.error.HTTPError) as ei:
            post(b"x", path="/nope")
        assert ei.value.code == 404
    finally:
        holder[0].shutdown()
        th.join(timeout=10)


def test_inspect_ckpt_tool(capsys):
    """Checkpoint inspector: schema summary for the shipped MLP and the
    reference-imported artifact, without loading a model."""
    from inspect_ckpt import summarize, main as inspect_main

    repo = Path(__file__).resolve().parent.parent
    shipped = repo / "data/checkpoints/mlp/mlp_synth_v1.0.0.gtckpt.npz"
    info = summarize(shipped)
    assert info["num_classes"] == 47
    assert info["n_params"] == 20143
    assert info["has_opt_state"] and info["opt_state_fingerprint"]
    assert info["classes"].startswith("47: A#2")
    assert "final" in info["val_accuracy_history"]

    imported = repo / "data/checkpoints/mlp/mlp_v1.0.0.gtckpt.npz"
    info = summarize(imported, histories=True)
    assert info["epoch"] == 7  # the reference's early-stopped run
    assert info["val_accuracy_history"][-1] == 0.99902  # parity artifact
    assert not info["has_opt_state"]

    import sys as _sys
    argv = _sys.argv
    _sys.argv = ["inspect_ckpt.py", str(shipped)]
    try:
        assert inspect_main() == 0
    finally:
        _sys.argv = argv
    assert "opt_state_fingerprint" in capsys.readouterr().out


def test_display_helpers(tmp_path):
    from gat_tpu.utils.display import (plot_waveform, plot_spectrogram,
                                       plot_series)
    y = make_pluck(196.0, 11025, 0.5, seed=0)
    plot_waveform(y, 11025, out_path=tmp_path / "w.png")
    plot_spectrogram(y, 11025, out_path=tmp_path / "s.png")
    plot_series([np.arange(5), np.arange(5)[::-1]], ["up", "down"],
                out_path=tmp_path / "c.png")
    for f in ("w.png", "s.png", "c.png"):
        assert (tmp_path / f).stat().st_size > 1000


def test_evaluate_wav_dir_report(tmp_path, capsys):
    """BYO-recordings eval (`tools/evaluate.py --wav_dir`): folders named
    after SPN labels yield folder_label_accuracy; a non-label folder still
    contributes to yin_agreement; a silent file lands as a per-file error
    entry without failing the run."""
    import sys
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent
                           / "tools"))
    from evaluate import evaluate_wav_dir
    from gat_tpu.infer import Transcriber

    def two_plucks(path, f):
        # two onsets: the final-onset quirk discards the last, leaving 1
        y = np.zeros(int(2.4 * SR), np.float32)
        for t0 in (0.4, 1.5):
            n = make_pluck(f, SR, 0.45, seed=int(f))
            fade = int(0.3 * len(n))
            n[-fade:] *= np.linspace(1, 0, fade, dtype=np.float32)
            s = int(t0 * SR)
            y[s:s + len(n)] += n
        write_wav(path, y, SR)

    wav_dir = tmp_path / "recordings"
    for label, f in [("A2", 110.0), ("G3", 196.0)]:
        d = wav_dir / label
        d.mkdir(parents=True)
        two_plucks(d / "take.wav", f)
    # unlabeled folder: counted for YIN agreement, not accuracy
    misc = wav_dir / "session1"
    misc.mkdir()
    two_plucks(misc / "riff.wav", 246.94)
    # silence: slicing yields no clips -> error entry, run continues
    write_wav(wav_dir / "quiet.wav", np.zeros(SR, np.float32), SR)

    rep = evaluate_wav_dir(Transcriber(), wav_dir)
    capsys.readouterr()
    assert rep["n_files"] == 4
    assert rep["n_clips"] == 3
    assert rep["n_labeled_clips"] == 2
    assert rep["folder_label_accuracy"] == 1.0
    assert rep["yin_agreement"] == 1.0
    by_name = {Path(e["file"]).name: e for e in rep["files"]}
    assert "error" in by_name["quiet.wav"]
    assert by_name["riff.wav"]["clips"][0]["label"] == "B3"
    assert "folder_label" not in by_name["riff.wav"]
    assert by_name["take.wav"]["folder_label"] in ("A2", "G3")

    with pytest.raises(FileNotFoundError, match="no .wav files"):
        evaluate_wav_dir(Transcriber(), tmp_path / "empty")


def test_eda_slices_audition_with_fake_sounddevice(tmp_path, monkeypatch,
                                                   capsys):
    """EDA slice audition (VERDICT r2 'missing #3', ref
    prototyping/tools/eda/data_analysis.py:106-185): a fake sounddevice
    stands in for speakers so the --play path (sd.play + sd.wait per
    clip) runs end-to-end."""
    import sys
    import types
    import eda

    plays = []
    fake_sd = types.ModuleType("sounddevice")
    fake_sd.play = lambda clip, sr: plays.append((len(clip), sr))
    fake_sd.wait = lambda: plays.append("wait")
    monkeypatch.setitem(sys.modules, "sounddevice", fake_sd)

    p = _riff_wav(tmp_path / "riff.wav")
    out = eda.slice_analysis(p, play=True)
    capsys.readouterr()
    # final-onset quirk: 3 plucks -> 2 clips, each auditioned then waited
    assert len(out) == 2
    assert [x for x in plays if x == "wait"] == ["wait", "wait"]
    clips = [x for x in plays if x != "wait"]
    assert all(sr == SR and n > 0 for n, sr in clips)
    assert all(0 < info["rms"] <= info["peak"] <= 1.0 for info in out)


def test_evaluate_set_smoke(tmp_path):
    """The eval harness end-to-end on a tiny family/stressor set: every
    accuracy field populated and in range, the pitch-prior column
    computed (tools/evaluate.py --suite full building block)."""
    import sys
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent
                           / "tools"))
    from evaluate import evaluate_set
    from gat_tpu.infer import Transcriber

    t = Transcriber()
    res = evaluate_set(t, tmp_path / "ev", 2, 9, family="fm",
                       stressor="vibrato")
    for k in ("ensemble_accuracy", "ensemble_prior_accuracy",
              "mlp_accuracy", "cnn_accuracy", "yin_accuracy"):
        assert 0.0 <= res[k] <= 1.0, (k, res[k])
    assert res["n_clips"] == 2 * 47
    # the prior must help (or tie) on the unseen FM family
    assert res["ensemble_prior_accuracy"] >= res["ensemble_accuracy"]


def test_serve_http_error_codes():
    """Transport misuse answers 411/400 with the JSON contract; internal
    failures are 5xx (not 4xx — clients must not treat a server fault as
    their own bad request)."""
    import http.client
    import json
    import threading
    import serve as serve_mod

    class Boom:  # stands in for a transcriber whose device fell over
        def transcribe(self, path):
            raise RuntimeError("device fell over")

    holder: list = []
    th = threading.Thread(
        target=serve_mod.serve_http,
        kwargs=dict(port=0, verbose=False, server_holder=holder,
                    transcriber=Boom()),
        daemon=True)
    th.start()
    for _ in range(200):
        if holder:
            break
        time.sleep(0.05)
    assert holder, "http server never bound"
    port = holder[0].server_address[1]

    def raw_post(headers: dict, body: bytes = b""):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        try:
            conn.putrequest("POST", "/transcribe",
                            skip_accept_encoding=True)
            for k, v in headers.items():
                conn.putheader(k, v)
            conn.endheaders()
            if body:
                conn.send(body)
            resp = conn.getresponse()
            return resp.status, json.loads(resp.read())
        finally:
            conn.close()

    try:
        status, rj = raw_post({})  # no Content-Length at all
        assert status == 411 and rj["labels"] == []

        status, rj = raw_post({"Content-Length": "banana"})
        assert status == 400 and "Content-Length" in rj["error"]

        status, rj = raw_post({"Content-Length": "4"}, body=b"RIFF")
        assert status == 500  # Boom.transcribe → server fault, 5xx
        assert "device fell over" in rj["error"]
    finally:
        holder[0].shutdown()
        th.join(timeout=10)


def test_serve_http_rejects_watch_folder_flags(monkeypatch, tmp_path):
    """--http with watch-folder flags must error loudly, not silently
    drop the user's levers."""
    import serve as serve_mod

    monkeypatch.setattr("sys.argv",
                        ["serve.py", "--http", "0", "--batch", "8"])
    with pytest.raises(SystemExit):
        serve_mod.main()
    monkeypatch.setattr("sys.argv",
                        ["serve.py", "--http", "0", "--cand_budget", "64"])
    with pytest.raises(SystemExit):
        serve_mod.main()


def test_data_root_env_override(tmp_path):
    """GAT_TPU_DATA_ROOT points a non-editable install at a checkout's
    data/ (checkpoints are not packaged)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, GAT_TPU_DATA_ROOT=str(tmp_path / "elsewhere"))
    out = subprocess.run(
        [sys.executable, "-c",
         "from gat_tpu import config; "
         "print(config.DATA_ROOT); print(config.CHECKPOINTS_ROOT)"],
        env=env, capture_output=True, text=True,
        cwd=TOOLS.parent, timeout=120)
    assert out.returncode == 0, out.stderr
    lines = out.stdout.strip().splitlines()
    assert lines[0] == str(tmp_path / "elsewhere")
    assert lines[1] == str(tmp_path / "elsewhere" / "checkpoints")


def _start_http(kwargs):
    import threading
    import serve as serve_mod
    holder: list = []
    th = threading.Thread(
        target=serve_mod.serve_http,
        kwargs=dict(port=0, verbose=False, server_holder=holder, **kwargs),
        daemon=True)
    th.start()
    for _ in range(200):
        if holder:
            break
        time.sleep(0.05)
    assert holder, "http server never bound"
    return holder, th, holder[0].server_address[1]


def test_serve_http_micro_batches_concurrent_requests(tmp_path):
    """--http_batch: concurrent POSTs rendezvous into ONE batched device
    dispatch (transcribe_files) instead of serializing one-by-one."""
    import json
    import threading
    import urllib.request

    calls: list[int] = []

    class Stub:
        def transcribe(self, path):
            calls.append(1)
            return {"labels": ["A2"], "confidences": [1.0]}

        def transcribe_files(self, paths, **kw):
            calls.append(len(paths))
            return [{"labels": ["A2"], "confidences": [1.0]}
                    for _ in paths]

    holder, th, port = _start_http(
        dict(transcriber=Stub(), batch=4, window_s=2.0))
    body = _riff_wav(tmp_path / "r.wav").read_bytes()
    out: list = []

    def post():
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/transcribe", data=body,
            method="POST")
        with urllib.request.urlopen(req, timeout=120) as resp:
            out.append((resp.status, json.loads(resp.read())))

    try:
        threads = [threading.Thread(target=post) for _ in range(4)]
        for x in threads:
            x.start()
        for x in threads:
            x.join(timeout=120)
        assert len(out) == 4
        assert all(s == 200 and r["labels"] == ["A2"] for s, r in out)
        assert sum(calls) == 4          # every request served once
        assert len(calls) < 4           # …and they actually coalesced
        assert max(calls) >= 2
    finally:
        holder[0].shutdown()
        th.join(timeout=10)


def test_serve_http_micro_batch_end_to_end(tmp_path):
    """Micro-batched mode with the real ensemble: two concurrent POSTs
    ride the batched fused program and both get correct labels; a bad
    body in a batch fails alone (per-request fallback), not its
    neighbor."""
    import json
    import threading
    import urllib.error
    import urllib.request

    holder, th, port = _start_http(dict(batch=2, window_s=1.0))
    body = _riff_wav(tmp_path / "r.wav").read_bytes()
    out: list = []

    def post(data):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/transcribe", data=data,
            method="POST")
        try:
            with urllib.request.urlopen(req, timeout=300) as resp:
                out.append((resp.status, json.loads(resp.read())))
        except urllib.error.HTTPError as e:
            out.append((e.code, json.loads(e.read())))

    try:
        threads = [threading.Thread(target=post, args=(body,))
                   for _ in range(2)]
        for x in threads:
            x.start()
        for x in threads:
            x.join(timeout=300)
        assert [s for s, _ in out] == [200, 200]
        assert all(r["labels"] == ["A2", "G3"] for _, r in out)

        # one good + one garbage body, concurrently: good survives
        out.clear()
        threads = [threading.Thread(target=post, args=(b,))
                   for b in (body, b"not a wav" * 9)]
        for x in threads:
            x.start()
        for x in threads:
            x.join(timeout=300)
        codes = sorted(s for s, _ in out)
        assert codes == [200, 400], out
        good = next(r for s, r in out if s == 200)
        assert good["labels"] == ["A2", "G3"]
    finally:
        holder[0].shutdown()
        th.join(timeout=10)


def test_serve_http_batch_flags_require_http(monkeypatch):
    import serve as serve_mod
    monkeypatch.setattr("sys.argv",
                        ["serve.py", "--in_dir", "i", "--out_dir", "o",
                         "--http_batch", "4"])
    with pytest.raises(SystemExit):
        serve_mod.main()


def test_serve_http_metrics_endpoint(tmp_path):
    """GET /metrics exposes Prometheus-format counters: request codes,
    wall summary, device dispatches and files-per-dispatch (so
    micro-batch efficiency is observable in production)."""
    import threading
    import urllib.request

    calls: list[int] = []

    class Stub:
        def transcribe(self, path):
            calls.append(1)
            return {"labels": ["A2"], "confidences": [1.0]}

        def transcribe_files(self, paths, **kw):
            calls.append(len(paths))
            return [{"labels": ["A2"], "confidences": [1.0]}
                    for _ in paths]

    # batch == number of posts: the wave FILLS and dispatches instantly
    # in the common case; the long window only matters for a straggler
    # thread on a loaded machine (flake-hardening — with batch=4 the
    # wave never filled, so a post scheduled later than the 2 s window
    # landed in its own wave and the dispatches<files assertion failed)
    holder, th, port = _start_http(
        dict(transcriber=Stub(), batch=3, window_s=10.0))
    base = f"http://127.0.0.1:{port}"
    body = _riff_wav(tmp_path / "r.wav").read_bytes()

    def post():
        req = urllib.request.Request(f"{base}/transcribe", data=body,
                                     method="POST")
        urllib.request.urlopen(req, timeout=120).read()

    try:
        threads = [threading.Thread(target=post) for _ in range(3)]
        for x in threads:
            x.start()
        for x in threads:
            x.join(timeout=120)
        with urllib.request.urlopen(f"{base}/metrics", timeout=30) as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            text = r.read().decode()
        lines = dict(ln.rsplit(" ", 1) for ln in text.splitlines()
                     if ln and not ln.startswith("#"))
        assert lines['gat_http_requests_total{code="200"}'] == "3"
        assert lines["gat_http_request_seconds_count"] == "3"
        assert int(lines["gat_dispatch_files_sum"]) == 3
        # coalescing observable: fewer dispatches than files
        assert int(lines["gat_device_dispatches_total"]) < 3
        assert float(lines["gat_http_request_seconds_sum"]) > 0.0
    finally:
        holder[0].shutdown()
        th.join(timeout=10)


def test_serve_http_micro_batch_stress_many_waves(tmp_path):
    """Liveness under load: 24 concurrent POSTs through a batch-4
    micro-batcher drain as several sequential waves — every request is
    served exactly once, none deadlocks waiting on the rendezvous."""
    import json
    import threading
    import urllib.request

    calls: list[int] = []

    class Stub:
        def transcribe(self, path):
            calls.append(1)
            return {"labels": ["A2"], "confidences": [1.0]}

        def transcribe_files(self, paths, **kw):
            calls.append(len(paths))
            return [{"labels": ["A2"], "confidences": [1.0]}
                    for _ in paths]

    holder, th, port = _start_http(
        dict(transcriber=Stub(), batch=4, window_s=0.05))
    body = _riff_wav(tmp_path / "r.wav").read_bytes()
    out: list = []
    olock = threading.Lock()

    def post():
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/transcribe", data=body,
            method="POST")
        with urllib.request.urlopen(req, timeout=120) as resp:
            r = json.loads(resp.read())
            with olock:
                out.append((resp.status, r["labels"]))

    try:
        threads = [threading.Thread(target=post) for _ in range(24)]
        for x in threads:
            x.start()
        for x in threads:
            x.join(timeout=120)
        assert len(out) == 24
        assert all(s == 200 and lab == ["A2"] for s, lab in out)
        assert sum(calls) == 24  # exactly once each, no drops/dupes
        assert max(calls) <= 4   # wave cap respected
    finally:
        holder[0].shutdown()
        th.join(timeout=10)


def test_enable_compilation_cache(tmp_path, monkeypatch):
    """Entry-point cache helper: explicit dir wins, creates it, and a
    later no-arg call leaves an already-configured dir untouched."""
    import jax
    from gat_tpu.utils.jaxenv import enable_compilation_cache
    orig = getattr(jax.config, "jax_compilation_cache_dir", None)
    try:
        # the suite runs on the CPU backend: the helper must decline
        # (XLA:CPU AOT cache entries pin host machine features and warn
        # about SIGILL on reload — and CPU compiles are fast anyway)
        assert enable_compilation_cache(tmp_path / "nope") is None
        d = tmp_path / "cache" / "deep"
        assert enable_compilation_cache(d, include_cpu=True) == str(d)
        assert d.is_dir()
        assert jax.config.jax_compilation_cache_dir == str(d)
        # no-arg call respects the existing configuration
        assert enable_compilation_cache(include_cpu=True) == str(d)
        # env var beats the existing configuration
        d2 = tmp_path / "env_cache"
        monkeypatch.setenv("GAT_TPU_JAX_CACHE", str(d2))
        assert enable_compilation_cache(include_cpu=True) == str(d2)
        assert d2.is_dir()
    finally:
        jax.config.update("jax_compilation_cache_dir", orig)


def test_serve_warmup_compiles_serving_programs(capsys):
    """--warmup's engine: synthesizes plucks per duration and pushes them
    through the real serving calls (batched wave program + single-file
    fallback) without error; the warm plucks produce real notes, so this
    also smoke-checks the result path."""
    import serve as serve_mod
    from gat_tpu.infer import Transcriber
    t = Transcriber()
    serve_mod.warmup(t, [1.0, 2.0], batch=2)
    out = capsys.readouterr().out
    assert "warmed 1s x2" in out and "warmed 2s x2" in out


def test_serve_warmup_flag_rejects_garbage(monkeypatch, capsys):
    import serve as serve_mod
    monkeypatch.setattr(sys, "argv",
                        ["serve.py", "--http", "0", "--warmup", "4,banana"])
    with pytest.raises(SystemExit):
        serve_mod.main()
    assert "comma-separated seconds" in capsys.readouterr().err


def test_serve_http_rejects_oversized_body(tmp_path):
    """Bodies past --http_max_mb get a 413 BEFORE being buffered, so a
    rogue Content-Length cannot make the handler allocate gigabytes."""
    import json
    import urllib.error
    import urllib.request

    class Stub:
        def transcribe(self, p):
            raise AssertionError("oversized body must never reach the "
                                 "transcriber")

    holder, th, port = _start_http(
        dict(transcriber=Stub(), max_body_mb=0.001))  # 1 KB cap
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/transcribe", data=b"x" * 4096,
            method="POST")
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(req, timeout=30)
        assert exc_info.value.code == 413
        body = json.loads(exc_info.value.read())
        assert "exceeds" in body["error"]
    finally:
        holder[0].shutdown()
        th.join(timeout=10)


def test_cli_stream_mode(tmp_path, capsys):
    """--stream runs the device-scan streaming engine on files: notes
    emitted with onset timestamps, results savable, same-stem inputs
    disambiguated like the non-stream path."""
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    p1 = _riff_wav(tmp_path / "a" / "riff.wav")
    p2 = _riff_wav(tmp_path / "b" / "riff.wav")
    rc = cli_main(["--audio", str(p1), str(p2),
                   "--out", str(tmp_path / "out"),
                   "--stream", "--save_results"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Streamed Transcription" in out
    assert "A2" in out and "G3" in out
    outs = sorted((tmp_path / "out").glob("riff*_stream_transcription.txt"))
    assert [o.name for o in outs] == ["riff_1_stream_transcription.txt",
                                      "riff_stream_transcription.txt"]
    txt = outs[1].read_text()
    labels = [line.split(",")[1] for line in txt.strip().splitlines()]
    assert "A2" in labels and "G3" in labels
    # streamed onsets are absolute timestamps near the synth positions
    first_onset = float(txt.split(",")[0])
    assert 0.3 < first_onset < 0.6


def test_cli_stream_and_live_conflict(tmp_path):
    p = _riff_wav(tmp_path / "r.wav")
    with pytest.raises(SystemExit):
        cli_main(["--audio", str(p), "--stream", "--live"])


def test_serve_copy_stability_gate(tmp_path):
    """A WAV still being copied into the watch folder must NOT be
    transcribed as a truncated prefix (the decoders deliberately
    tolerate short data chunks, so a mid-copy file decodes cleanly and
    would be silently wrong AND marked done forever). Files become
    eligible only once their size is stable across two polls."""
    import serve as serve_mod

    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir()
    full = _riff_wav(tmp_path / "src.wav").read_bytes()
    target = in_dir / "grow.wav"
    target.write_bytes(full[: len(full) // 2])  # producer mid-copy

    seen_sizes: list[int] = []

    class Stub:
        def transcribe(self, path):
            seen_sizes.append(Path(path).stat().st_size)
            return {"labels": ["A2"], "confidences": [1.0]}

    polls = {"n": 0}

    def hook(processed):
        polls["n"] += 1
        if polls["n"] == 1:
            # first poll saw the half-copied file: must not be processed
            assert processed == 0 and not seen_sizes
            target.write_bytes(full)  # copy completes
            return False
        if polls["n"] == 2:
            # size changed between polls → still ineligible
            assert processed == 0 and not seen_sizes
            return False
        assert processed == 1  # stable across polls 2→3 → processed
        return True

    n = serve_mod.serve(in_dir, out_dir, once=False, poll_s=0.0,
                        transcriber=Stub(), verbose=False, poll_hook=hook)
    assert n == 1
    assert seen_sizes == [len(full)]  # transcribed the COMPLETE file


def test_serve_warmup_covers_partial_wave_programs():
    """warmup(batch=N) must compile every power-of-two wave size up to
    N, not just the full batch: a partial rendezvous (2 concurrent
    POSTs under --http_batch 4) pads B to the next power of two and
    would otherwise hit a cold program under live traffic."""
    import serve as serve_mod

    wave_sizes: list[int] = []
    exact_sizes: list[int] = []
    singles: list = []

    class Stub:
        clip_length = 0.5

        def transcribe_files(self, paths, **kw):
            wave_sizes.append(len(paths))
            return [{"labels": ["A2"], "confidences": [1.0]}
                    for _ in paths]

        def transcribe(self, path, **kw):
            singles.append(kw.get("cand_budget"))
            return {"labels": ["A2"], "confidences": [1.0]}

        def _fused_files_fn(self, sr, clip_dur, max_onsets, budget, cand):
            assert budget is None and cand == 0  # the EXACT program
            import numpy as np

            def run(ys, nv):
                exact_sizes.append(int(ys.shape[0]))
                return np.zeros(1)
            return run, None

    serve_mod.warmup(Stub(), [1.0], batch=4, verbose=False)
    # B=1 is deliberately absent: no serving path dispatches a 1-file
    # transcribe_files (singles route through transcribe, warmed below)
    assert wave_sizes == [2, 4]
    # the exact-fallback program warms at the same pow2 wave sizes —
    # unreachable from the unflagged public warm calls above
    assert exact_sizes == [2, 4]
    # the single-file warm covers the default AND its exact fallback
    # (same signature as a direct cand_budget=0 call)
    assert singles == [None, 0]


def test_serve_http_metrics_count_successful_dispatches_only(tmp_path):
    """A failed batched attempt must not count toward the dispatch
    counters on top of its per-request retries — the documented
    files_sum/dispatches micro-batching ratio would read inflated."""
    import json
    import threading
    import urllib.request

    class Stub:
        def transcribe_files(self, paths, **kw):
            raise RuntimeError("batched decode blew up")

        def transcribe(self, path):
            return {"labels": ["A2"], "confidences": [1.0]}

    holder, th, port = _start_http(
        dict(transcriber=Stub(), batch=4, window_s=2.0))
    base = f"http://127.0.0.1:{port}"
    body = _riff_wav(tmp_path / "r.wav").read_bytes()
    out: list = []

    def post():
        req = urllib.request.Request(f"{base}/transcribe", data=body,
                                     method="POST")
        with urllib.request.urlopen(req, timeout=120) as resp:
            out.append(resp.status)

    try:
        threads = [threading.Thread(target=post) for _ in range(4)]
        for x in threads:
            x.start()
        for x in threads:
            x.join(timeout=120)
        assert out == [200] * 4
        with urllib.request.urlopen(f"{base}/metrics", timeout=30) as r:
            text = r.read().decode()
        lines = dict(ln.rsplit(" ", 1) for ln in text.splitlines()
                     if ln and not ln.startswith("#"))
        # every file was ultimately served by its own successful retry
        # (or a successful singleton wave): dispatches == files == 4,
        # with NO extra count for the failed batched attempt
        assert int(lines["gat_device_dispatches_total"]) == 4
        assert int(lines["gat_dispatch_files_sum"]) == 4
    finally:
        holder[0].shutdown()
        th.join(timeout=10)


def test_modal_mix_stressor_frozen_against_registry_growth(tmp_path,
                                                           monkeypatch):
    """Seeded modal 'mix' eval sets must not move when a new stressor is
    later added to synth._STRESSORS — the mix draw comes from the frozen
    _MIX_KEYS tuple (same contract synth.py documents for its own mix)."""
    from gat_tpu.data import synth
    from gat_tpu.data.modal import render_modal_dataset

    kw = dict(class_names=["E2", "A2"], variants_per_class=2,
              duration=0.3, seed=11, stressor="mix")
    render_modal_dataset(tmp_path / "a", **kw)
    baseline = {p.name: p.read_bytes()
                for p in sorted((tmp_path / "a").rglob("*.wav"))}
    assert len(baseline) == 4

    grown = dict(synth._STRESSORS)
    grown["zz_new"] = lambda sig, sr, rng: sig * 0.5
    monkeypatch.setattr(synth, "_STRESSORS", grown)
    render_modal_dataset(tmp_path / "b", **kw)
    again = {p.name: p.read_bytes()
             for p in sorted((tmp_path / "b").rglob("*.wav"))}
    assert again == baseline


def test_serve_warmup_nonpow2_batch_warms_padded_full_wave():
    """--http_batch 3: a full rendezvous of 3 pads B to 4 — a program
    the power-of-two warm loop (1, 2) alone would never compile."""
    import serve as serve_mod

    wave_sizes: list[int] = []
    exact_sizes: list[int] = []

    class Stub:
        clip_length = 0.5

        def transcribe_files(self, paths, **kw):
            wave_sizes.append(len(paths))
            return [{"labels": ["A2"], "confidences": [1.0]}
                    for _ in paths]

        def transcribe(self, path, **kw):
            return {"labels": ["A2"], "confidences": [1.0]}

        def _fused_files_fn(self, sr, clip_dur, max_onsets, budget, cand):
            import numpy as np

            def run(ys, nv):
                exact_sizes.append(int(ys.shape[0]))
                return np.zeros(1)
            return run, None

    serve_mod.warmup(Stub(), [1.0], batch=3, verbose=False)
    # 3 files exercise the same padded B=4 program live waves of 3 hit
    # (B=1 absent: singles never dispatch transcribe_files)
    assert wave_sizes == [2, 3]
    # ...and the exact program warms at the PADDED sizes (2, then 4)
    assert exact_sizes == [2, 4]


def test_serve_warmup_large_batch_warms_exact_scan_family():
    """--http_batch 8: a dense burst can flag ≥ 2·max_batch files in one
    bucket, re-dispatching through the exact run_SCAN at pow2 K — warmup
    must compile that twin too, or the first burst stalls on it."""
    import serve as serve_mod

    scan_shapes: list[tuple] = []

    class Stub:
        clip_length = 0.5

        def transcribe_files(self, paths, **kw):
            return [{"labels": ["A2"], "confidences": [1.0]}
                    for _ in paths]

        def transcribe(self, path, **kw):
            return {"labels": ["A2"], "confidences": [1.0]}

        def _fused_files_fn(self, sr, clip_dur, max_onsets, budget, cand):
            import numpy as np

            def run(ys, nv):
                return np.zeros(1)

            def run_scan(ys, nv):
                scan_shapes.append(tuple(ys.shape[:2]))
                return np.zeros(1)
            return run, run_scan

    serve_mod.warmup(Stub(), [1.0], batch=8, verbose=False)
    assert scan_shapes == [(2, 4)]  # K=2 waves of max_batch=4


def test_serve_archive_dir_moves_processed_inputs(tmp_path):
    """--archive_dir: processed inputs leave the watch folder, so the
    per-poll scan stays bounded on long-running deployments (and the
    done set holds nothing for archived files)."""
    import json
    import serve as serve_mod

    in_dir, out_dir, arch = tmp_path / "in", tmp_path / "out", \
        tmp_path / "arch"
    in_dir.mkdir()
    _riff_wav(in_dir / "a.wav")

    class Stub:
        def transcribe(self, path):
            return {"labels": ["A2"], "confidences": [1.0]}

    n = serve_mod.serve(in_dir, out_dir, once=True, verbose=False,
                        transcriber=Stub(), archive_dir=arch)
    assert n == 1
    assert not list(in_dir.glob("*.wav"))          # moved out
    assert (arch / "a.wav").exists()               # preserved
    r = json.loads((out_dir / "a.json").read_text())
    assert r["labels"] == ["A2"]


def test_serve_rejects_archive_dir_aliasing_in_dir(tmp_path):
    """--archive_dir equal to --in_dir would make shutil.move a POSIX
    no-op rename: the file never leaves, done is never marked, and
    every poll re-transcribes it forever. Must fail at startup."""
    import serve as serve_mod

    in_dir = tmp_path / "in"
    in_dir.mkdir()

    class Stub:
        def transcribe(self, path):
            return {"labels": ["A2"], "confidences": [1.0]}

    with pytest.raises(ValueError, match="archive_dir"):
        serve_mod.serve(in_dir, tmp_path / "out", once=True,
                        verbose=False, transcriber=Stub(),
                        archive_dir=in_dir)


def test_serve_handles_integer_labels(tmp_path, capsys):
    """Checkpoints without a reverse_map yield int labels (a supported
    MLP-only configuration); the status join must not TypeError."""
    import json
    import serve as serve_mod

    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir()
    _riff_wav(in_dir / "a.wav")

    class Stub:
        def transcribe(self, path):
            return {"labels": [17, 23],
                    "confidences": np.asarray([0.9, 0.8], np.float32)}

    n = serve_mod.serve(in_dir, out_dir, once=True, verbose=True,
                        transcriber=Stub())
    assert n == 1
    r = json.loads((out_dir / "a.json").read_text())
    assert r["labels"] == [17, 23]
    assert "17,23" in capsys.readouterr().out


def test_transcriber_use_cnn_false_skips_cnn_entirely(tmp_path):
    """use_cnn=False (CLI --model mlp): the CNN checkpoint is neither
    loaded nor cross-validated — no CNN weights on device, and an
    incompatible on-disk default CNN cannot fail an MLP-only run."""
    from gat_tpu.infer import Transcriber

    t = Transcriber(use_cnn=False)
    assert "cnn" not in t.model_ckpts
    assert t.predictor.cnn_variables is None
    note = make_pluck(110.0, SR, 0.5, seed=1)
    r = t.transcribe_note(note, sr_in=SR)
    assert r["per_model_probs"]["cnn"] is None
    assert r["per_model_probs"]["mlp"] is not None


def test_scan_streamer_defaults_to_checkpoint_clip_length():
    """ScanStreamer must adopt the checkpoint-trained clip duration by
    default, like every other inference path (source-of-truth rule)."""
    from gat_tpu.infer import Transcriber
    from gat_tpu.stream import ScanStreamer

    t = Transcriber()
    st = ScanStreamer(t)
    assert st.clip_n == int(t.clip_length * st.sr)


def test_create_pitch_dataset_ignores_ancestor_dir_names(tmp_path):
    """String_/Fret_ labels parse from the two LABEL path components —
    an ancestor dir named String_12_sessions must not poison (s, f)."""
    from tools.dataset_creator import create_pitch_dataset
    from gat_tpu.utils.wavio import write_wav

    root = tmp_path / "String_12_sessions" / "clips"
    d = root / "String_3" / "Fret_5"
    d.mkdir(parents=True)
    write_wav(d / "x.wav", np.zeros(1000, np.float32), 22050)
    out = tmp_path / "out"
    n = create_pitch_dataset(root, out)
    assert n == 1
    copied = list(out.rglob("*.wav"))
    assert len(copied) == 1
    assert copied[0].name.startswith("s3_f5__")  # not s12


def test_serve_http_burst_sheds_load_and_loses_nothing():
    """Load soak (VERDICT r4 §next-7): a concurrent burst past the
    bounded micro-batch queue gets immediate 503 + Retry-After (load
    shedding — the queue must not grow without bound), while every
    admitted request is answered exactly once with a correct 200. No
    request may vanish or be answered twice."""
    import json
    import threading
    import urllib.error
    import urllib.request

    served = []
    slock = threading.Lock()

    class SlowStub:
        def transcribe(self, path):
            time.sleep(0.15)
            with slock:
                served.append(1)
            return {"labels": ["A2"], "confidences": [1.0]}

        def transcribe_files(self, paths, **kw):
            time.sleep(0.15)  # hold the dispatcher so a backlog builds
            with slock:
                served.append(len(paths))
            return [{"labels": ["A2"], "confidences": [1.0]}
                    for _ in paths]

    holder, th, port = _start_http(
        dict(transcriber=SlowStub(), batch=2, window_s=0.01, max_queue=3,
             drain_timeout_s=30.0))
    out: list = []
    olock = threading.Lock()

    def post():
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/transcribe", data=b"RIFF" + b"x" * 64,
            method="POST")
        try:
            with urllib.request.urlopen(req, timeout=60) as resp:
                with olock:
                    out.append((resp.status, json.loads(resp.read()), None))
        except urllib.error.HTTPError as e:
            with olock:
                out.append((e.code, json.loads(e.read()),
                            e.headers.get("Retry-After")))

    try:
        threads = [threading.Thread(target=post) for _ in range(16)]
        for x in threads:
            x.start()
        for x in threads:
            x.join(timeout=60)
        # exactly one response per request — none lost, none duplicated
        assert len(out) == 16, f"{len(out)} responses for 16 requests"
        codes = sorted(c for c, _, _ in out)
        assert set(codes) <= {200, 503}, codes
        n200 = codes.count(200)
        assert n200 >= 1 and codes.count(503) >= 1, codes
        # every 200 actually rode a dispatch; every 503 carries the hint
        assert sum(served) == n200
        assert all(r["labels"] == ["A2"] for c, r, _ in out if c == 200)
        assert all(ra == "1" for c, _, ra in out if c == 503)
    finally:
        holder[0].shutdown()
        th.join(timeout=30)
        assert not th.is_alive(), "server thread failed to drain and exit"


def test_serve_http_batch1_sheds_load_too():
    """The bounded queue + 503 shedding apply at the DEFAULT
    --http_batch 1 as well (round-5 review): previously batch=1
    bypassed the micro-batcher entirely, so max_queue was silently
    ignored on the single-request path and a sustained burst grew
    unbounded handler threads with no backpressure signal."""
    import json
    import threading
    import urllib.error
    import urllib.request

    served = []
    slock = threading.Lock()

    class SlowStub:
        def transcribe(self, path):
            time.sleep(0.15)  # hold the dispatcher so a backlog builds
            with slock:
                served.append(1)
            return {"labels": ["A2"], "confidences": [1.0]}

    holder, th, port = _start_http(
        dict(transcriber=SlowStub(), batch=1, max_queue=2,
             drain_timeout_s=30.0))
    out: list = []
    olock = threading.Lock()

    def post():
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/transcribe", data=b"RIFF" + b"x" * 64,
            method="POST")
        try:
            with urllib.request.urlopen(req, timeout=60) as resp:
                with olock:
                    out.append((resp.status, json.loads(resp.read()), None))
        except urllib.error.HTTPError as e:
            with olock:
                out.append((e.code, json.loads(e.read()),
                            e.headers.get("Retry-After")))

    try:
        threads = [threading.Thread(target=post) for _ in range(12)]
        for x in threads:
            x.start()
        for x in threads:
            x.join(timeout=60)
        assert len(out) == 12, f"{len(out)} responses for 12 requests"
        codes = sorted(c for c, _, _ in out)
        assert set(codes) <= {200, 503}, codes
        n200 = codes.count(200)
        assert n200 >= 1 and codes.count(503) >= 1, codes
        assert sum(served) == n200  # exactly-once per admitted request
        assert all(r["labels"] == ["A2"] for c, r, _ in out if c == 200)
        assert all(ra == "1" for c, _, ra in out if c == 503)
    finally:
        holder[0].shutdown()
        th.join(timeout=30)
        assert not th.is_alive(), "server thread failed to drain and exit"


def test_serve_http_dispatchers_exit_even_with_zero_drain_timeout():
    """Dispatcher lifecycle (round-5 review): the drain posts its exit
    sentinels UNCONDITIONALLY and checks the drained state at least
    once, so (a) drain_timeout_s=0 on an idle server is still a clean
    drain (the old while/else skipped the emptiness check entirely at
    deadline<=now), and (b) the dispatcher threads always EXIT after
    shutdown instead of living forever inside an embedding process."""
    import threading
    import urllib.request

    class Stub:
        def transcribe(self, path):
            return {"labels": ["A2"], "confidences": [1.0]}

        def transcribe_files(self, paths, **kw):
            return [{"labels": ["A2"], "confidences": [1.0]}
                    for _ in paths]

    before = set(threading.enumerate())
    holder, th, port = _start_http(
        dict(transcriber=Stub(), batch=2, window_s=0.01, dispatchers=3,
             drain_timeout_s=0.0))
    spawned = set(threading.enumerate()) - before  # server + 3 dispatchers
    assert len(spawned) >= 4, f"expected >=4 new threads, got {spawned}"
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/transcribe", data=b"RIFF" + b"x" * 64,
        method="POST")
    with urllib.request.urlopen(req, timeout=60) as resp:
        assert resp.status == 200
    holder[0].shutdown()
    th.join(timeout=30)
    assert not th.is_alive(), "server thread failed to exit"
    deadline = time.monotonic() + 10.0
    while time.monotonic() < deadline:
        if not any(x.is_alive() for x in spawned):
            break
        time.sleep(0.05)
    leaked = [x for x in spawned if x.is_alive()]
    assert not leaked, f"dispatcher threads leaked after drain: {leaked}"


def test_serve_http_graceful_drain_answers_inflight():
    """Lifecycle soak: shutdown() while requests are queued/in-flight —
    the listener stops, but every ADMITTED request still gets its 200
    (the drain flushes the micro-batch queue and waits for handler
    threads) and the server thread exits cleanly."""
    import json
    import threading
    import urllib.request

    class SlowStub:
        def transcribe(self, path):
            time.sleep(0.3)
            return {"labels": ["A2"], "confidences": [1.0]}

        def transcribe_files(self, paths, **kw):
            time.sleep(0.3)
            return [{"labels": ["A2"], "confidences": [1.0]}
                    for _ in paths]

    holder, th, port = _start_http(
        dict(transcriber=SlowStub(), batch=2, window_s=0.05, max_queue=16,
             drain_timeout_s=30.0))
    out: list = []
    olock = threading.Lock()

    def post():
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/transcribe", data=b"RIFF" + b"x" * 64,
            method="POST")
        # every outcome is RECORDED: a request that races the shutdown
        # may legitimately be shed (503) or reset before accept — what
        # the drain contract forbids is a request that hangs or
        # vanishes with no response at all
        try:
            with urllib.request.urlopen(req, timeout=60) as resp:
                with olock:
                    out.append((resp.status, json.loads(resp.read())))
        except urllib.error.HTTPError as e:
            with olock:
                out.append((e.code, None))
        except Exception as e:  # URLError/reset from the closed listener
            with olock:
                out.append(("conn", repr(e)))

    threads = [threading.Thread(target=post) for _ in range(6)]
    for x in threads:
        x.start()
    time.sleep(0.1)  # let the burst be admitted / queued
    holder[0].shutdown()  # SIGTERM path: stop accepting, then drain
    for x in threads:
        x.join(timeout=60)
    th.join(timeout=30)
    assert not th.is_alive(), "server thread failed to drain and exit"
    assert len(out) == 6, f"requests lost/hung on drain: {out}"
    oks = [(c, r) for c, r in out if c == 200]
    # admitted requests must be ANSWERED CORRECTLY by the drain; a
    # loaded host may shed stragglers that raced the shutdown (503 or
    # connection reset), but at least the already-dispatched wave's
    # worth must have been admitted before shutdown fired
    assert all(r["labels"] == ["A2"] for _, r in oks), out
    assert len(oks) >= 2, f"drain answered too few admitted requests: {out}"
    assert all(c in (200, 503, "conn") for c, _ in out), out


def test_serve_http_concurrent_dispatchers_overlap():
    """--http_dispatchers 2: two waves dispatch CONCURRENTLY (one wave's
    host prep can overlap another's device time), and results stay
    per-request correct."""
    import json
    import threading
    import urllib.request

    peak = {"now": 0, "max": 0}
    plock = threading.Lock()

    class Stub:
        def _enter(self):
            with plock:
                peak["now"] += 1
                peak["max"] = max(peak["max"], peak["now"])

        def _exit(self):
            with plock:
                peak["now"] -= 1

        def transcribe(self, path):
            self._enter()
            time.sleep(0.25)
            self._exit()
            return {"labels": ["A2"], "confidences": [1.0]}

        def transcribe_files(self, paths, **kw):
            self._enter()
            time.sleep(0.25)
            self._exit()
            return [{"labels": ["A2"], "confidences": [1.0]}
                    for _ in paths]

    holder, th, port = _start_http(
        dict(transcriber=Stub(), batch=2, window_s=0.02, dispatchers=2,
             max_queue=16, drain_timeout_s=30.0))
    out: list = []
    olock = threading.Lock()

    def post():
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/transcribe", data=b"RIFF" + b"x" * 64,
            method="POST")
        with urllib.request.urlopen(req, timeout=60) as resp:
            with olock:
                out.append((resp.status, json.loads(resp.read())))

    try:
        threads = [threading.Thread(target=post) for _ in range(8)]
        for x in threads:
            x.start()
        for x in threads:
            x.join(timeout=60)
        assert len(out) == 8
        assert all(c == 200 and r["labels"] == ["A2"] for c, r in out)
        assert peak["max"] >= 2, "dispatchers never overlapped"
    finally:
        holder[0].shutdown()
        th.join(timeout=30)


def test_serve_warmup_mesh_divisible_exact_shapes():
    """Under --mesh N the exact-program warm compiles must use B
    divisible by the data axis (round-5 review): a mesh-sharded jit
    rejects an indivisible B outright — warmup crashed at startup for
    N >= 3 — and the warmed shapes must match what production
    dispatches (_dispatch_pow2_wave b_floor=data_par, max_batch rounded
    up to data_par)."""
    import serve as serve_mod

    exact_sizes: list[int] = []
    scan_shapes: list[tuple] = []

    class Stub:
        clip_length = 0.5
        _data_par = 4  # as Transcriber(mesh=make_mesh(4))

        def transcribe_files(self, paths, **kw):
            return [{"labels": ["A2"], "confidences": [1.0]}
                    for _ in paths]

        def transcribe(self, path, **kw):
            return {"labels": ["A2"], "confidences": [1.0]}

        def _fused_files_fn(self, sr, clip_dur, max_onsets, budget, cand):
            def run(ys, nv):
                exact_sizes.append(int(ys.shape[0]))
                return np.zeros(1)

            def run_scan(ys, nv):
                scan_shapes.append(tuple(int(v) for v in ys.shape[:2]))
                return np.zeros(1)
            return run, run_scan

    serve_mod.warmup(Stub(), [1.0], batch=8, verbose=False)
    # warmed_bs {2,4,8} round up to data-par multiples {4,8}; 8 exceeds
    # the (rounded) max_batch cap of 4, so exactly one B=4 compile
    assert exact_sizes == [4], exact_sizes
    # the exact scan twin warms at (K, max_batch_rounded)
    assert scan_shapes == [(2, 4)], scan_shapes


def test_serve_archive_dedupes_redropped_filenames(tmp_path):
    """Re-dropping a processed filename is the documented way to
    reprocess it — the archive move must not os.rename over the
    previously archived input (round-5 review): both recordings
    survive under deduplicated names."""
    import serve as serve_mod

    in_dir, out_dir, arch = tmp_path / "in", tmp_path / "out", \
        tmp_path / "arch"
    in_dir.mkdir()

    class Stub:
        def transcribe(self, path):
            return {"labels": ["A2"], "confidences": [1.0]}

    _riff_wav(in_dir / "a.wav")
    serve_mod.serve(in_dir, out_dir, once=True, verbose=False,
                    transcriber=Stub(), archive_dir=arch)
    (arch / "a.wav").write_bytes(b"FIRST" + (arch / "a.wav").read_bytes())
    first = (arch / "a.wav").read_bytes()
    _riff_wav(in_dir / "a.wav")  # the same filename, dropped again
    serve_mod.serve(in_dir, out_dir, once=True, verbose=False,
                    transcriber=Stub(), archive_dir=arch)
    assert (arch / "a.wav").read_bytes() == first  # original preserved
    assert (arch / "a.1.wav").exists()  # re-drop archived alongside
