"""Synthesis families and playing-style stressors (the de-circularized
evaluation's data side, VERDICT r1 §next-2)."""
import numpy as np
import pytest

from gat_tpu.data.synth import (karplus_strong, additive_pluck, fm_pluck,
                                apply_vibrato, apply_pitch_bend,
                                apply_tremolo, synthesize_note_dataset)
from gat_tpu.ops.yin import yin_pitch, estimate_note

SR = 22050


def _pitch(sig: np.ndarray) -> float:
    import jax.numpy as jnp
    return float(np.asarray(yin_pitch(jnp.asarray(sig[None]), SR))[0])


@pytest.mark.parametrize("freq,name", [(110.0, "A2"), (329.63, "E4")])
def test_fm_pluck_pitch_is_well_defined(freq, name):
    """Integer mod ratios keep every sideband on the f0 harmonic grid, so
    the pitch label must survive YIN for all ratios in the family."""
    for ratio in (2.0, 3.0, 4.0):
        sig = fm_pluck(freq, SR, 0.5, n_variants=2, mod_ratio=ratio,
                       seed=int(freq))
        for v in sig:
            assert estimate_note(_pitch(v), unicode=False)[1] == name, \
                (freq, ratio)


def test_fm_timbre_differs_from_training_families():
    """FM must actually be a different timbre: its magnitude spectrum
    should be far from both KS and additive at the same pitch."""
    import jax.numpy as jnp
    from gat_tpu.ops.spectral import power_spectrogram

    def spec(sig):
        s = np.asarray(power_spectrogram(jnp.asarray(sig[None]), 2048, 512))
        m = s.mean(axis=1)[0]
        return m / (m.sum() + 1e-12)

    f = 220.0
    ks = spec(karplus_strong(f, SR, 0.5, 1, seed=0)[0])
    ad = spec(additive_pluck(f, SR, 0.5, 1, seed=0)[0])
    fm = spec(fm_pluck(f, SR, 0.5, 1, mod_ratio=3.0, seed=0)[0])
    d_cross = np.abs(fm - ks).sum() + np.abs(fm - ad).sum()
    d_within = np.abs(ks - ad).sum()
    assert d_cross > d_within, "FM spectrum is not distinctive"


def test_vibrato_modulates_but_preserves_median_pitch():
    base = additive_pluck(220.0, SR, 0.6, 1, seed=1)[0]
    vib = apply_vibrato(base, SR, depth_cents=30, rate_hz=5.0, seed=0)
    assert not np.allclose(vib, base)
    assert abs(_pitch(vib) - 220.0) / 220.0 < 0.02


def test_pitch_bend_settles_on_target():
    base = additive_pluck(220.0, SR, 0.6, 1, seed=2)[0]
    bent = apply_pitch_bend(base, SR, bend_cents=40.0, settle_s=0.1)
    # after the settle the warp is identity-shifted: tail pitch ≈ target
    import jax.numpy as jnp
    from gat_tpu.ops.yin import yin
    f0 = np.asarray(yin(jnp.asarray(bent[None]), sr=SR))[0]
    assert abs(np.median(f0[-4:]) - 220.0) / 220.0 < 0.02


def test_tremolo_only_touches_amplitude():
    base = additive_pluck(220.0, SR, 0.5, 1, seed=3)[0]
    trem = apply_tremolo(base, SR, depth=0.5, rate_hz=6.0, seed=0)
    assert abs(_pitch(trem) - _pitch(base)) < 1.0
    assert np.std(np.abs(trem)) != np.std(np.abs(base))


def test_dataset_family_and_stressor_plumbing(tmp_path):
    root = synthesize_note_dataset(tmp_path / "fmset", class_names=["A3"],
                                   variants_per_class=3, family="fm",
                                   stressor="vibrato", verbose=False)
    wavs = list(root.rglob("*.wav"))
    assert len(wavs) == 3
    with pytest.raises(ValueError, match="unknown family"):
        synthesize_note_dataset(tmp_path / "bad", class_names=["A3"],
                                family="square", verbose=False)
    with pytest.raises(ValueError, match="unknown stressor"):
        synthesize_note_dataset(tmp_path / "bad2", class_names=["A3"],
                                stressor="chorus", verbose=False)


# ---------- round-3: modal eval renderer + channel stressors ----------

def test_modal_pluck_pitch_and_distinctiveness():
    """The eval-only modal renderer must put its pitch exactly on the
    label's f0 (harmonic mode grid) while its SPECTRUM differs from
    every training engine at the same pitch — the held-out family has to
    be in-tune but out-of-distribution."""
    from gat_tpu.data.modal import modal_pluck
    for f0 in (110.0, 220.0, 440.0):
        sig = modal_pluck(f0, SR, 0.5, n_variants=2, seed=4)
        for v in range(2):
            assert abs(_pitch(sig[v]) - f0) / f0 < 0.01

    def spec(x):
        s = np.abs(np.fft.rfft(x * np.hanning(len(x))))
        return s / (s.sum() + 1e-12)
    md = spec(modal_pluck(220.0, SR, 0.5, 1, seed=5)[0])
    ks = spec(karplus_strong(220.0, SR, 0.5, 1, seed=5)[0])
    ad = spec(additive_pluck(220.0, SR, 0.5, 1, seed=5)[0])
    fm = spec(fm_pluck(220.0, SR, 0.5, 1, seed=5)[0])
    d_cross = min(np.abs(md - o).sum() for o in (ks, ad, fm))
    d_within = np.abs(ks - ad).sum()
    assert d_cross > 0.3 * d_within, "modal spectrum not distinctive"


def test_modal_renderer_code_disjoint_from_training_synths():
    """The modal module must not call any training-synth engine — it is
    the held-out family, so sharing a renderer would re-circularize the
    eval (VERDICT r2 §next-1). Dataset-writer plumbing (stressors,
    class list) may be shared; the ENGINES may not."""
    import ast
    import inspect
    from gat_tpu.data import modal
    tree = ast.parse(inspect.getsource(modal))
    called = {n.func.attr if isinstance(n.func, ast.Attribute)
              else getattr(n.func, "id", "") for n in ast.walk(tree)
              if isinstance(n, ast.Call)}
    forbidden = {"karplus_strong", "additive_pluck", "fm_pluck"}
    assert not (called & forbidden), called & forbidden


def test_modal_dataset_layout(tmp_path):
    from gat_tpu.data.modal import render_modal_dataset
    root = render_modal_dataset(tmp_path / "modal", class_names=["A3", "E2"],
                                variants_per_class=2, seed=1,
                                stressor="vibrato", channel="pickup_eq")
    wavs = sorted(root.rglob("*.wav"))
    assert len(wavs) == 4
    assert {p.parent.name for p in wavs} == {"A3", "E2"}


def test_channel_stressors_preserve_pitch_change_signal():
    """Each acquisition-channel stressor must corrupt the waveform but
    leave the (YIN) pitch recoverable — they model the mic chain, not
    destruction."""
    from gat_tpu.data.channel import apply_channel, CHANNELS
    base = additive_pluck(196.0, SR, 0.5, 1, seed=9)[0]
    rng = np.random.default_rng(0)
    for name in list(CHANNELS) + ["full_chain"]:
        out = apply_channel(base.copy(), SR, name, rng)
        assert out.shape == base.shape
        assert not np.allclose(out, base), name
        assert abs(_pitch(out) - 196.0) / 196.0 < 0.02, name
    with pytest.raises(ValueError, match="unknown channel"):
        apply_channel(base, SR, "bitcrush", rng)


def test_palm_mute_damps_and_darkens_but_keeps_pitch():
    """Palm mute: faster decay (tail energy collapses), darker spectrum
    (HF share drops), pitch still recoverable; and the 'mix' draw keys
    stay FROZEN so published seeded training streams don't move when an
    eval-only stressor is added."""
    from gat_tpu.data.synth import apply_palm_mute, _MIX_KEYS, _STRESSORS
    base = additive_pluck(196.0, SR, 0.5, 1, seed=9)[0]
    out = apply_palm_mute(base.copy(), SR, decay_s=0.1, tone=0.35)
    assert out.shape == base.shape
    half = len(base) // 2

    def tail_share(y):
        e = np.square(y.astype(np.float64))
        return e[half:].sum() / e.sum()

    assert tail_share(out) < 0.25 * tail_share(base)

    def hf_share(y):
        S = np.abs(np.fft.rfft(y.astype(np.float64)))**2
        cut = int(1000 / (SR / len(y)))  # bins above 1 kHz
        return S[cut:].sum() / S.sum()

    assert hf_share(out) < 0.5 * hf_share(base)
    assert abs(_pitch(out) - 196.0) / 196.0 < 0.02
    assert "palm_mute" in _STRESSORS
    assert _MIX_KEYS == ("vibrato", "bend", "detune", "tremolo")


def test_channel_prob_zero_reproduces_unaugmented_dataset(tmp_path):
    """channel_prob=0 must yield byte-identical datasets to no channel
    arg at all (the rng-stream stability contract)."""
    a = synthesize_note_dataset(tmp_path / "a", class_names=["A3"],
                                variants_per_class=3, seed=5,
                                verbose=False)
    b = synthesize_note_dataset(tmp_path / "b", class_names=["A3"],
                                variants_per_class=3, seed=5,
                                channel="room_ir", channel_prob=0.0,
                                verbose=False)
    for pa, pb in zip(sorted(a.rglob("*.wav")), sorted(b.rglob("*.wav"))):
        assert pa.read_bytes() == pb.read_bytes()


def test_all3_family_routes_all_engines(tmp_path):
    """family=all3 must produce one third each KS/FM/additive (checked
    via the variant index routing, not spectra): 6 variants → files
    exist and the set synthesizes without consuming stressor draws."""
    root = synthesize_note_dataset(tmp_path / "a3", class_names=["A3"],
                                   variants_per_class=6, seed=5,
                                   family="all3", verbose=False)
    assert len(list(root.rglob("*.wav"))) == 6


def test_variant_seed_injective_and_backcompat():
    """Per-variant rng seeds: identical to the historical formula for
    variants_per_class <= 100 (published streams must not move), and
    injective across (seed, class, variant) for larger runs."""
    from gat_tpu.data.synth import _variant_seed
    for ci in (0, 3, 46):
        for i in (0, 7, 47):
            assert _variant_seed(42, ci, i, 48) == 42 * 100000 + ci * 100 + i
    seen = {}
    for seed in (1, 2):
        for ci in range(48):
            for i in range(150):
                s = _variant_seed(seed, ci, i, 150)
                assert s not in seen, (seen[s], (seed, ci, i))
                seen[s] = (seed, ci, i)


def test_modal_isolation_guard_refuses_training(tmp_path):
    """The held-out-family contract is ENFORCED, not just documented
    (VERDICT r3 §next-5): every modal-rendered dataset carries the
    EVAL_ONLY marker, and every TrainingManager entry point refuses it."""
    from gat_tpu.data.modal import render_modal_dataset, EVAL_ONLY_MARKER
    from gat_tpu.train import TrainingManager

    ds = render_modal_dataset(tmp_path / "modal_ds",
                              class_names=["E2", "A2"],
                              variants_per_class=1, seed=0)
    assert (ds / EVAL_ONLY_MARKER).exists()
    mgr = TrainingManager(target_sr=11025)
    with pytest.raises(ValueError, match="EVAL-ONLY"):
        mgr.train_mlp(dataset=ds)
    with pytest.raises(ValueError, match="EVAL-ONLY"):
        mgr.train_cnn(dataset=ds, verbose=False)
    with pytest.raises(ValueError, match="EVAL-ONLY"):
        mgr.train_all(dataset=ds, verbose=False)
    # ...while evaluation loading of the same dataset stays untouched
    from gat_tpu.data.loader import AudioDatasetLoader
    loader = AudioDatasetLoader([ds], target_sr=11025, duration=0.5)
    wavs, _, labels, _ = loader.load_audio_dataset()
    assert sorted(set(labels)) == ["A2", "E2"] and len(wavs) == 2


def test_modal_marker_written_before_rendering(tmp_path, monkeypatch):
    """An interrupted render must never leave a valid-looking but
    UNMARKED dataset the training guard would accept: the EVAL_ONLY
    marker is written before the first wav, so a crash mid-render still
    leaves the poison pill in place."""
    from gat_tpu.data.modal import render_modal_dataset, EVAL_ONLY_MARKER
    import gat_tpu.utils.native_wav as nw

    def boom(pending):
        raise KeyboardInterrupt  # simulate Ctrl-C mid-render

    monkeypatch.setattr(nw, "write_wav_batch", boom)
    root = tmp_path / "modal_interrupted"
    with pytest.raises(KeyboardInterrupt):
        render_modal_dataset(root, class_names=["E2"],
                             variants_per_class=1, seed=0)
    assert (root / EVAL_ONLY_MARKER).exists(), \
        "interrupted render left an unmarked eval-family dataset"


def test_train_synthetic_cli_cannot_reach_modal():
    """tools/train_synthetic.py --family has no 'modal' choice: argparse
    rejects it before any dataset synthesis can run."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    out = subprocess.run(
        [sys.executable, str(repo / "tools/train_synthetic.py"),
         "--model", "mlp", "--family", "modal"],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 2
    assert "invalid choice: 'modal'" in out.stderr
