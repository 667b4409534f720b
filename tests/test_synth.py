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
