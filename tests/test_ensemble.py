"""Shipped-checkpoint ensemble: imported reference MLP (0.2) + the
synthetic-trained CNN (0.8) — the default Transcriber configuration."""
import numpy as np
import pytest

from gat_tpu.config import MLP_CONFIG, CNN_CONFIG
from gat_tpu.infer import Transcriber
from gat_tpu.utils.wavio import write_wav
from tests.conftest import make_pluck

SR = 22050
NOTES = [(0.4, 82.41, "E2"), (1.1, 110.0, "A2"), (1.8, 146.83, "D3"),
         (2.5, 196.0, "G3"), (3.2, 246.94, "B3"), (3.9, 329.63, "E4"),
         (4.6, 440.0, "A4"), (5.3, 659.25, "E5"), (6.0, 196.0, "G3")]

_have_ckpts = ((MLP_CONFIG.CHECKPOINTS_DIR / MLP_CONFIG.DEFAULT_CKPT_NAME)
               .exists() and
               (CNN_CONFIG.CHECKPOINTS_DIR / CNN_CONFIG.DEFAULT_CKPT_NAME)
               .exists())
pytestmark = pytest.mark.skipif(not _have_ckpts,
                                reason="shipped checkpoints absent")


@pytest.fixture(scope="module")
def transcriber():
    return Transcriber()


def test_default_ckpts_resolve(transcriber):
    assert transcriber.ckpt_sr == 11025
    assert "cnn" in transcriber.model_ckpts
    assert transcriber.predictor.cnn_weight == 0.80


def test_full_range_riff(tmp_path, transcriber):
    """Notes across the whole fretboard range transcribe correctly
    through the shipped ensemble (last onset sacrificed per reference)."""
    y = np.zeros(int(6.8 * SR), np.float32)
    for t0, f, _ in NOTES:
        n = make_pluck(f, SR, 0.45, seed=int(f))
        fade = int(0.3 * len(n))
        n[-fade:] *= np.linspace(1, 0, fade, dtype=np.float32)
        s = int(t0 * SR)
        y[s:s + len(n)] += n
    p = tmp_path / "riff.wav"
    write_wav(p, y, SR)
    result = transcriber.transcribe(p)
    assert result["labels"] == [n for _, _, n in NOTES[:-1]]
    assert min(result["confidences"]) > 0.5
    assert result["per_model_probs"]["cnn"].shape == (8, 47)


def test_ensemble_weight_sweep_changes_probs(transcriber):
    note = make_pluck(196.0, SR, 0.5, seed=11)
    r = transcriber.transcribe_note(note, sr_in=SR)
    mlp_p = r["per_model_probs"]["mlp"]
    cnn_p = r["per_model_probs"]["cnn"]
    np.testing.assert_allclose(r["probs"], 0.2 * mlp_p + 0.8 * cnn_p,
                               atol=1e-6)


def test_pitch_prior_math():
    """apply_pitch_prior must boost the f0-consistent class, suppress
    octave errors, and pass probs through on invalid pitch."""
    import jax.numpy as jnp
    from gat_tpu.infer.predictor import apply_pitch_prior

    class_midi = np.asarray([45.0, 50.0, 57.0], np.float32)  # A2 D3 A3
    # model leans wrong by an octave without confidence: the f0-backed
    # class must win (a CONFIDENT model keeps its answer — mixture, not
    # veto)
    probs = jnp.asarray([[0.3, 0.25, 0.45]])
    hz = jnp.asarray([110.0])  # A2
    post = np.asarray(apply_pitch_prior(probs, hz, class_midi))
    assert post[0].argmax() == 0, post
    confident = jnp.asarray([[0.02, 0.03, 0.95]])
    post_c = np.asarray(apply_pitch_prior(confident, hz, class_midi))
    assert post_c[0].argmax() == 2, post_c
    # invalid pitch → unchanged
    post_nan = np.asarray(apply_pitch_prior(probs, jnp.asarray([np.nan]),
                                            class_midi))
    np.testing.assert_allclose(post_nan, np.asarray(probs), atol=1e-7)
    post_neg = np.asarray(apply_pitch_prior(probs, jnp.asarray([-1.0]),
                                            class_midi))
    np.testing.assert_allclose(post_neg, np.asarray(probs), atol=1e-7)


def test_pitch_prior_transcriber_unseen_timbre(tmp_path):
    """End-to-end: an FM-timbre note (unseen by both models) must be
    labeled correctly once the pitch prior is enabled."""
    from gat_tpu.data.synth import fm_pluck

    t = Transcriber(pitch_prior_weight=0.4)
    ok = 0
    notes = [("A2", 110.0), ("G3", 196.0), ("E4", 329.63), ("A4", 440.0)]
    for name, f in notes:
        sig = fm_pluck(f, SR, 0.5, n_variants=1, mod_ratio=3.0, seed=7)[0]
        r = t.transcribe_note(sig * 0.5, sr_in=SR)
        ok += (r["labels"][0] == name)
    assert ok == len(notes), f"{ok}/{len(notes)} FM notes correct"


def test_pitch_prior_default_off(transcriber):
    """The default transcriber must keep exact reference blend parity."""
    assert transcriber.predictor.pitch_prior_weight == 0.0
