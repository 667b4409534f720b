import numpy as np
import jax.numpy as jnp
import pytest

from gat_tpu.ops.yin import yin, yin_pitch, estimate_note
from tests.conftest import make_sine, make_pluck


def _cmnd_direct(x: np.ndarray, W: int, min_p: int, max_p: int) -> np.ndarray:
    """Independent O(W·τ) float64 reference for the CMND on one frame:
    d(τ) = Σ_{i=1..W} (x[i] − x[i+τ])², normalized by its cumulative mean."""
    x = x.astype(np.float64)
    d = np.zeros(max_p + 1)
    for tau in range(max_p + 1):
        seg = x[1:W + 1] - x[1 + tau:W + 1 + tau]
        d[tau] = np.sum(seg * seg)
    cum = np.cumsum(d[1:max_p + 1]) / np.arange(1, max_p + 1)
    out = d[min_p:max_p + 1] / (cum[min_p - 1:max_p] + 2.2e-308)
    return out


def test_cmnd_matches_direct_reference():
    sr = 11025
    x = make_pluck(196.0, sr, 0.5, seed=3)  # G3
    frame_length, W, hop = 2048, 1024, 512
    min_p, max_p = 11, min(221, frame_length - W - 1)

    from gat_tpu.ops.yin import _cmnd
    from gat_tpu.ops.spectral import frame as frame_op, _pad_center
    import jax.numpy as jnp
    padded = _pad_center(jnp.asarray(x), frame_length // 2, "constant")
    frames = np.asarray(frame_op(padded, frame_length, hop))
    ours = np.asarray(_cmnd(jnp.asarray(frames), frame_length, W, min_p, max_p))

    for t in (3, 5, 7):
        ref = _cmnd_direct(frames[t], W, min_p, max_p)
        np.testing.assert_allclose(ours[t], ref, atol=5e-3)


@pytest.mark.parametrize("freq,name", [
    (82.41, "E2"), (110.0, "A2"), (196.0, "G3"), (440.0, "A4"),
    (659.25, "E5"),
])
def test_sine_pitch(freq, name):
    sr = 11025
    x = make_sine(freq, sr, 0.5)
    hz = float(yin_pitch(x, sr))
    midi, note, midi_f = estimate_note(hz, unicode=False)
    assert note == name, f"{freq} Hz → {hz:.2f} Hz → {note}"
    # within 1% of true frequency
    assert abs(hz - freq) / freq < 0.01


def test_pluck_pitch():
    sr = 11025
    for freq, name in [(82.41, "E2"), (146.83, "D3"), (329.63, "E4")]:
        x = make_pluck(freq, sr, 0.5, seed=1)
        hz = float(yin_pitch(x, sr))
        _, note, _ = estimate_note(hz, unicode=False)
        assert note == name, f"{freq} Hz pluck → {hz:.2f} Hz → {note}"


def test_batched_equals_single():
    sr = 11025
    clips = np.stack([make_sine(f, sr, 0.5) for f in (110.0, 220.0, 440.0)])
    batch = np.asarray(yin_pitch(clips, sr))
    singles = np.array([float(yin_pitch(c, sr)) for c in clips])
    np.testing.assert_allclose(batch, singles, rtol=1e-5)


def test_framewise_shape():
    sr = 11025
    x = make_sine(220.0, sr, 0.5)
    f0 = np.asarray(yin(x, sr=sr))
    assert f0.shape == (11,)  # (5512 + 2048 - 2048)//512 + 1
    assert np.all(f0 > 0)


def test_estimate_note_edge_cases():
    assert estimate_note(None) == (None, None, None)
    assert estimate_note(float("nan")) == (None, None, None)
    assert estimate_note(-5.0) == (None, None, None)
    midi, note, mf = estimate_note(440.0)
    assert (midi, note) == (69, "A4")
    # unicode sharp by default (librosa convention), ASCII on request
    assert estimate_note(466.16)[1] == "A♯4"
    assert estimate_note(466.16, unicode=False)[1] == "A#4"


def test_yin_hop_equals_win_matches_fft_backend():
    """hop_length == win_length used to crash the block (matmul) path at
    trace time; it must fall back and agree with the fft backend."""
    from gat_tpu.ops import spectral
    from gat_tpu.ops.yin import yin
    y = np.sin(2 * np.pi * 196.0 * np.arange(4096) / 22050).astype(
        np.float32)
    old = spectral.stft_backend()
    try:
        spectral.set_stft_backend("matmul")
        f_mm = np.asarray(yin(jnp.asarray(y), sr=22050, hop_length=1024))
        spectral.set_stft_backend("fft")
        f_ff = np.asarray(yin(jnp.asarray(y), sr=22050, hop_length=1024))
    finally:
        spectral.set_stft_backend(old)
    np.testing.assert_allclose(f_mm, f_ff, rtol=5e-3)
