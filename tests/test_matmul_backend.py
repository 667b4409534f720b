"""The TPU matmul-DFT backend must match the FFT backend numerically —
same mel-spectrograms, MFCCs, and YIN pitches (SURVEY §7: MXU-native
spectral front-end)."""
import numpy as np
import pytest

from gat_tpu.ops import spectral
from gat_tpu.ops.yin import yin_pitch, yin
from tests.conftest import make_pluck, make_sine


@pytest.fixture
def matmul_backend():
    spectral.set_stft_backend("matmul")
    yield
    spectral.set_stft_backend("auto")


def test_power_spectrogram_matmul_matches_fft(rng, matmul_backend):
    y = rng.normal(size=(3, 5512)).astype(np.float32) * 0.3
    got = np.asarray(spectral.power_spectrogram(y, 2048, 512))
    spectral.set_stft_backend("fft")
    ref = np.asarray(spectral.power_spectrogram(y, 2048, 512))
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=1e-3)


def test_mfcc_matmul_matches_fft(matmul_backend):
    y = np.stack([make_pluck(f, 11025, 0.5, seed=1) for f in (110., 220.)])
    got = np.asarray(spectral.mfcc(y, 11025, n_mfcc=64))
    spectral.set_stft_backend("fft")
    ref = np.asarray(spectral.mfcc(y, 11025, n_mfcc=64))
    np.testing.assert_allclose(got, ref, atol=0.05)


def test_melspec_matmul_matches_fft(matmul_backend):
    y = make_pluck(196.0, 11025, 0.5, seed=2)[None]
    got = np.asarray(spectral.melspectrogram_torchaudio(y, 11025))
    spectral.set_stft_backend("fft")
    ref = np.asarray(spectral.melspectrogram_torchaudio(y, 11025))
    # in signal-bearing bins the backends agree tightly; near the -90 dB
    # floor fp32 rounding of ~zero power legitimately shifts the log
    signal = ref > -60.0
    np.testing.assert_allclose(got[signal], ref[signal], atol=0.05)
    np.testing.assert_allclose(got, ref, atol=1.0)


def test_yin_matmul_matches_fft(matmul_backend):
    clips = np.stack([make_pluck(f, 11025, 0.5, seed=3)
                      for f in (82.41, 146.83, 329.63)])
    got = np.asarray(yin_pitch(clips, 11025))
    spectral.set_stft_backend("fft")
    ref = np.asarray(yin_pitch(clips, 11025))
    np.testing.assert_allclose(got, ref, rtol=2e-3)
    # framewise too
    s = make_sine(220.0, 11025, 0.5)
    spectral.set_stft_backend("matmul")
    f_m = np.asarray(yin(s, sr=11025))
    spectral.set_stft_backend("fft")
    f_f = np.asarray(yin(s, sr=11025))
    np.testing.assert_allclose(f_m, f_f, rtol=2e-3)


def test_backend_auto_resolution(matmul_backend):
    spectral.set_stft_backend("auto")
    # on the CPU test platform auto must resolve to fft
    assert spectral.stft_backend() == "fft"
