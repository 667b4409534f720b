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


def test_block_spectra_match_windowless_rfft(rng):
    """block_spectra (hop-block DFT + twiddle combine) must equal the
    rfft of the materialized unwindowed frames exactly."""
    import jax.numpy as jnp
    y = rng.normal(size=(2, 4096 + 300)).astype(np.float32)
    n_fft, hop = 2048, 512
    nf = 1 + (y.shape[-1] - n_fft) // hop
    xre, xim = spectral.block_spectra(jnp.asarray(y), n_fft, hop, nf)
    frames = np.asarray(spectral.frame(jnp.asarray(y), n_fft, hop))
    ref = np.fft.rfft(frames, n_fft, axis=-1)
    np.testing.assert_allclose(np.asarray(xre), ref.real, atol=2e-3)
    np.testing.assert_allclose(np.asarray(xim), ref.imag, atol=2e-3)


def test_hann_in_frequency_matches_windowed_rfft(rng):
    """The 3-tap frequency-domain Hann must equal windowing in time."""
    import jax.numpy as jnp
    y = rng.normal(size=(1, 6144)).astype(np.float32)
    n_fft, hop = 2048, 512
    nf = 1 + (y.shape[-1] - n_fft) // hop
    xre, xim = spectral.block_spectra(jnp.asarray(y), n_fft, hop, nf)
    wre, wim = spectral.hann_in_frequency(xre, xim)
    frames = np.asarray(spectral.frame(jnp.asarray(y), n_fft, hop))
    win = np.hanning(n_fft + 1)[:-1]  # periodic Hann
    ref = np.fft.rfft(frames * win, n_fft, axis=-1)
    np.testing.assert_allclose(np.asarray(wre), ref.real, atol=2e-3)
    np.testing.assert_allclose(np.asarray(wim), ref.imag, atol=2e-3)


def test_power_spectrogram_non_divisible_hop_falls_back(rng,
                                                        matmul_backend):
    """hop ∤ n_fft can't use the block path — the frame-GEMM fallback
    must still match the fft backend."""
    y = rng.normal(size=(2, 5512)).astype(np.float32) * 0.3
    got = np.asarray(spectral.power_spectrogram(y, 2048, 500))
    spectral.set_stft_backend("fft")
    ref = np.asarray(spectral.power_spectrogram(y, 2048, 500))
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=1e-3)


def test_fused_feature_vectors_match_fft_path(matmul_backend):
    """The shared-block-DFT MFCC+pitch front-end must reproduce the
    separate-pipeline fft path for every flag combination."""
    from gat_tpu.features import mfcc_feature_vectors
    clips = np.stack([make_pluck(f, 11025, 0.5, seed=5)
                      for f in (110.0, 196.0, 329.63)])
    for norm in (True, False):
        for pon in (True, False):
            spectral.set_stft_backend("matmul")
            got = np.asarray(mfcc_feature_vectors(
                clips, 11025, normalize_audio_volume=norm,
                pitch_on_normalized=pon))
            spectral.set_stft_backend("fft")
            ref = np.asarray(mfcc_feature_vectors(
                clips, 11025, normalize_audio_volume=norm,
                pitch_on_normalized=pon))
            np.testing.assert_allclose(got, ref, atol=5e-3,
                                       err_msg=f"norm={norm} pon={pon}")


def test_block_paths_randomized_configs(rng, matmul_backend):
    """Randomized (n_fft, hop, length) sweep: every divisible-hop config
    must route through the block/full-GEMM selector and still match the
    fft backend (guards the K<=4 routing and padding arithmetic)."""
    for n_fft, hop in ((1024, 256), (1024, 512), (2048, 512),
                       (2048, 1024), (512, 128)):
        n = int(rng.integers(3 * n_fft, 5 * n_fft))
        y = (rng.normal(size=(2, n)) * 0.3).astype(np.float32)
        spectral.set_stft_backend("matmul")
        got = np.asarray(spectral.power_spectrogram(y, n_fft, hop))
        spectral.set_stft_backend("fft")
        ref = np.asarray(spectral.power_spectrogram(y, n_fft, hop))
        np.testing.assert_allclose(
            got, ref, atol=2e-2, rtol=1e-3,
            err_msg=f"n_fft={n_fft} hop={hop} n={n}")
