import numpy as np
import jax.numpy as jnp
import pytest
import scipy.fftpack
import scipy.signal

from gat_tpu.ops import spectral
from gat_tpu.ops.mel import (hz_to_mel, mel_to_hz, mel_filterbank_librosa,
                             mel_filterbank_torchaudio)
from tests.conftest import make_sine


def test_hann_matches_scipy():
    for n in (256, 2048):
        ref = scipy.signal.get_window("hann", n, fftbins=True)
        np.testing.assert_allclose(np.asarray(spectral.hann_window(n)), ref,
                                   atol=1e-6)


def test_frame_shapes_and_values(rng):
    y = rng.normal(size=(3, 100)).astype(np.float32)
    f = np.asarray(spectral.frame(y, 32, 16))
    assert f.shape == (3, 5, 32)
    np.testing.assert_array_equal(f[1, 2], y[1, 32:64])


def test_dct_matches_scipy(rng):
    x = rng.normal(size=(5, 128)).astype(np.float64)
    ref = scipy.fftpack.dct(x, type=2, norm="ortho", axis=-1)[:, :64]
    D = np.asarray(spectral.dct_ii_matrix(128, 64))
    np.testing.assert_allclose(x.astype(np.float32) @ D, ref, atol=1e-4)


def test_stft_matches_numpy_reference(rng):
    """Constant-pad center STFT vs a direct numpy reimplementation of the
    librosa recipe (pad n_fft//2, hann, rfft)."""
    y = rng.normal(size=5512).astype(np.float32)
    n_fft, hop = 2048, 512
    ours = np.asarray(spectral.stft(y, n_fft=n_fft, hop_length=hop))
    ypad = np.pad(y, n_fft // 2)
    win = scipy.signal.get_window("hann", n_fft, fftbins=True)
    nf = 1 + (len(ypad) - n_fft) // hop
    ref = np.stack([np.fft.rfft(ypad[i * hop:i * hop + n_fft] * win)
                    for i in range(nf)])
    assert ours.shape == ref.shape == (11, 1025)
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_stft_reflect_matches_torch(rng):
    """Reflect-pad center STFT (torchaudio convention) vs torch.stft."""
    import torch
    y = rng.normal(size=5512).astype(np.float32)
    n_fft, hop = 2048, 256
    ours = np.asarray(spectral.stft(y, n_fft=n_fft, hop_length=hop,
                                    pad_mode="reflect"))
    ref = torch.stft(torch.from_numpy(y), n_fft=n_fft, hop_length=hop,
                     window=torch.hann_window(n_fft), center=True,
                     pad_mode="reflect", return_complex=True).numpy().T
    assert ours.shape == ref.shape == (22, 1025)
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_mel_scale_roundtrip():
    f = np.array([0.0, 110.0, 440.0, 1000.0, 2000.0, 8000.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-10)
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f, htk=True), htk=True), f,
                               rtol=1e-10)
    # known HTK anchor: 1000 Hz ≈ 999.99 mel / slaney 1000 Hz = 15 * 200/3
    assert abs(hz_to_mel(1000.0, htk=True) - 999.9855) < 1e-3
    assert abs(hz_to_mel(1000.0) - 15.0) < 1e-12


def test_mel_filterbank_librosa_properties():
    fb = mel_filterbank_librosa(11025, 2048, 128)
    assert fb.shape == (128, 1025)
    assert np.all(fb >= 0)
    # with slaney norm each filter integrates (over Hz) to ~1:
    df = 11025 / 2 / 1024
    areas = fb.sum(axis=1) * df
    assert np.all(areas[5:-5] > 0.8) and np.all(areas[5:-5] < 1.2)


def test_mel_filterbank_torchaudio_properties():
    fb = mel_filterbank_torchaudio(11025, 2048, 64)
    assert fb.shape == (64, 1025)
    # unnormalized triangles peak at ~1
    assert 0.9 < fb.max() <= 1.0 + 1e-6
    # filters are sorted in frequency: argmax increases
    peaks = fb.argmax(axis=1)
    assert np.all(np.diff(peaks) > 0)


def test_mfcc_shape_and_sine_structure():
    sr = 11025
    y = make_sine(220.0, sr, 0.5)
    m = np.asarray(spectral.mfcc(y, sr, n_mfcc=64))
    assert m.shape == (11, 64)
    # batched call must equal per-clip calls (per-clip top_db clamp!)
    y2 = make_sine(440.0, sr, 0.5, amp=0.01)
    batch = np.asarray(spectral.mfcc(np.stack([y, y2]), sr, n_mfcc=64))
    np.testing.assert_allclose(batch[0], m, atol=1e-4)
    np.testing.assert_allclose(batch[1],
                               np.asarray(spectral.mfcc(y2, sr, n_mfcc=64)),
                               atol=1e-4)


def test_melspec_torchaudio_shape_and_peak():
    sr = 11025
    y = make_sine(440.0, sr, 0.5)
    S = np.asarray(spectral.melspectrogram_torchaudio(y, sr, to_db=False))
    assert S.shape == (22, 64)
    fb = mel_filterbank_torchaudio(sr, 2048, 64)
    grid = np.linspace(0, sr // 2, 1025)
    # the hottest mel bin should be the one whose filter peaks nearest 440 Hz
    hottest = S.mean(axis=0).argmax()
    peak_hz = grid[fb[hottest].argmax()]
    assert abs(peak_hz - 440.0) < 100.0


def test_power_to_db_per_clip_clamp():
    S = np.array([[[1e-12, 1.0]], [[1e-12, 1e-4]]])  # (2, 1, 2)
    out = np.asarray(spectral.power_to_db_librosa(S, spec_axes=2))
    # amin floors 1e-12 to -100 dB first; then clip 0 clamps at max-80
    np.testing.assert_allclose(out[0], [[-80.0, 0.0]], atol=1e-6)
    # clip 1: max -40 dB → floor at -120, so the -100 value is untouched
    np.testing.assert_allclose(out[1], [[-100.0, -40.0]], atol=1e-6)


def test_nyquist_trim_is_numerically_equivalent(rng):
    """Both mel conventions carry exactly zero weight at the Nyquist bin,
    so the mel front-ends run their DFT GEMM at 1024 output bins
    (8×128, MXU-aligned) instead of 1025. The result must equal the
    full-spectrum composition to reduction-reorder noise on BOTH
    backends."""
    from gat_tpu.ops.mel import mel_filterbank_librosa
    from gat_tpu.ops.spectral import _last_nonzero_bin

    for fbf in (mel_filterbank_librosa, mel_filterbank_torchaudio):
        fb = np.asarray(fbf(11025, 2048, 64))
        assert np.abs(fb[:, -1]).max() == 0.0
        assert _last_nonzero_bin(fb) == 1023

    y = rng.normal(0, 0.3, (2, 11025)).astype(np.float32)
    for backend in ("fft", "matmul"):
        spectral.set_stft_backend(backend)
        try:
            out = np.asarray(spectral.melspectrogram_torchaudio(
                y, 11025, hop_length=256, to_db=False))
            S = np.asarray(spectral.power_spectrogram(
                y, 2048, 256, pad_mode="reflect"))
            assert S.shape[-1] == 1025  # default stays full-width
            fb = np.asarray(mel_filterbank_torchaudio(11025, 2048, 64))
            ref = np.einsum("btf,mf->btm", S, fb)
            np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
        finally:
            spectral.set_stft_backend("fft")


def test_stft_matmul_backend_matches_fft():
    """The public complex stft() honors the matmul backend (TPUs have no
    FFT unit) and matches the fft route."""
    from gat_tpu.ops import spectral
    rng = np.random.default_rng(3)
    y = rng.normal(0, 0.3, 9000).astype(np.float32)
    old = spectral.stft_backend()
    try:
        spectral.set_stft_backend("matmul")
        z_mm = np.asarray(spectral.stft(jnp.asarray(y), 2048, 512))
        spectral.set_stft_backend("fft")
        z_ff = np.asarray(spectral.stft(jnp.asarray(y), 2048, 512))
    finally:
        spectral.set_stft_backend(old)
    assert z_mm.dtype == np.complex64
    np.testing.assert_allclose(z_mm, z_ff, atol=2e-3)
