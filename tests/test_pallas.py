"""Pallas fused MFCC kernel vs the XLA pipeline (interpret mode on CPU)."""
import numpy as np
import pytest

from gat_tpu.ops import spectral
from gat_tpu.ops.pallas.mfcc_frontend import mfcc_mean_pallas
from tests.conftest import make_pluck, make_sine


def _reference_mfcc_mean(clips, sr):
    import jax.numpy as jnp
    m = spectral.mfcc(jnp.asarray(clips), sr, n_mfcc=64)
    return np.asarray(jnp.mean(m, axis=-2))


@pytest.mark.parametrize("batch", [1, 3])
def test_pallas_matches_xla(batch):
    sr = 11025
    freqs = [110.0, 196.0, 329.63][:batch]
    clips = np.stack([make_pluck(f, sr, 0.5, seed=i)[:5512]
                      for i, f in enumerate(freqs)])
    got = np.asarray(mfcc_mean_pallas(clips, sr, block_b=8,
                                      interpret=True))
    ref = _reference_mfcc_mean(clips, sr)
    assert got.shape == ref.shape == (batch, 64)
    np.testing.assert_allclose(got, ref, atol=0.05)


def test_pallas_batch_padding():
    """A batch that doesn't divide block_b must still be correct."""
    sr = 11025
    clips = np.stack([make_sine(f, sr, 0.5)[:5512]
                      for f in (220.0, 440.0, 330.0, 550.0, 660.0)])
    got = np.asarray(mfcc_mean_pallas(clips, sr, block_b=4,
                                      interpret=True))
    ref = _reference_mfcc_mean(clips, sr)
    np.testing.assert_allclose(got, ref, atol=0.05)


def test_pallas_quiet_clip_clamp():
    """Per-clip top_db clamp: a quiet clip's floor tracks its own max."""
    sr = 11025
    loud = make_sine(220.0, sr, 0.5, amp=0.5)[:5512]
    quiet = make_sine(220.0, sr, 0.5, amp=0.001)[:5512]
    clips = np.stack([loud, quiet])
    got = np.asarray(mfcc_mean_pallas(clips, sr, block_b=8,
                                      interpret=True))
    ref = _reference_mfcc_mean(clips, sr)
    np.testing.assert_allclose(got, ref, atol=0.05)


def test_melspec_pallas_matches_xla():
    from gat_tpu.ops.pallas.melspec_frontend import melspec_pallas
    from gat_tpu.features import melspec_features
    import jax.numpy as jnp
    sr = 11025
    clips = np.stack([make_pluck(f, sr, 0.5, seed=i)[:5512]
                      for i, f in enumerate([110.0, 246.94, 440.0])])
    got = np.asarray(melspec_pallas(clips, sr, block_b=4, interpret=True))
    ref = np.asarray(melspec_features(jnp.asarray(clips), sr,
                                      normalize_audio_volume=False))
    assert got.shape == ref.shape == (3, 64, 22, 1)
    signal = ref > -60.0
    np.testing.assert_allclose(got[signal], ref[signal], atol=0.05)
    np.testing.assert_allclose(got, ref, atol=1.0)
