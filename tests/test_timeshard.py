"""Sequence-parallel (time-sharded) long-audio segmentation vs the
single-device path — envelopes and onsets must agree."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gat_tpu.ops.onset import onset_strength, detect_onsets
from gat_tpu.parallel import make_mesh
from gat_tpu.parallel.timeshard import (onset_envelope_timesharded,
                                        detect_onsets_timesharded)
from tests.conftest import make_pluck

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

SR = 22050


def _long_song(n_notes=10, spacing=0.7):
    freqs = [82.41, 110.0, 146.83, 196.0, 246.94, 329.63]
    y = np.zeros(int((n_notes * spacing + 1.0) * SR), np.float32)
    for k in range(n_notes):
        f = freqs[k % len(freqs)]
        n = make_pluck(f, SR, 0.45, seed=k)
        fade = int(0.3 * len(n))
        n[-fade:] *= np.linspace(1, 0, fade, dtype=np.float32)
        s = int((0.4 + k * spacing) * SR)
        y[s:s + len(n)] += n
    return y


def test_envelope_matches_single_device():
    mesh = make_mesh(8)
    y = _long_song()
    env_sp = np.asarray(onset_envelope_timesharded(jnp.asarray(y), mesh,
                                                   SR))
    env_ref = np.asarray(onset_strength(jnp.asarray(y), SR))
    n = min(len(env_sp), len(env_ref))
    np.testing.assert_allclose(env_sp[:n], env_ref[:n], atol=1e-3)


def test_onsets_match_single_device():
    mesh = make_mesh(8)
    y = _long_song()
    o_sp, v_sp, *_ = detect_onsets_timesharded(jnp.asarray(y), mesh, sr=SR)
    o_ref, v_ref, *_ = detect_onsets(jnp.asarray(y), sr=SR, max_onsets=256)
    got = np.asarray(o_sp)[np.asarray(v_sp)]
    ref = np.asarray(o_ref)[np.asarray(v_ref)]
    np.testing.assert_array_equal(got, ref)
    assert len(ref) == 10  # every pluck found


def test_envelope_even_shard_tail(rng):
    """Regression: when the frame count divides the shard count exactly,
    the sharded body truncates real tail samples — the last shard must
    receive them as its halo (not zeros) or the final envelope frames
    show spurious flux."""
    mesh = make_mesh(8)
    # 175616 samples → t_global = 344 = 8 × 43, loud to the very end
    n = 175616
    t = np.arange(n) / SR
    y = (0.4 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    env_sp = np.asarray(onset_envelope_timesharded(jnp.asarray(y), mesh,
                                                   SR))
    env_ref = np.asarray(onset_strength(jnp.asarray(y), SR))
    m = min(len(env_sp), len(env_ref))
    np.testing.assert_allclose(env_sp[:m], env_ref[:m], atol=1e-3)


def test_envelope_parity_with_loud_final_tail():
    """The top_db clamp peak must be taken over the REAL frames only
    (round-5 review): a recording whose loudest content sits in its
    final samples can otherwise raise the peak via the ≤ d-1 budget
    frames past t_global — which window the tail at weights no exact
    frame uses — shifting every frame's clamp floor away from the
    single-device envelope."""
    mesh = make_mesh(8)
    y = _long_song(n_notes=6, spacing=0.7) * 0.05  # quiet body
    y[-400:] = 0.9  # loudest content inside the last <512 samples
    env_sp = np.asarray(onset_envelope_timesharded(jnp.asarray(y), mesh,
                                                   SR))
    env_ref = np.asarray(onset_strength(jnp.asarray(y), SR))
    n = min(len(env_sp), len(env_ref))
    np.testing.assert_allclose(env_sp[:n], env_ref[:n], atol=1e-3)
