"""Native C++ WAV codec vs the pure-Python decoder."""
import numpy as np
import pytest

from gat_tpu.utils import native_wav
from gat_tpu.utils.wavio import write_wav, read_wav

needs_native = pytest.mark.skipif(not native_wav.native_available(),
                                  reason="g++/toolchain unavailable")


@needs_native
@pytest.mark.parametrize("subtype", ["PCM_16", "PCM_24", "PCM_32", "FLOAT"])
def test_native_matches_python(tmp_path, rng, subtype):
    x = rng.uniform(-0.8, 0.8, 3001).astype(np.float32)
    p = tmp_path / "a.wav"
    write_wav(p, x, 22050, subtype=subtype)
    nat, sr_n = native_wav.read_wav_native(p)
    py, sr_p = read_wav(p)
    assert sr_n == sr_p == 22050
    np.testing.assert_allclose(nat, py, atol=1e-6)


@needs_native
def test_native_stereo_average(tmp_path, rng):
    st = rng.uniform(-0.5, 0.5, (500, 2)).astype(np.float32)
    p = tmp_path / "st.wav"
    write_wav(p, st, 16000, subtype="FLOAT")
    nat, _ = native_wav.read_wav_native(p)
    np.testing.assert_allclose(nat, st.mean(axis=1), atol=1e-6)


@needs_native
def test_native_errors(tmp_path):
    with pytest.raises(FileNotFoundError):
        native_wav.read_wav_native(tmp_path / "missing.wav")
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"definitely not a wav")
    with pytest.raises(ValueError):
        native_wav.read_wav_native(bad)


def test_batch_decode_order_and_fallback(tmp_path, rng):
    paths = []
    for i in range(8):
        x = np.full(100 + i, 0.01 * (i + 1), np.float32)
        p = tmp_path / f"{i}.wav"
        write_wav(p, x, 8000, subtype="FLOAT")
        paths.append(p)
    out = native_wav.read_wav_batch(paths)
    assert len(out) == 8
    for i, (x, sr) in enumerate(out):
        assert sr == 8000
        assert len(x) == 100 + i
        np.testing.assert_allclose(x, 0.01 * (i + 1), atol=1e-6)


def test_loader_uses_batch_decode(tmp_path, rng):
    from gat_tpu.data.loader import AudioDatasetLoader
    for label, f in [("A2", 0.1), ("E3", 0.2)]:
        d = tmp_path / label
        d.mkdir()
        for j in range(3):
            write_wav(d / f"{j}.wav",
                      rng.uniform(-0.3, 0.3, 4000).astype(np.float32),
                      22050)
    loader = AudioDatasetLoader([tmp_path], target_sr=11025, duration=0.25)
    wavs, srs, labels, paths = loader.load_audio_dataset()
    assert len(wavs) == 6
    assert set(labels) == {"A2", "E3"}
    assert all(len(w) == int(11025 * 0.25) for w in wavs)


@needs_native
@pytest.mark.parametrize("subtype", ["PCM_16", "FLOAT"])
def test_native_encode_bit_identical_to_python(tmp_path, rng, subtype):
    """write_wav_native must produce byte-compatible samples with the
    Python encoder (same ×32768 round-half-even PCM16 quantization)."""
    x = rng.uniform(-1.2, 1.2, 4321).astype(np.float32)  # incl. clipping
    pn, pp = tmp_path / "n.wav", tmp_path / "p.wav"
    native_wav.write_wav_native(pn, x, 22050, subtype=subtype)
    write_wav(pp, x, 22050, subtype=subtype)
    a, sr_a = read_wav(pn)
    b, sr_b = read_wav(pp)
    assert sr_a == sr_b == 22050
    np.testing.assert_array_equal(a, b)
    # and the native decoder agrees with itself
    c, _ = native_wav.read_wav_native(pn)
    np.testing.assert_array_equal(c, a)


@needs_native
def test_native_encode_float_roundtrip_exact(tmp_path, rng):
    x = rng.normal(0, 0.3, 999).astype(np.float32)
    p = tmp_path / "f.wav"
    native_wav.write_wav_native(p, x, 8000, subtype="FLOAT")
    got, sr = native_wav.read_wav_native(p)
    assert sr == 8000
    np.testing.assert_array_equal(got, x)


@needs_native
def test_native_encode_rejects_bad_args(tmp_path):
    with pytest.raises(ValueError):
        native_wav.write_wav_native(tmp_path / "x.wav",
                                    np.zeros(10, np.float32), 22050,
                                    subtype="PCM_24")
    with pytest.raises(ValueError):
        native_wav.write_wav_native(tmp_path / "y.wav",
                                    np.zeros((10, 2), np.float32), 22050)


def test_write_wav_batch_mixed_subtypes(tmp_path, rng):
    """Batch write (native or fallback) round-trips every clip; stereo
    and PCM_24 fall back to the Python encoder transparently."""
    items = [(tmp_path / f"c{i}.wav",
              rng.uniform(-0.5, 0.5, 200 + i).astype(np.float32), 11025)
             for i in range(8)]
    native_wav.write_wav_batch(items)
    for pth, src, sr in items:
        got, s = read_wav(pth)
        assert s == sr
        np.testing.assert_allclose(got, src, atol=1.0 / 32768)
    p24 = tmp_path / "p24.wav"
    native_wav.write_wav_batch([(p24, items[0][1], 44100)],
                               subtype="PCM_24")
    got, s = read_wav(p24)
    assert s == 44100
    np.testing.assert_allclose(got, items[0][1], atol=1.0 / (1 << 23))


@needs_native
def test_float_wav_strict_reader_shape(tmp_path):
    """FLOAT (format-3) files must carry an 18-byte fmt chunk (cbSize=0)
    and a fact chunk with the frame count — the shape strict libsndfile-
    family readers require for non-PCM formats (r2 advisor finding).
    Both decoders must still read them bit-exactly."""
    import struct
    from gat_tpu.utils.wavio import read_wav
    x = (np.sin(np.linspace(0, 80, 2205)) * 0.7).astype(np.float32)
    p = tmp_path / "f32.wav"
    native_wav.write_wav_native(p, x, 22050, subtype="FLOAT")
    raw = p.read_bytes()
    assert struct.unpack("<I", raw[16:20])[0] == 18     # fmt size
    assert struct.unpack("<H", raw[20:22])[0] == 3      # IEEE float
    assert struct.unpack("<H", raw[36:38])[0] == 0      # cbSize
    assert raw[38:42] == b"fact"
    assert struct.unpack("<I", raw[46:50])[0] == len(x)  # frame count
    y_n, sr_n = native_wav.read_wav_native(p)
    y_p, sr_p = read_wav(p)
    assert sr_n == sr_p == 22050
    np.testing.assert_array_equal(y_n, x)
    np.testing.assert_array_equal(y_p, x)


def test_duplicate_data_chunks_decode_identically(tmp_path):
    """Chunk selection parity: a WAV with a second (junk) data chunk must
    decode to the same audio through the native codec and the Python
    fallback (both keep the first data chunk and stop)."""
    import struct
    from gat_tpu.utils.native_wav import read_wav_native, native_available
    from gat_tpu.utils.wavio import read_wav, write_wav

    p = tmp_path / "dup.wav"
    y = (np.sin(np.arange(500) * 0.05) * 0.5).astype(np.float32)
    write_wav(p, y, 22050)
    # append a junk data chunk after the real one
    extra = b"data" + struct.pack("<I", 8) + b"\x7f\x7f" * 4
    blob = p.read_bytes() + extra
    blob = blob[:4] + struct.pack("<I", len(blob) - 8) + blob[8:]
    p.write_bytes(blob)

    y_py, sr_py = read_wav(p)
    np.testing.assert_allclose(y_py, y, atol=1.0 / 32768)
    if native_available():
        y_nat, sr_nat = read_wav_native(p)
        assert sr_nat == sr_py
        np.testing.assert_array_equal(y_nat, y_py)


def test_native_unopenable_path_falls_back_not_aborts(tmp_path):
    """An fopen failure that is NOT a missing file (e.g. a directory)
    raises ValueError so read_wav_batch retries via the Python decoder
    instead of aborting the whole batch with FileNotFoundError."""
    from gat_tpu.utils.native_wav import (read_wav_native,
                                          native_available)
    if not native_available():
        pytest.skip("native codec unavailable")
    d = tmp_path / "adir.wav"
    d.mkdir()
    # a directory: fopen succeeds on Linux, parse fails (-2) → ValueError
    # (on platforms where fopen itself fails, the exists() check routes
    # rc=-1 to ValueError too) — either way the batch fallback retries
    with pytest.raises(ValueError, match=r"\[read_wav_native\]"):
        read_wav_native(d)
    with pytest.raises(FileNotFoundError):
        read_wav_native(tmp_path / "absent.wav")


def test_native_handles_non_utf8_filenames(tmp_path):
    """Surrogate-escaped (non-UTF-8) filenames must reach the C codec
    via os.fsencode, not str.encode (which raises UnicodeEncodeError)."""
    import os
    from gat_tpu.utils.native_wav import (read_wav_native,
                                          write_wav_native,
                                          native_available)
    if not native_available():
        pytest.skip("native codec unavailable")
    name = os.fsdecode(b"weird_\xff_name.wav")
    p = tmp_path / name
    y = (np.sin(np.arange(400) * 0.1) * 0.3).astype(np.float32)
    write_wav_native(p, y, 22050)
    got, sr = read_wav_native(p)
    assert sr == 22050
    np.testing.assert_allclose(got, y, atol=1.0 / 32768)
