import numpy as np
import pytest

from gat_tpu.utils.wavio import read_wav, write_wav


@pytest.mark.parametrize("subtype,tol", [
    ("PCM_16", 1.0 / 32768),
    ("PCM_24", 1.0 / (1 << 23)),
    ("PCM_32", 1e-7),
    ("FLOAT", 1e-7),
])
def test_roundtrip(tmp_path, rng, subtype, tol):
    x = (rng.uniform(-0.9, 0.9, 4096)).astype(np.float32)
    p = tmp_path / "a.wav"
    write_wav(p, x, 22050, subtype=subtype)
    y, sr = read_wav(p)
    assert sr == 22050
    assert y.dtype == np.float32
    assert y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=tol)


def test_stereo_to_mono(tmp_path, rng):
    left = rng.uniform(-0.5, 0.5, 1000).astype(np.float32)
    right = rng.uniform(-0.5, 0.5, 1000).astype(np.float32)
    p = tmp_path / "st.wav"
    write_wav(p, np.stack([left, right], axis=1), 8000, subtype="FLOAT")
    y, sr = read_wav(p, mono=True)
    np.testing.assert_allclose(y, (left + right) / 2, atol=1e-6)
    y2, _ = read_wav(p, mono=False)
    assert y2.shape == (1000, 2)


def test_stdlib_wave_compat(tmp_path, rng):
    """Our PCM_16 files must be readable by the stdlib wave module and
    vice versa."""
    import wave
    x = rng.uniform(-0.9, 0.9, 2048).astype(np.float32)
    p = tmp_path / "w.wav"
    write_wav(p, x, 16000, subtype="PCM_16")
    with wave.open(str(p)) as w:
        assert w.getframerate() == 16000
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        raw = w.readframes(w.getnframes())
    ref = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    y, _ = read_wav(p)
    np.testing.assert_allclose(y, ref)


def test_missing_file():
    with pytest.raises(FileNotFoundError):
        read_wav("/nonexistent/x.wav")


def test_float_wav_has_fact_chunk_and_cbsize(tmp_path, rng):
    """Python-path FLOAT files carry the 18-byte fmt (cbSize=0) + fact
    chunk strict non-PCM readers require — same layout as the native
    encoder — and still round-trip through both decoders."""
    import struct
    from gat_tpu.utils import native_wav
    y = rng.uniform(-0.5, 0.5, 300).astype(np.float32)
    p = tmp_path / "f.wav"
    write_wav(p, y, 8000, subtype="FLOAT")
    b = p.read_bytes()
    i = b.index(b"fmt ")
    (fmt_size,) = struct.unpack_from("<I", b, i + 4)
    assert fmt_size == 18
    (cbsize,) = struct.unpack_from("<H", b, i + 8 + 16)
    assert cbsize == 0
    j = b.index(b"fact")
    (n_frames,) = struct.unpack_from("<I", b, j + 8)
    assert n_frames == 300
    got, sr = read_wav(p)
    np.testing.assert_array_equal(got, y)
    if native_wav.native_available():
        got_n, sr_n = native_wav.read_wav_native(p)
        np.testing.assert_array_equal(got_n, y)


def test_read_wav_batch_accepts_generator(tmp_path, rng):
    from gat_tpu.utils.native_wav import read_wav_batch
    paths = []
    for i in range(3):
        p = tmp_path / f"g{i}.wav"
        write_wav(p, rng.uniform(-0.5, 0.5, 64).astype(np.float32), 8000)
        paths.append(p)
    out = read_wav_batch(p for p in paths)
    assert len(out) == 3 and all(sr == 8000 for _, sr in out)


def test_read_wav_truncated_fmt_raises_valueerror(tmp_path):
    """A truncated fmt chunk must surface as the module's '[read_wav]'
    ValueError (with the path), not a raw struct.error that bypasses
    callers' error handling."""
    import struct
    p = tmp_path / "trunc.wav"
    fmt = struct.pack("<HH", 1, 1)  # 4-byte fmt payload (needs 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 4) + b"\x00" * 4
    p.write_bytes(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE"
                  + body)
    with pytest.raises(ValueError, match=r"\[read_wav\].*trunc\.wav"):
        read_wav(p)


def test_read_wav_extensible_without_guid_raises_valueerror(tmp_path):
    """WAVE_FORMAT_EXTENSIBLE with a bare 16-byte fmt (no SubFormat
    GUID) must raise the module's ValueError, not struct.error."""
    import struct
    p = tmp_path / "ext.wav"
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 22050, 44100, 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 4) + b"\x00" * 4
    p.write_bytes(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE"
                  + body)
    with pytest.raises(ValueError, match=r"\[read_wav\].*SubFormat"):
        read_wav(p)
