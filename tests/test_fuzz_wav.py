"""Fuzz both WAV decoders: malformed input must raise cleanly, never
crash or hang (the native codec runs in-process — a segfault would take
Python down with it)."""
import struct

import numpy as np
import pytest

from gat_tpu.utils import native_wav
from gat_tpu.utils.wavio import read_wav


def _cases(tmp_path, rng):
    cases = {}
    cases["empty"] = b""
    cases["short"] = b"RIFF"
    cases["not_riff"] = rng.bytes(128)
    cases["riff_only"] = b"RIFF" + struct.pack("<I", 4) + b"WAVE"
    # fmt chunk declared but truncated
    cases["tiny_fmt"] = (b"RIFF" + struct.pack("<I", 30) + b"WAVE"
                         + b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x01\x00"
                         + b"data" + struct.pack("<I", 0))
    # huge data-size field with no payload
    cases["huge_data"] = (b"RIFF" + struct.pack("<I", 100) + b"WAVE"
                          + b"fmt " + struct.pack("<I", 16)
                          + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
                          + b"data" + struct.pack("<I", 0xFFFFFFF0))
    # bogus format code
    cases["weird_fmt"] = (b"RIFF" + struct.pack("<I", 60) + b"WAVE"
                          + b"fmt " + struct.pack("<I", 16)
                          + struct.pack("<HHIIHH", 0x77, 1, 8000, 8000, 1, 8)
                          + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    # huge FMT-size field with a tiny file: must not drive a 4 GiB
    # allocation (std::bad_alloc through the FFI would kill the process)
    cases["huge_fmt"] = (b"RIFF" + struct.pack("<I", 100) + b"WAVE"
                         + b"fmt " + struct.pack("<I", 0xFFFFFFF0)
                         + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
                         + b"data" + struct.pack("<I", 0))
    # random mutations of a valid file
    from gat_tpu.utils.wavio import write_wav
    good = tmp_path / "good.wav"
    write_wav(good, rng.uniform(-0.5, 0.5, 256).astype(np.float32), 8000)
    base = bytearray(good.read_bytes())
    for k in range(6):
        mutated = bytearray(base)
        for _ in range(8):
            mutated[rng.integers(0, len(mutated))] = rng.integers(0, 256)
        cases[f"mutated_{k}"] = bytes(mutated)
    return cases


def test_python_decoder_never_crashes(tmp_path, rng):
    for name, payload in _cases(tmp_path, rng).items():
        p = tmp_path / f"{name}.wav"
        p.write_bytes(payload)
        try:
            y, sr = read_wav(p)
            assert y.dtype == np.float32  # survived mutation: fine
        except (ValueError, struct.error):
            pass  # clean rejection


@pytest.mark.skipif(not native_wav.native_available(),
                    reason="toolchain unavailable")
def test_native_decoder_never_crashes(tmp_path, rng):
    for name, payload in _cases(tmp_path, rng).items():
        p = tmp_path / f"n_{name}.wav"
        p.write_bytes(payload)
        try:
            y, sr = native_wav.read_wav_native(p)
            assert y.dtype == np.float32
        except (ValueError, FileNotFoundError):
            pass


def test_truncated_pcm16_decodes_partially(tmp_path, rng):
    """A data chunk cut mid-sample (interrupted copy) decodes the intact
    samples in BOTH decoders instead of crashing the dataset load."""
    from gat_tpu.utils.wavio import write_wav
    good = tmp_path / "t.wav"
    write_wav(good, rng.uniform(-0.5, 0.5, 256).astype(np.float32), 8000)
    cut = tmp_path / "cut.wav"
    cut.write_bytes(good.read_bytes()[:-1])  # one byte short
    y, sr = read_wav(cut)
    assert sr == 8000 and len(y) == 255
    if native_wav.native_available():
        yn, srn = native_wav.read_wav_native(cut)
        assert srn == 8000 and len(yn) == 255
        np.testing.assert_allclose(yn, y, atol=1e-6)
