"""First-party WAV decode/encode.

The reference reads/writes audio through librosa/soundfile (libsndfile)
(ref: version_1/source/audio/slicing.py:25,144, loading.py:85). Neither is
available here, so WAV I/O is implemented from scratch on stdlib `wave` +
struct parsing: PCM 8/16/24/32-bit and IEEE float32/64, mono or multi-channel
(multi-channel is averaged to mono like librosa.load(mono=True)).

Decoding returns float32 in [-1, 1) with the same scaling librosa/soundfile
use (int PCM divided by 2^(bits-1)).
"""
from __future__ import annotations

import os
import struct
from pathlib import Path

import numpy as np

__all__ = ["read_wav", "write_wav"]

_WAVE_FORMAT_PCM = 0x0001
_WAVE_FORMAT_IEEE_FLOAT = 0x0003
_WAVE_FORMAT_EXTENSIBLE = 0xFFFE


def _parse_chunks(data: bytes):
    """Yield (chunk_id, payload) for each RIFF chunk."""
    if len(data) < 12 or data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("[read_wav] Not a RIFF/WAVE file")
    pos = 12
    n = len(data)
    while pos + 8 <= n:
        cid = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        payload = data[pos + 8:pos + 8 + size]
        yield cid, payload
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def read_wav(path: str | os.PathLike, mono: bool = True) -> tuple[np.ndarray, int]:
    """Decode a .wav file.

    Returns (audio float32, sample_rate). audio shape: (n,) if mono=True,
    else (n, channels).
    """
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"[read_wav] File not found at: {path}")
    data = path.read_bytes()

    fmt = None
    raw = None
    for cid, payload in _parse_chunks(data):
        # exact native-codec chunk selection (wav_codec.cpp parse():
        # overwrite fmt until both are present, first data wins, then
        # stop): a file with duplicate chunks must decode identically
        # whether or not the native library loaded
        if cid == b"fmt ":
            fmt = payload
        elif cid == b"data" and raw is None:
            raw = payload
        if fmt is not None and raw is not None:
            break
    if fmt is None or raw is None:
        raise ValueError(f"[read_wav] Missing fmt/data chunk in {path}")
    if len(fmt) < 16:
        # guard before unpack: a raw struct.error would bypass callers'
        # ValueError handling (serve.py, read_wav_batch's fallback chain)
        # and lose the file path from the message
        raise ValueError(f"[read_wav] Truncated fmt chunk "
                         f"({len(fmt)} bytes) in {path}")

    (audio_format, n_channels, sample_rate, _byte_rate, _block_align,
     bits_per_sample) = struct.unpack_from("<HHIIHH", fmt, 0)
    if audio_format == _WAVE_FORMAT_EXTENSIBLE:
        # True format is the first 2 bytes of the 16-byte SubFormat GUID.
        if len(fmt) < 26:
            raise ValueError(f"[read_wav] EXTENSIBLE fmt chunk missing "
                             f"SubFormat GUID ({len(fmt)} bytes) in {path}")
        (audio_format,) = struct.unpack_from("<H", fmt, 24)

    # a truncated data chunk (interrupted copy) may not be a whole number
    # of samples — decode the intact ones, as the native codec does
    width = max(bits_per_sample // 8, 1)
    raw = raw[: (len(raw) // width) * width]

    if audio_format == _WAVE_FORMAT_PCM:
        if bits_per_sample == 8:
            x = np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
            x = (x - 128.0) / 128.0
        elif bits_per_sample == 16:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        elif bits_per_sample == 24:
            b = np.frombuffer(raw, dtype=np.uint8)
            b = b.reshape(-1, 3)
            # sign-extend 24-bit little-endian into int32
            x32 = (b[:, 0].astype(np.int32)
                   | (b[:, 1].astype(np.int32) << 8)
                   | (b[:, 2].astype(np.int32) << 16))
            x32 = np.where(x32 >= (1 << 23), x32 - (1 << 24), x32)
            x = x32.astype(np.float32) / float(1 << 23)
        elif bits_per_sample == 32:
            x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
        else:
            raise ValueError(f"[read_wav] Unsupported PCM depth: {bits_per_sample}")
    elif audio_format == _WAVE_FORMAT_IEEE_FLOAT:
        if bits_per_sample == 32:
            x = np.frombuffer(raw, dtype="<f4").astype(np.float32)
        elif bits_per_sample == 64:
            x = np.frombuffer(raw, dtype="<f8").astype(np.float32)
        else:
            raise ValueError(f"[read_wav] Unsupported float depth: {bits_per_sample}")
    else:
        raise ValueError(f"[read_wav] Unsupported WAV format code: {audio_format}")

    if n_channels > 1:
        x = x[: (len(x) // n_channels) * n_channels].reshape(-1, n_channels)
        if mono:
            x = x.mean(axis=1)  # librosa.to_mono semantics
    return np.ascontiguousarray(x, dtype=np.float32), int(sample_rate)


def write_wav(path: str | os.PathLike, audio: np.ndarray, sr: int,
              subtype: str = "PCM_16") -> None:
    """Encode a .wav file.

    subtype: "PCM_16" (soundfile's default for float input,
    ref slicing.py:144 writes via sf.write which defaults to PCM_16),
    "PCM_24", "PCM_32", or "FLOAT".
    """
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    audio = np.asarray(audio)
    if audio.ndim == 1:
        n_channels = 1
    elif audio.ndim == 2:
        n_channels = audio.shape[1]
    else:
        raise ValueError("[write_wav] audio must be 1-D or 2-D (n, channels)")

    if subtype == "FLOAT":
        fmt_code, bits = _WAVE_FORMAT_IEEE_FLOAT, 32
        payload = audio.astype("<f4").tobytes()
    elif subtype == "PCM_16":
        fmt_code, bits = _WAVE_FORMAT_PCM, 16
        q = np.clip(np.round(audio.astype(np.float64) * 32768.0), -32768, 32767)
        payload = q.astype("<i2").tobytes()
    elif subtype == "PCM_24":
        fmt_code, bits = _WAVE_FORMAT_PCM, 24
        q = np.clip(np.round(audio.astype(np.float64) * float(1 << 23)),
                    -(1 << 23), (1 << 23) - 1).astype(np.int32)
        b = np.empty((q.size, 3), dtype=np.uint8)
        flat = q.reshape(-1)
        b[:, 0] = flat & 0xFF
        b[:, 1] = (flat >> 8) & 0xFF
        b[:, 2] = (flat >> 16) & 0xFF
        payload = b.tobytes()
    elif subtype == "PCM_32":
        fmt_code, bits = _WAVE_FORMAT_PCM, 32
        q = np.clip(np.round(audio.astype(np.float64) * 2147483648.0),
                    -2147483648, 2147483647)
        payload = q.astype("<i4").tobytes()
    else:
        raise ValueError(f"[write_wav] Unsupported subtype: {subtype}")

    block_align = n_channels * bits // 8
    byte_rate = sr * block_align
    fmt = struct.pack("<HHIIHH", fmt_code, n_channels, sr, byte_rate,
                      block_align, bits)
    extra = []
    if fmt_code == _WAVE_FORMAT_IEEE_FLOAT:
        # non-PCM formats: 18-byte fmt (cbSize=0) + fact chunk with the
        # frame count — strict libsndfile-family readers reject format-3
        # files without them (same layout as native/wav_codec.cpp)
        fmt += struct.pack("<H", 0)
        n_frames = len(payload) // block_align if block_align else 0
        extra = [b"fact", struct.pack("<I", 4), struct.pack("<I", n_frames)]
    chunks = b"".join([
        b"fmt ", struct.pack("<I", len(fmt)), fmt, *extra,
        b"data", struct.pack("<I", len(payload)), payload,
        b"" if len(payload) % 2 == 0 else b"\x00",
    ])
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks)
