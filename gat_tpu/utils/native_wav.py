"""ctypes bindings for the native WAV decoder (native/wav_codec.cpp).

Compiled on demand with g++ (cached under native/build/); every entry
point degrades to the pure-Python decoder in utils/wavio.py when the
toolchain or library is unavailable. ctypes releases the GIL during the
C call, so `read_wav_batch` decodes a dataset's files with real thread
parallelism — the host-side loading stage the reference runs file-by-file
through librosa (ref loading.py:72-87).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

__all__ = ["native_available", "read_wav_native", "read_wav_batch",
           "write_wav_native", "write_wav_batch"]

_REPO = Path(__file__).resolve().parent.parent.parent
_SRC = _REPO / "native" / "wav_codec.cpp"
_LIB = _REPO / "native" / "build" / "libwavcodec.so"

_lock = threading.Lock()
_lib = None
_tried = False

# subtypes the native encoder implements (bits per sample) — the single
# capability list consulted by write_wav_native AND the batch pre-gate,
# so extending the C codec cannot silently leave the batch path on the
# slow Python encoder
_NATIVE_SUBTYPES = {"PCM_16": 16, "FLOAT": 32}


def _map_batch(fn, items, max_workers: int | None):
    """Shared thread-pool scaffolding for the batch codecs: order-
    preserving, sequential short-circuit for tiny batches."""
    items = list(items)  # accept generators
    workers = max_workers or min(16, (os.cpu_count() or 4))
    if len(items) <= 1 or workers == 1:
        return [fn(it) for it in items]
    with ThreadPoolExecutor(max_workers=workers) as ex:
        return list(ex.map(fn, items))


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not _LIB.exists() or (_SRC.exists() and
                                     _SRC.stat().st_mtime
                                     > _LIB.stat().st_mtime):
                _LIB.parent.mkdir(parents=True, exist_ok=True)
                # compile to a per-process temp path and publish with an
                # atomic rename: a concurrent process must never CDLL a
                # half-written library
                tmp = _LIB.with_suffix(f".tmp{os.getpid()}.so")
                try:
                    subprocess.run(
                        ["g++", "-O2", "-shared", "-fPIC", "-o", str(tmp),
                         str(_SRC)],
                        check=True, capture_output=True, timeout=120)
                    os.replace(tmp, _LIB)
                finally:
                    # a failed/timed-out compile must not leave the
                    # per-pid temp artifact behind (pids recycle)
                    tmp.unlink(missing_ok=True)
            lib = ctypes.CDLL(str(_LIB))
            lib.wav_probe.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_long)]
            lib.wav_probe.restype = ctypes.c_int
            lib.wav_decode.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_long, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_long)]
            lib.wav_decode.restype = ctypes.c_int
            lib.wav_encode.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_long, ctypes.c_int, ctypes.c_int]
            lib.wav_encode.restype = ctypes.c_int
            _lib = lib
        except Exception as e:
            # degrade to the pure-Python codec, but NOT silently: the
            # whole decode stage slows by a large factor and the failure
            # is cached for the process lifetime, so say why, once
            detail = e.stderr.decode(errors="replace").strip() \
                if getattr(e, "stderr", None) else str(e)
            print("[native_wav] native codec unavailable — falling back "
                  f"to the pure-Python WAV codec ({type(e).__name__}: "
                  f"{detail[:500]})")
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def read_wav_native(path) -> tuple[np.ndarray, int]:
    """Decode one file to mono float32 via the native codec; raises on
    failure (callers fall back to the Python decoder)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("[read_wav_native] native codec unavailable")
    p = os.fsencode(path)  # not .encode(): surrogate-escaped names exist
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    frames = ctypes.c_long()
    rc = lib.wav_probe(p, ctypes.byref(sr), ctypes.byref(ch),
                       ctypes.byref(frames))
    if rc == -1:
        # fopen failure ≠ missing file: EACCES/EMFILE/EISDIR land here
        # too. Only a genuinely absent file gets FileNotFoundError; the
        # rest raise ValueError so read_wav_batch's per-file fallback
        # retries through the Python decoder (which reports the real
        # errno) instead of aborting the whole batch
        if not os.path.exists(path):
            raise FileNotFoundError(f"[read_wav_native] no such file: "
                                    f"{path}")
        raise ValueError(f"[read_wav_native] cannot open: {path}")
    if rc:
        raise ValueError(f"[read_wav_native] bad wav ({rc}): {path}")
    out = np.empty(frames.value, np.float32)
    got = ctypes.c_long()
    rc = lib.wav_decode(p, out.ctypes.data_as(
        ctypes.POINTER(ctypes.c_float)), frames.value, ctypes.byref(sr),
        ctypes.byref(got))
    if rc:
        raise ValueError(f"[read_wav_native] decode failed ({rc}): {path}")
    return out[:got.value], sr.value


def write_wav_native(path, audio: np.ndarray, sr: int,
                     subtype: str = "PCM_16") -> None:
    """Encode one mono float32 array via the native codec (PCM_16 or
    FLOAT); raises on failure (callers fall back to the Python
    encoder). Matches utils/wavio.write_wav's PCM16 quantization
    (×32768, round-half-even, clipped)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("[write_wav_native] native codec unavailable")
    bits = _NATIVE_SUBTYPES.get(subtype)
    if bits is None:
        raise ValueError(f"[write_wav_native] unsupported subtype "
                         f"{subtype!r} (native: "
                         f"{', '.join(_NATIVE_SUBTYPES)})")
    audio = np.ascontiguousarray(np.asarray(audio), dtype=np.float32)
    if audio.ndim != 1:
        raise ValueError("[write_wav_native] mono (1-D) audio only")
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    rc = lib.wav_encode(
        os.fsencode(path),
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        audio.size, int(sr), bits)
    if rc:
        raise ValueError(f"[write_wav_native] encode failed ({rc}): {path}")


def write_wav_batch(items, max_workers: int | None = None,
                    subtype: str = "PCM_16") -> None:
    """Encode many (path, audio, sr) mono clips in parallel (native
    codec + thread pool, GIL released in C); per-item fallback to the
    Python encoder — the dataset-creator/slicer write stage the
    reference runs file-by-file through soundfile (ref slicing.py:144)."""
    from .wavio import write_wav

    def one(item):
        path, audio, sr = item
        if native_available() and np.asarray(audio).ndim == 1 \
                and subtype in _NATIVE_SUBTYPES:
            try:
                write_wav_native(path, audio, sr, subtype)
                return
            except ValueError:
                pass
        write_wav(path, audio, sr, subtype)

    _map_batch(one, items, max_workers)


def read_wav_batch(paths, max_workers: int | None = None):
    """Decode many files in parallel (native codec + thread pool, GIL
    released in C). Falls back to the Python decoder per file. Returns a
    list of (audio, sr) in input order."""
    from .wavio import read_wav

    def one(p):
        if native_available():
            try:
                return read_wav_native(p)
            except ValueError:
                pass  # unusual subtype / unreadable → python path
        return read_wav(p)

    return _map_batch(one, paths, max_workers)
