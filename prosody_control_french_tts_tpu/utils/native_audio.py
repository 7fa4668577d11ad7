"""ctypes bindings for the native audio ingest runtime (native/audioio.cpp).

The compiled loader covers the hot host-side path — corpus decode +
resample + padded-batch assembly — with graceful degradation to the pure
Python/scipy implementations when the shared library isn't built
(mirroring the reference's degrade-don't-die ethos). Build on demand:

    make -C native          # or ensure_built()
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

log = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libaudioio.so"
_lib = None


def ensure_built(force: bool = False) -> bool:
    """Compile libaudioio.so if missing. Returns availability."""
    global _lib
    if _lib is not None and not force:
        return True
    if not _LIB_PATH.exists() or force:
        src = _NATIVE_DIR / "audioio.cpp"
        if not src.exists():
            return False
        try:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", str(src), "-o", str(_LIB_PATH)],
                check=True,
                capture_output=True,
                timeout=300,
            )
        except (subprocess.SubprocessError, FileNotFoundError) as e:
            log.warning("native audioio build failed: %s", e)
            return False
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError as e:
        log.warning("cannot load libaudioio.so: %s", e)
        return False
    lib.audioio_decode.restype = ctypes.c_long
    lib.audioio_decode.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.audioio_decode_resampled.restype = ctypes.c_long
    lib.audioio_decode_resampled.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
    ]
    lib.audioio_load_batch.restype = ctypes.c_long
    lib.audioio_load_batch.argtypes = [
        ctypes.c_char_p,
        ctypes.c_long,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_long),
    ]
    lib.audioio_load_batch_i16.restype = ctypes.c_long
    lib.audioio_load_batch_i16.argtypes = [
        ctypes.c_char_p,
        ctypes.c_long,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int16),
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_long),
    ]
    lib.audioio_write_wav_f32.restype = ctypes.c_long
    lib.audioio_write_wav_f32.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.audioio_window_rms.restype = ctypes.c_long
    lib.audioio_window_rms.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
    ]
    _lib = lib
    return True


def available() -> bool:
    return _lib is not None or ensure_built()


def decode(path: str | Path, max_seconds: float = 3600.0):
    """→ (float32 mono samples, rate) or None if unavailable/failed."""
    if not available():
        return None
    max_out = int(max_seconds * 192000)
    buf = np.empty(max_out, np.float32)
    rate = ctypes.c_int(0)
    n = _lib.audioio_decode(
        str(path).encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_out, ctypes.byref(rate)
    )
    if n < 0:
        return None
    return buf[:n].copy(), rate.value


def load_batch(paths: list[str | Path], stride: int, target_rate: int = 0):
    """Decode many files into a padded [S, stride] float32 array.

    Returns (batch, lengths, rate); per-file failures get length 0 and a
    zero row (callers treat them like the reference's decode fallbacks).
    """
    if not available():
        return None
    S = len(paths)
    out = np.zeros((S, stride), np.float32)
    lengths = np.zeros(S, np.int64)
    blob = b"\0".join(str(p).encode() for p in paths) + b"\0"
    rate = _lib.audioio_load_batch(
        blob,
        S,
        target_rate,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        stride,
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
    )
    ok = lengths >= 0
    lengths = np.where(ok, lengths, 0)
    return out, lengths.astype(np.int32), int(rate)


def load_batch_i16(paths: list[str | Path], stride: int, target_rate: int = 0):
    """Lossless int16 corpus load: every file mono 16-bit PCM at one rate →
    padded [S, stride] int16 straight from the data chunks (no float pass
    host-side, half the host→device transfer; the device casts back so
    downstream numerics are bit-identical to the float loader). Returns
    (batch, lengths, rate), or None when unavailable or the corpus needs
    the float path (resample / non-mono / non-PCM16)."""
    if not available():
        return None
    S = len(paths)
    out = np.zeros((S, stride), np.int16)
    lengths = np.zeros(S, np.int64)
    blob = b"\0".join(str(p).encode() for p in paths) + b"\0"
    rate = _lib.audioio_load_batch_i16(
        blob,
        S,
        target_rate,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        stride,
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
    )
    if rate < 0:
        return None
    ok = lengths >= 0
    lengths = np.where(ok, lengths, 0)
    return out, lengths.astype(np.int32), int(rate)


def write_wav_f32(path: str | Path, samples: np.ndarray, rate: int, channels: int) -> bool:
    """One-pass float32 → PCM16 WAV write (bit-identical quantization to
    utils/wavio.write_wav's numpy path — round half-to-even, clamp). The
    numpy path costs ~5 full passes + 2 whole-buffer copies; on long
    stitched outputs this is the merge step's dominant host cost. Returns
    False when the native library is unavailable or the write failed
    (caller falls back)."""
    if not available():
        return False
    x = np.ascontiguousarray(samples, np.float32)
    rc = _lib.audioio_write_wav_f32(
        str(path).encode(),
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        x.size,
        int(rate),
        int(channels),
    )
    return rc == 0


def window_rms(x: np.ndarray, rate: int, window_ms: int):
    """pydub-parity windowed RMS (int16 scale, floored) or None."""
    if not available():
        return None
    x = np.ascontiguousarray(x, np.float32)
    total_ms = int(len(x) * 1000 // rate)
    n_starts = max(total_ms - window_ms + 1, 0)
    out = np.empty(max(n_starts, 1), np.float32)
    n = _lib.audioio_window_rms(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(x),
        rate,
        window_ms,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.shape[0],
    )
    return out[:n]
