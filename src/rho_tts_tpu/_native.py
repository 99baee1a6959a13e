"""ctypes bridge to the native C runtime library (csrc/rho_native.c).

Builds the shared library on first use when a compiler is available
(``make -C csrc`` / ``python -m rho_tts_tpu.build_native``); every caller
has a pure-Python fallback, so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native_lib.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    """Compile the library in place (best-effort)."""
    csrc = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(_LIB_PATH))), "csrc")
    src = os.path.join(csrc, "rho_native.c")
    if not os.path.exists(src):
        return False
    try:
        proc = subprocess.run(
            ["cc", "-O3", "-fPIC", "-shared", "-o", _LIB_PATH, src],
            capture_output=True,
            timeout=120,
        )
        return proc.returncode == 0 and os.path.exists(_LIB_PATH)
    except Exception:  # noqa: BLE001
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.levenshtein.restype = ctypes.c_int
        lib.levenshtein.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
        ]
        lib.write_wav_i16.restype = ctypes.c_int
        lib.write_wav_i16.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
        ]
        lib.f32_to_i16.restype = None
        lib.f32_to_i16.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        _lib = lib
    except Exception:  # noqa: BLE001
        _lib = None
    return _lib


def levenshtein(s1: str, s2: str) -> int:
    """Edit distance; raises if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    b1, b2 = s1.encode("utf-8"), s2.encode("utf-8")
    out = lib.levenshtein(b1, len(b1), b2, len(b2))
    if out < 0:
        raise MemoryError("levenshtein allocation failed")
    return out


def write_wav(path: str, pcm16: bytes, sample_rate: int) -> None:
    """Write int16 PCM bytes as a mono WAV; raises if unavailable."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    arr = np.frombuffer(pcm16, dtype=np.int16)
    rc = lib.write_wav_i16(
        path.encode(), arr.ctypes.data_as(ctypes.c_void_p), arr.size, sample_rate
    )
    if rc != 0:
        raise OSError(f"native wav write failed ({rc})")


def f32_to_i16(audio: np.ndarray) -> np.ndarray:
    """Vectorized clip+scale float32 → int16; falls back to numpy."""
    lib = get_lib()
    a = np.ascontiguousarray(audio, dtype=np.float32)
    if lib is None:
        return (np.clip(a, -1.0, 1.0) * 32767.0).astype(np.int16)
    out = np.empty(a.size, dtype=np.int16)
    lib.f32_to_i16(
        a.ctypes.data_as(ctypes.c_void_p), out.ctypes.data_as(ctypes.c_void_p), a.size
    )
    return out
