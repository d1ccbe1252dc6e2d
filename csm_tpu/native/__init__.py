"""Native (C++) host-side kernels for the data pipeline.

ctypes bindings over ``libcsm_audio.so`` (built lazily from
audio_kernels.cpp with g++; no pybind11 dependency): WAV decode with
mono mixdown, polyphase FIR resampling, and silence-trim bounds.  The
Python data layer (csm_tpu/data/audio.py) uses these when available and
falls back to numpy/scipy otherwise — same contract either way.
"""

from __future__ import annotations

import ctypes
import math
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libcsm_audio.so")
_lib = None
_tried = False


class _WavInfo(ctypes.Structure):
    _fields_ = [
        ("sample_rate", ctypes.c_int32),
        ("channels", ctypes.c_int32),
        ("bits", ctypes.c_int32),
        ("is_float", ctypes.c_int32),
        ("n_frames", ctypes.c_int64),
        ("data_offset", ctypes.c_int64),
    ]


def _build() -> bool:
    try:
        subprocess.run(
            ["bash", os.path.join(_HERE, "build.sh")],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """Load (building on first use) the native library; None if the
    toolchain is unavailable."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.csm_wav_info.restype = ctypes.c_int
    lib.csm_wav_info.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(_WavInfo)
    ]
    lib.csm_wav_decode.restype = ctypes.c_int
    lib.csm_wav_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
    ]
    lib.csm_resample_len.restype = ctypes.c_int64
    lib.csm_resample_len.argtypes = [ctypes.c_int64, ctypes.c_int32, ctypes.c_int32]
    lib.csm_resample.restype = ctypes.c_int
    lib.csm_resample.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int32,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
    ]
    lib.csm_trim_bounds.restype = ctypes.c_int
    lib.csm_trim_bounds.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int32, ctypes.c_float,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return load_library() is not None


def wav_decode(raw: bytes) -> Tuple[np.ndarray, int]:
    """WAV bytes → (mono float32, sample_rate) via the native decoder."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native audio library unavailable")
    info = _WavInfo()
    rc = lib.csm_wav_info(raw, len(raw), ctypes.byref(info))
    if rc != 0:
        raise ValueError(f"bad WAV (rc={rc})")
    out = np.empty(info.n_frames, np.float32)
    rc = lib.csm_wav_decode(raw, len(raw), out)
    if rc != 0:
        raise ValueError(f"WAV decode failed (rc={rc})")
    return out, int(info.sample_rate)


def _kaiser_lowpass(up: int, down: int, taps_per_phase: int = 10) -> np.ndarray:
    """Kaiser-windowed sinc prototype (resample_poly's default design):
    cutoff at min(1/up, 1/down), beta 8.555, scaled by up."""
    max_rate = max(up, down)
    cutoff = 1.0 / max_rate  # in half-cycles/sample of the upsampled stream
    half = taps_per_phase * max_rate
    n = 2 * half + 1
    t = np.arange(n) - half
    h = cutoff * np.sinc(cutoff * t)
    h *= np.kaiser(n, 8.555)
    return (h * up).astype(np.float64)


def resample(audio: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resample via the native kernel."""
    if sr == target_sr:
        return np.asarray(audio, np.float32)
    lib = load_library()
    if lib is None:
        raise RuntimeError("native audio library unavailable")
    g = math.gcd(sr, target_sr)
    up, down = target_sr // g, sr // g
    x = np.ascontiguousarray(audio, np.float32)
    fir = _kaiser_lowpass(up, down)
    n_out = lib.csm_resample_len(len(x), up, down)
    out = np.empty(n_out, np.float32)
    rc = lib.csm_resample(x, len(x), up, down, fir, len(fir), out)
    if rc != 0:
        raise ValueError(f"resample failed (rc={rc})")
    return out


def trim_silence_bounds(
    audio: np.ndarray, win: int = 480, threshold: float = 0.1
) -> Tuple[int, int]:
    """[start, end) bounds of non-silence (energy gate vs global RMS)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native audio library unavailable")
    x = np.ascontiguousarray(audio, np.float32)
    s, e = ctypes.c_int64(), ctypes.c_int64()
    rc = lib.csm_trim_bounds(x, len(x), win, threshold, ctypes.byref(s), ctypes.byref(e))
    if rc != 0:
        raise ValueError(f"trim failed (rc={rc})")
    return int(s.value), int(e.value)
