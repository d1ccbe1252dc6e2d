"""Native C++ audio-loader tests: parity vs the numpy/scipy fallback.

The native path must be a drop-in for the Python path — every test
compares both on the same inputs."""

import math
import os
import wave

import numpy as np
import pytest

from csm_tpu import native
from csm_tpu.data.audio import save_wav

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def sine(seconds=1.0, sr=24_000, hz=440.0, amp=0.3):
    t = np.arange(int(seconds * sr)) / sr
    return (amp * np.sin(2 * np.pi * hz * t)).astype(np.float32)


def test_wav_decode_matches_python(tmp_path):
    x = sine()
    p = str(tmp_path / "a.wav")
    save_wav(p, x, 24_000)
    raw = open(p, "rb").read()
    audio, sr = native.wav_decode(raw)
    assert sr == 24_000
    np.testing.assert_allclose(audio, x, atol=1e-3)


def test_wav_decode_stereo(tmp_path):
    # hand-write a stereo 16-bit wav; native must mix down to the average
    sr = 8000
    left = sine(0.2, sr, 300.0)
    right = sine(0.2, sr, 600.0)
    inter = np.empty(2 * len(left), np.float32)
    inter[0::2], inter[1::2] = left, right
    pcm = np.clip(inter * 32767, -32768, 32767).astype("<i2")
    p = str(tmp_path / "st.wav")
    with wave.open(p, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    audio, got_sr = native.wav_decode(open(p, "rb").read())
    assert got_sr == sr
    np.testing.assert_allclose(audio, (left + right) / 2, atol=2e-3)


def test_wav_decode_float32(tmp_path):
    # float32 WAV (format 3) — stdlib wave can't write it; craft manually
    x = sine(0.1, 16_000)
    data = x.tobytes()
    hdr = b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
    fmt = (b"fmt " + (16).to_bytes(4, "little")
           + (3).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + (16_000).to_bytes(4, "little")
           + (16_000 * 4).to_bytes(4, "little")
           + (4).to_bytes(2, "little") + (32).to_bytes(2, "little"))
    raw = hdr + fmt + b"data" + len(data).to_bytes(4, "little") + data
    audio, sr = native.wav_decode(raw)
    assert sr == 16_000
    np.testing.assert_allclose(audio, x, atol=1e-6)


def test_resample_preserves_tone():
    """440 Hz stays 440 Hz through 48k→24k and 16k→24k, with scipy-level
    quality (compare against resample_poly on the interior)."""
    from scipy import signal

    for sr, target in ((48_000, 24_000), (16_000, 24_000), (44_100, 24_000)):
        x = sine(1.0, sr)
        y_nat = native.resample(x, sr, target)
        g = math.gcd(sr, target)
        y_ref = signal.resample_poly(
            x.astype(np.float64), target // g, sr // g
        ).astype(np.float32)
        assert abs(len(y_nat) - len(y_ref)) <= 1
        n = min(len(y_nat), len(y_ref))
        core = slice(n // 10, -n // 10)
        err = y_nat[:n][core] - y_ref[:n][core]
        snr = 10 * np.log10(np.mean(y_ref[:n][core] ** 2) / max(np.mean(err**2), 1e-20))
        assert snr > 40.0, (sr, target, snr)


def test_trim_silence_bounds():
    sr = 24_000
    x = np.zeros(sr, np.float32)
    x[8000:16000] = sine(8000 / sr, sr)[: 8000]
    s, e = native.trim_silence_bounds(x, win=480, threshold=0.1)
    assert 7000 <= s <= 8500
    assert 15500 <= e <= 17000


def test_loader_uses_native_and_fallback_agrees(tmp_path):
    from csm_tpu.data import audio as A

    x = sine(0.5)
    p = str(tmp_path / "n.wav")
    save_wav(p, x, 24_000)

    nat_audio = A.load_audio(p, 16_000)
    os.environ["CSM_TPU_NO_NATIVE"] = "1"
    try:
        py_audio = A.load_audio(p, 16_000)
    finally:
        del os.environ["CSM_TPU_NO_NATIVE"]
    assert abs(len(nat_audio) - len(py_audio)) <= 1
    n = min(len(nat_audio), len(py_audio))
    np.testing.assert_allclose(nat_audio[:n], py_audio[:n], atol=5e-3)
