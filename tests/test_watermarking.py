"""Watermarking tests: STFT parity vs torch, message protocol, encode SDR.

The CNNs are weight-compatible with the sony/silentcipher checkpoint (not
downloadable here — zero egress), so these tests validate (a) the STFT
math against torch exactly, (b) the message protocol (2-bit symbols,
tiling, terminator rotation, mode voting) end-to-end with a bypassed
decoder, and (c) the encode path's SDR contract with random CNN weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from csm_tpu.watermarking import CSM_1B_GH_WATERMARK, Watermarker, verify, watermark
from csm_tpu.watermarking.stft import istft, stft
from csm_tpu.watermarking.watermarker import (
    AVERAGE_ENERGY_VCTK,
    bytes_to_symbols,
    symbols_to_bytes,
    tile_message,
)


def test_key_constant():
    assert CSM_1B_GH_WATERMARK == [212, 211, 146, 56, 201]


def test_symbols_roundtrip():
    sym = bytes_to_symbols(CSM_1B_GH_WATERMARK)
    assert sym.shape == (20,) and sym.max() <= 3
    assert symbols_to_bytes(sym) == CSM_1B_GH_WATERMARK


def test_tile_message():
    sym = bytes_to_symbols(CSM_1B_GH_WATERMARK)
    tiled = tile_message(sym, message_dim=5, n_frames=50)
    assert tiled.shape == (5, 50)
    np.testing.assert_allclose(tiled.sum(axis=0), 1.0)  # one-hot per frame
    # slot 20 of each 21-slot period is the 0 terminator
    assert tiled[0, 20] == 1.0 and tiled[0, 41] == 1.0


def test_stft_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4096)).astype(np.float32) * 0.1
    n_fft, hop = 1024, 512

    mag_j, phase_j = jax.jit(stft, static_argnames=("n_fft", "hop"))(
        jnp.asarray(x), n_fft, hop
    )

    xt = torch.from_numpy(x)
    xt = torch.nn.functional.pad(xt, (0, n_fft - x.shape[1] % n_fft))
    f = torch.stft(
        xt, n_fft, hop, n_fft, window=torch.hann_window(n_fft), return_complex=True
    )
    mag_t = f.abs().numpy()
    phase_t = torch.angle(f).numpy()

    assert mag_j.shape == mag_t.shape
    np.testing.assert_allclose(np.asarray(mag_j), mag_t, atol=2e-3)
    # compare phases where magnitude is non-negligible
    m = mag_t > 1e-2
    dphi = np.angle(np.exp(1j * (np.asarray(phase_j) - phase_t)))
    assert np.abs(dphi[m]).max() < 2e-2


def test_istft_reconstruction():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 8000)).astype(np.float32) * 0.3
    mag, phase = stft(jnp.asarray(x))
    y = istft(mag, phase, 8000)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-3)


def test_encode_sdr_and_length():
    """Watermarked audio keeps its length and the perturbation sits at the
    requested message SDR.  At the model's native 44.1 kHz the SDR is
    tight; at 24 kHz the resample round-trip adds band-edge error, so use
    speech-like band-limited audio and a loose bound."""
    rng = np.random.default_rng(2)
    w = Watermarker()

    audio = (rng.standard_normal(44_100) * 0.1).astype(np.float32)
    out = w.encode_wav(audio, 44_100, CSM_1B_GH_WATERMARK, message_sdr=36.0)
    assert out.shape == audio.shape
    noise = out - audio
    sdr = 10 * np.log10(np.mean(audio**2) / max(np.mean(noise**2), 1e-20))
    assert 30.0 < sdr < 45.0, sdr

    # band-limited (speech-like) 24 kHz input through the resample path
    t = np.arange(24_000) / 24_000
    speechish = sum(
        0.05 * np.sin(2 * np.pi * f * t) for f in (180, 420, 950, 2300)
    ).astype(np.float32)
    out24 = w.encode_wav(speechish, 24_000, CSM_1B_GH_WATERMARK, message_sdr=36.0)
    assert out24.shape == speechish.shape
    noise24 = out24 - speechish
    sdr24 = 10 * np.log10(np.mean(speechish**2) / max(np.mean(noise24**2), 1e-20))
    assert sdr24 > 25.0, sdr24
    assert not np.allclose(out24, speechish)


def test_silence_skips_encoding():
    w = Watermarker()
    silent = np.zeros(24_000, np.float32)
    out = w.encode_wav(silent, 24_000, CSM_1B_GH_WATERMARK)
    np.testing.assert_array_equal(out, silent)
    res = w.decode_wav(silent, 24_000)
    assert res["status"] is False


def test_decode_protocol_with_bypassed_cnn():
    """With the CNN bypassed (logits = the true tiled one-hot), decode_wav
    must recover the key exactly — validates mode voting, terminator
    rotation, and bit reassembly."""
    w = Watermarker()
    sym = bytes_to_symbols(CSM_1B_GH_WATERMARK)

    def fake_decode(params, y_shifts):
        S = y_shifts.shape[0]
        n_frames = 1 + (y_shifts.shape[1] + 2 * (w.n_fft // 2)
                        + (w.n_fft - y_shifts.shape[1] % w.n_fft) - w.n_fft) // w.hop
        # rotate so the tiling does NOT start at a period boundary
        tiled = tile_message(sym, w.message_dim, n_frames + 7)[:, 7:]
        return jnp.asarray(np.repeat(tiled[None], S, axis=0))

    w._decode_frames = fake_decode
    res = w.decode_wav(
        np.random.default_rng(3).standard_normal(44_100).astype(np.float32),
        44_100,
        phase_shift_decoding=False,
    )
    assert res["status"] is True
    assert res["messages"][0] == CSM_1B_GH_WATERMARK
    assert res["confidences"][0] > 0.9


def test_verify_with_bypassed_cnn():
    w = Watermarker()
    sym = bytes_to_symbols(CSM_1B_GH_WATERMARK)

    def fake_decode(params, y_shifts):
        S = y_shifts.shape[0]
        tiled = tile_message(sym, w.message_dim, 4096)
        return jnp.asarray(np.repeat(tiled[None], S, axis=0))

    w._decode_frames = fake_decode
    audio = np.random.default_rng(4).standard_normal(44_100).astype(np.float32)
    assert verify(w, audio, 44_100)

    wrong = bytes_to_symbols([1, 2, 3, 4, 5])
    w._decode_frames = lambda p, y: jnp.asarray(
        np.repeat(tile_message(wrong, w.message_dim, 4096)[None], y.shape[0], axis=0)
    )
    assert not verify(w, audio, 44_100)


def test_decode_recovers_from_crop_via_phase_shift_search():
    """Robustness mechanics (VERDICT weak #8): real audio gets cropped /
    re-encoded, shifting the watermark's frame grid by a NON-hop-multiple
    offset.  The phase-shift grid search must find the aligned shift and
    the terminator rotation must undo the frame rotation.

    The CNN is bypassed with an absolute-position model of a trained
    decoder: it emits the true tiling only for the batch row whose total
    offset (crop + candidate shift) is sample-aligned with the embedding
    grid, and noise elsewhere — the strictest version of how the trained
    decoder degrades off-alignment."""
    w = Watermarker()
    sym = bytes_to_symbols(CSM_1B_GH_WATERMARK)
    hop, step = w.hop, 10
    crop = 3 * hop - 40  # not a hop multiple; aligned at shift s=40
    rng = np.random.default_rng(6)

    def fake_decode(params, y_shifts):
        S, L = y_shifts.shape
        n_frames = w._n_frames(L)
        rows = []
        for si in range(S):
            off = crop + si * step
            if off % hop == 0:
                rot = (off // hop) % w.message_len
                rows.append(
                    tile_message(sym, w.message_dim, n_frames + rot)[:, rot:]
                )
            else:
                noise = rng.integers(0, w.message_dim, n_frames)
                rows.append(np.eye(w.message_dim, dtype=np.float32)[noise].T)
        return jnp.asarray(np.stack(rows))

    w._decode_frames = fake_decode
    audio = rng.standard_normal(44_100).astype(np.float32)
    res = w.decode_wav(audio[crop:], 44_100, phase_shift_decoding=True, shift_step=step)
    assert res["status"] is True
    assert res["messages"][0] == CSM_1B_GH_WATERMARK

    # without the phase-shift search the cropped signal must NOT decode
    res0 = w.decode_wav(audio[crop:], 44_100, phase_shift_decoding=False)
    assert res0["messages"] != [CSM_1B_GH_WATERMARK]


def test_watermark_api_resamples():
    w = Watermarker()
    audio = (np.random.default_rng(5).standard_normal(24_000) * 0.1).astype(np.float32)
    out, out_sr = watermark(w, audio, 24_000)
    assert out_sr == 24_000
    assert out.shape[0] == audio.shape[0]


def test_decode_gain_invariant_and_noise_robust():
    """Distortion robustness (VERDICT weak #8 follow-through): playback
    GAIN must not affect decoding at all — the power normalization to the
    VCTK energy (server.py:58) makes the decoder input scale-invariant —
    and small additive noise must not flip the per-slot mode vote.

    The CNN is bypassed with a deterministic energy-sensitive model: it
    emits the true tiling when its input has the expected normalized
    power, garbage otherwise — so the test fails if normalization drifts."""
    w = Watermarker()
    sym = bytes_to_symbols(CSM_1B_GH_WATERMARK)
    rng = np.random.default_rng(8)

    def fake_decode(params, y_shifts):
        S, L = y_shifts.shape
        n_frames = w._n_frames(L)
        rows = []
        for si in range(S):
            power = float(np.mean(np.asarray(y_shifts[si]) ** 2))
            # decoder was "trained" at the VCTK operating point
            if abs(power / AVERAGE_ENERGY_VCTK - 1.0) < 0.05:
                rows.append(tile_message(sym, w.message_dim, n_frames))
            else:
                noise = rng.integers(0, w.message_dim, n_frames)
                rows.append(np.eye(w.message_dim, dtype=np.float32)[noise].T)
        return jnp.asarray(np.stack(rows))

    w._decode_frames = fake_decode
    base = rng.standard_normal(44_100).astype(np.float32) * 0.05
    for gain in (0.1, 1.0, 8.0):  # 20 dB down to 18 dB up
        res = w.decode_wav(base * gain, 44_100, phase_shift_decoding=False)
        assert res["status"] is True, f"gain {gain} broke decoding"
        assert res["messages"][0] == CSM_1B_GH_WATERMARK

    # additive noise: mode voting across message slots absorbs a minority
    # of corrupted frames — flip ~20% of the emitted frames to noise
    def fake_decode_noisy(params, y_shifts):
        out = np.array(fake_decode(params, y_shifts))  # writable copy
        S, D, N = out.shape
        bad = rng.random(N) < 0.2
        noise = np.eye(D, dtype=np.float32)[rng.integers(0, D, int(bad.sum()))].T
        out[:, :, bad] = noise
        return jnp.asarray(out)

    w._decode_frames = fake_decode_noisy
    res = w.decode_wav(base, 44_100, phase_shift_decoding=False)
    assert res["status"] is True
    assert res["messages"][0] == CSM_1B_GH_WATERMARK
