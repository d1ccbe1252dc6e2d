"""Audio watermarker (SilentCipher-equivalent) — encode, decode, verify.

Behavioral equivalent of src/csm/watermarking/silentcipher/server.py +
src/csm/watermarking/utils.py:
  * 5-byte message → 2-bit symbols (+1, 0-terminated) → one-hot, tiled
    over STFT frames (letters_encoding, server.py:64-99, 306-315);
  * encode: power-normalize to the VCTK average energy, STFT, carrier
    features ⊕ carrier×32 ⊕ message embed×32 → CarrierDecoder → SDR-scaled
    additive perturbation with frame-level normalization → iSTFT with the
    original phase → restore power (server.py:280-345);
  * decode: optional phase-shift grid search (step 10 over one hop,
    get_best_ps, server.py:101-142), per-frame argmax, per-slot mode +
    confidence, 2-bit → bytes (server.py:368-445);
  * ``watermark()``/``verify()`` resample to the 44.1 kHz model rate and
    back (utils.py:27-82).

TPU-first: encode and the per-shift decode are each ONE jitted program;
the phase-shift search batches all shifts as a single batched decode
(the reference loops Python per shift).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from csm_tpu.watermarking import model as wm
from csm_tpu.watermarking.stft import istft, stft

# Public watermark key (reference: src/csm/watermarking/__init__.py:5).
CSM_1B_GH_WATERMARK = [212, 211, 146, 56, 201]

AVERAGE_ENERGY_VCTK = 0.002837200844477648  # server.py:58
MODEL_SR = 44_100


def bytes_to_symbols(message: Sequence[int]) -> np.ndarray:
    """5 bytes → 20 2-bit symbols (server.py binary_encode)."""
    bits = "".join(f"{b:08b}" for b in message)
    return np.array(
        [int(bits[i * 2 : i * 2 + 2], 2) for i in range(len(bits) // 2)], np.int32
    )


def symbols_to_bytes(symbols: Sequence[int]) -> List[int]:
    bits = "".join(f"{int(s):02b}" for s in symbols)
    return [int(bits[i * 8 : i * 8 + 8], 2) for i in range(len(bits) // 8)]


def tile_message(symbols: np.ndarray, message_dim: int, n_frames: int) -> np.ndarray:
    """(L-1,) symbols → (message_dim, n_frames) one-hot tiling with the
    0 terminator (letters_encoding)."""
    index = np.concatenate([symbols + 1, [0]])  # message_len slots
    one_hot = np.eye(message_dim, dtype=np.float32)[index]  # (L, D)
    L = one_hot.shape[0]
    reps = int(np.ceil(n_frames / L))
    return np.tile(one_hot.T, (1, reps))[:, :n_frames]


class Watermarker:
    """Callable watermarker over a JAX parameter tree.

    Args mirror the 44.1 kHz SilentCipher model contract: n_fft 1024,
    hop 512, message band 512 bins, message_dim 5 (4 symbols + stop),
    message_len 21 (20 payload symbols = 5 bytes).
    """

    def __init__(
        self,
        params: Optional[dict] = None,
        n_fft: int = 1024,
        hop: int = 512,
        message_band_size: int = 512,
        message_dim: int = 5,
        message_len: int = 21,
        sample_rate: int = MODEL_SR,
    ):
        self.params = params or wm.init_watermark_params(
            jax.random.key(0), message_dim, message_band_size, n_fft
        )
        self.n_fft, self.hop = n_fft, hop
        self.message_band_size = message_band_size
        self.message_dim = message_dim
        self.message_len = message_len
        self.sample_rate = sample_rate

        @functools.partial(jax.jit, static_argnames=("num_samples",))
        def _encode(params, y, msg_tiled, message_sdr, num_samples):
            power = jnp.mean(y * y)
            norm = jnp.sqrt(AVERAGE_ENERGY_VCTK / jnp.maximum(power, 1e-12))
            yn = (y * norm)[None]  # (1, T)
            mag, phase = stft(yn, n_fft, hop)  # (1, F, N)
            carrier = mag[:, None]  # (1, 1, F, N)

            carrier_enc = wm.encoder_apply(params["enc_c"], carrier)
            msg_enc = wm.transform_message(
                params["enc_c"], msg_tiled[None, None], n_fft
            )
            merged = jnp.concatenate(
                [
                    carrier_enc,
                    jnp.repeat(carrier, 32, axis=1),
                    jnp.repeat(msg_enc, 32, axis=1),
                ],
                axis=1,
            )  # (1, 96, F, N)
            delta = wm.carrier_decoder_apply(
                params["dec_c"], merged, message_sdr, message_band_size
            )
            # frame-level normalization (server.py:324-326)
            delta = delta * jnp.sqrt(jnp.mean(carrier * carrier, axis=2, keepdims=True))
            recon = jnp.abs(delta + carrier)[:, 0]  # (1, F, N)
            out = istft(recon, phase, num_samples, n_fft, hop)[0]
            return out / norm

        self._encode = _encode
        # (S, T) power-normalized shifted audio → (S, message_dim, N)
        # per-frame symbol logits; all phase shifts decode as one batch.
        self._decode_frames = jax.jit(
            lambda p, y: wm.msg_decoder_apply(
                p["dec_m"], stft(y, n_fft, hop)[0][:, None], message_band_size
            )[:, 0]
        )

    # ---- encode ----

    def encode_wav(
        self,
        audio: np.ndarray,
        sample_rate: int,
        message: Sequence[int],
        message_sdr: float = 36.0,
    ) -> np.ndarray:
        """Watermark ``audio`` with a 5-byte message
        (reference server.py:242-368; default SDR 36 dB from utils.py:38)."""
        from csm_tpu.data.audio import resample

        y = np.asarray(audio, np.float32).reshape(-1)
        orig_len = len(y)
        if sample_rate != self.sample_rate:
            y = resample(y, sample_rate, self.sample_rate)
        if float(np.mean(y**2)) == 0.0:
            return np.asarray(audio, np.float32)  # silence: skip (server.py:296-298)

        symbols = bytes_to_symbols(message)
        assert len(symbols) == self.message_len - 1
        n_frames = self._n_frames(len(y))
        tiled = tile_message(symbols, self.message_dim, n_frames)

        out = np.asarray(
            self._encode(
                self.params, jnp.asarray(y), jnp.asarray(tiled),
                float(message_sdr), num_samples=len(y),
            )
        )
        if sample_rate != self.sample_rate:
            out = resample(out, self.sample_rate, sample_rate)[:orig_len]
        return out

    def _n_frames(self, T: int) -> int:
        T_pad = T + (self.n_fft - T % self.n_fft) + self.n_fft  # tail + center pad
        return 1 + (T_pad - self.n_fft) // self.hop

    # ---- decode ----

    def decode_wav(
        self,
        audio: np.ndarray,
        sample_rate: int,
        phase_shift_decoding: bool = True,
        shift_step: int = 10,
    ) -> dict:
        """Recover the message (reference server.py:368-445).

        The phase-shift grid (0..hop in steps of ``shift_step``) is decoded
        as ONE batched call instead of the reference's Python loop."""
        from csm_tpu.data.audio import resample

        y = np.asarray(audio, np.float32).reshape(-1)
        if sample_rate != self.sample_rate:
            y = resample(y, sample_rate, self.sample_rate)
        power = float(np.mean(y**2))
        if power == 0.0:
            return {"messages": [], "confidences": [], "status": False}
        y = y * np.sqrt(AVERAGE_ENERGY_VCTK / power)

        shifts = (
            list(range(0, self.hop, shift_step)) if phase_shift_decoding else [0]
        )
        L = len(y) - max(shifts)
        batch = np.stack([y[s : s + L] for s in shifts])
        logits = np.asarray(self._decode_frames(self.params, jnp.asarray(batch)))
        # (S, message_dim, N)
        pred = logits.argmax(axis=1)  # (S, N)

        best = None
        for si in range(pred.shape[0]):
            p = pred[si]
            n = (len(p) // self.message_len) * self.message_len
            if n == 0:
                continue
            grid = p[:n].reshape(-1, self.message_len)
            # per-slot mode + accuracy (get_best_ps check_accuracy)
            mode = np.zeros(self.message_len, np.int64)
            acc = 0.0
            for j in range(self.message_len):
                vals, counts = np.unique(grid[:, j], return_counts=True)
                mode[j] = vals[np.argmax(counts)]
                acc += counts.max() / grid.shape[0]
            acc /= self.message_len
            if best is None or acc > best[0]:
                best = (acc, mode, grid)

        if best is None:
            return {"messages": [], "confidences": [], "status": False}
        acc, mode, grid = best

        zeros = np.nonzero(mode == 0)[0]
        if len(zeros) == 0:
            return {"messages": [], "confidences": [float(acc)], "status": False}
        end = int(zeros.min())
        if end == self.message_len:
            symbols = mode[: self.message_len - 1]
        else:
            symbols = np.concatenate([mode[end + 1 :], mode[:end]])
        symbols = symbols - 1
        if np.any(symbols < 0) or np.any(symbols > 3):
            # extra terminators / out-of-range symbols: no valid message
            # (the reference wraps decode in a broad except → status False,
            # server.py:446-449)
            return {"messages": [], "confidences": [float(acc)], "status": False}
        message = symbols_to_bytes(symbols)
        confidence = float(np.mean(grid == mode[None]))
        return {"messages": [message], "confidences": [confidence], "status": True}


# ---- high-level API (reference: src/csm/watermarking/utils.py) ----


def load_watermarker(ckpt_dir: Optional[str] = None) -> Watermarker:
    """Build a Watermarker; with ``ckpt_dir`` import the torch
    sony/silentcipher checkpoints (enc_c.ckpt/dec_c.ckpt/dec_m_0.ckpt)."""
    if ckpt_dir is None:
        return Watermarker()
    import os

    import torch

    load = lambda n: torch.load(
        os.path.join(ckpt_dir, n), map_location="cpu", weights_only=True
    )
    strip = lambda d: {
        (k[len("module."):] if k.startswith("module.") else k): v for k, v in d.items()
    }
    params = wm.convert_torch_watermark_state(
        strip(load("enc_c.ckpt")), strip(load("dec_c.ckpt")), strip(load("dec_m_0.ckpt"))
    )
    return Watermarker(params)


def watermark(
    watermarker: Watermarker,
    audio: np.ndarray,
    sample_rate: int,
    key: Sequence[int] = CSM_1B_GH_WATERMARK,
    message_sdr: float = 36.0,
) -> Tuple[np.ndarray, int]:
    """Reference utils.py:27-51 — returns (audio, output_sample_rate)."""
    out = watermarker.encode_wav(audio, sample_rate, key, message_sdr)
    out_sr = min(MODEL_SR, sample_rate)
    if out_sr != sample_rate:
        from csm_tpu.data.audio import resample

        out = resample(out, sample_rate, out_sr)
    return out, out_sr


def verify(
    watermarker: Watermarker,
    audio: np.ndarray,
    sample_rate: int,
    key: Sequence[int] = CSM_1B_GH_WATERMARK,
) -> bool:
    """Reference utils.py:54-82."""
    res = watermarker.decode_wav(audio, sample_rate, phase_shift_decoding=True)
    return bool(res["status"]) and res["messages"][0] == list(key)


def check_audio_from_file(path: str, ckpt_dir: Optional[str] = None) -> bool:
    """Reference utils.py:85-126."""
    from csm_tpu.data.audio import load_wav

    audio, sr = load_wav(path)
    w = load_watermarker(ckpt_dir)
    is_marked = verify(w, audio, sr)
    print(f"{path}: {'watermarked' if is_marked else 'not watermarked'}")
    return is_marked
