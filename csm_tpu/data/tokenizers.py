"""Text & audio tokenizers for the CSM pipeline.

Text: the reference loads the Llama-3.2-1B tokenizer and wraps it with a
BOS/EOS post-processor (src/csm/generator.py:28-45); prompts are rendered
as ``f"[{speaker}]{text}"`` (src/csm/generator.py:91).  We load the same
HF tokenizer when it is cached locally and fall back to a deterministic
byte-level tokenizer otherwise (this environment has no network egress —
the fallback keeps every pipeline testable; the analogue of the
reference's GPT-2/char-bigram tokenizer fallbacks,
src/csm/training/data.py:179-248).

Audio: Mimi encode wrapped as a host-callable with static-bucket padding
so repeated encodes hit a small set of compiled shapes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

LLAMA_BOS = 128_000
LLAMA_EOS = 128_001


class ByteTokenizer:
    """Deterministic byte-level fallback tokenizer (offsets into the Llama
    vocab range so ids stay < 128_256): id = 2 + byte."""

    bos_id = 0
    eos_id = 1

    def encode(self, text: str) -> list[int]:
        return [self.bos_id] + [2 + b for b in text.encode("utf-8")] + [self.eos_id]

    def decode(self, ids: Sequence[int]) -> str:
        data = bytes(i - 2 for i in ids if i >= 2)
        return data.decode("utf-8", errors="replace")


class LlamaTokenizer:
    """HF Llama-3.2 tokenizer with BOS/EOS wrapping
    (reference: src/csm/generator.py:28-45)."""

    def __init__(self, hf_tokenizer):
        self._tok = hf_tokenizer
        self.bos_id = hf_tokenizer.bos_token_id or LLAMA_BOS
        self.eos_id = hf_tokenizer.eos_token_id or LLAMA_EOS

    def encode(self, text: str) -> list[int]:
        ids = self._tok.encode(text, add_special_tokens=False)
        return [self.bos_id] + list(ids) + [self.eos_id]

    def decode(self, ids: Sequence[int]) -> str:
        core = [i for i in ids if i not in (self.bos_id, self.eos_id)]
        return self._tok.decode(core)


def load_text_tokenizer(
    name: str = "meta-llama/Llama-3.2-1B",
    allow_byte_fallback: Optional[bool] = None,
):
    """Llama-3.2 tokenizer from the local HF cache.

    If the HF tokenizer is unavailable (cold cache, no egress) the byte
    fallback is only used when explicitly allowed — feeding a real
    CSM-1B checkpoint byte-soup token IDs silently would ruin generation
    quality, so the fallback is opt-in and LOUD:

      * ``allow_byte_fallback=True``, or
      * env ``CSM_TPU_ALLOW_BYTE_TOKENIZER=1`` (the CLIs'
        ``--allow-byte-tokenizer`` flag sets this).

    Tiny-test / unit-test paths construct ``ByteTokenizer()`` directly and
    never hit this gate.
    """
    import os
    import sys

    try:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(name, local_files_only=True)
        return LlamaTokenizer(tok)
    except Exception as e:
        if allow_byte_fallback is None:
            allow_byte_fallback = os.environ.get(
                "CSM_TPU_ALLOW_BYTE_TOKENIZER", ""
            ).lower() in ("1", "true", "yes")
        if not allow_byte_fallback:
            raise RuntimeError(
                f"could not load the '{name}' tokenizer from the local HF "
                f"cache ({type(e).__name__}: {e}). Real checkpoints need the "
                "real tokenizer — generation with the byte fallback produces "
                "garbage token IDs. Either pre-populate the HF cache, pass "
                "--allow-byte-tokenizer (CSM_TPU_ALLOW_BYTE_TOKENIZER=1) to "
                "opt into the degraded fallback, or pass an explicit "
                "text_tokenizer."
            ) from e
        print(
            "=" * 70
            + f"\nWARNING: '{name}' tokenizer unavailable — USING THE BYTE-"
            "LEVEL\nFALLBACK TOKENIZER. Token IDs will NOT match the Llama-3.2"
            "\nvocabulary; with real CSM-1B weights the generated speech will"
            "\nbe garbage. This mode is for offline smoke tests only.\n"
            + "=" * 70,
            file=sys.stderr,
            flush=True,
        )
        return ByteTokenizer()


class MimiAudioTokenizer:
    """Mimi encode/decode as a host-callable audio tokenizer.

    Pads input audio up to a frame multiple (static shapes per bucket), so
    dataset preparation reuses a handful of compiled encoders instead of
    one per utterance length.
    """

    def __init__(self, params, cfg=None, num_quantizers: Optional[int] = None):
        import jax
        import jax.numpy as jnp

        from csm_tpu.codec import mimi as mimi_mod

        self.cfg = cfg or mimi_mod.CSM_MIMI_CONFIG
        self.params = params
        self.sample_rate = self.cfg.sample_rate
        nq = num_quantizers or self.cfg.num_quantizers

        self._encode = jax.jit(
            lambda p, a: mimi_mod.mimi_encode(p, a, self.cfg, nq)
        )
        self._decode = jax.jit(
            lambda p, c: mimi_mod.mimi_decode(
                p, jnp.minimum(c, self.cfg.codebook_size - 1), self.cfg
            )
        )
        self._num_frames = mimi_mod.mimi_num_frames

    def encode(self, audio: np.ndarray) -> np.ndarray:
        """(T,) float waveform → (K, F) int32 codes.

        Samples pad to 25-frame (2 s) buckets — same policy as ``decode``
        — so dataset prep compiles one encoder per bucket, not one per
        utterance length.  The encoder is streaming-causal, so trailing
        zero-padding cannot change the codes of the real frames.
        """
        spf = self.cfg.samples_per_frame
        n = len(audio)
        F = max(1, -(-n // spf))  # real (ceil) frame count
        F_pad = max(25, -(-F // 25) * 25)
        buf = np.zeros(F_pad * spf, np.float32)
        buf[:n] = audio
        codes = np.asarray(self._encode(self.params, buf[None]))[0]
        return codes[:, :F]

    def decode(self, codes: np.ndarray) -> np.ndarray:
        """(K, F) int codes → (T,) float waveform.

        Frame counts pad to 25-frame (2 s) buckets so repeated decodes of
        varying lengths reuse a handful of compiled programs.
        """
        import jax.numpy as jnp

        F = codes.shape[1]
        F_pad = max(25, -(-F // 25) * 25)
        buf = np.zeros((codes.shape[0], F_pad), codes.dtype)
        buf[:, :F] = codes
        audio = np.asarray(self._decode(self.params, jnp.asarray(buf)[None]))[0]
        return audio[: F * self.cfg.samples_per_frame]

    def stream_decoder(self):
        """Stateful streaming decoder: O(chunk) codec work per chunk
        (csm_tpu/codec/streaming.py), exact vs full ``decode``."""
        from csm_tpu.codec.streaming import MimiStreamDecoder

        return MimiStreamDecoder(self.params, self.cfg)

    def stream_encoder(self):
        """Stateful streaming encoder (live audio in → codes out): feed
        1920-sample-multiple chunks, get codes matching full ``encode``
        for those frame positions (csm_tpu/codec/streaming.py)."""
        from csm_tpu.codec.streaming import MimiStreamEncoder

        return MimiStreamEncoder(self.params, self.cfg)
