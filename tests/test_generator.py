"""Generator pipeline tests (tiny model + fake codec).

Mirrors the reference's mocked-generator CLI tests
(src/csm/training/test_finetune.py:31-79): the pipeline logic — prompt
assembly, context packing, length contract, decode trimming — is
validated without real checkpoints.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from csm_tpu.data.tokenizers import ByteTokenizer
from csm_tpu.generator import Generator, Segment
from csm_tpu.models.config import tiny_test_args
from csm_tpu.models.csm import init_csm_params

SR = 24_000
SPF = 1920  # samples per 12.5 Hz frame


class FakeMimi:
    """Deterministic stand-in codec: encode → hash-derived codes at
    12.5 Hz; decode → unit-impulse train (length-exact)."""

    sample_rate = SR

    def __init__(self, K):
        self.K = K

    def encode(self, audio):
        F = max(1, len(audio) // SPF)
        rng = np.random.default_rng(len(audio) % 104729)
        return rng.integers(1, 50, (self.K, F)).astype(np.int32)

    def decode(self, codes):
        F = codes.shape[1]
        out = np.zeros(F * SPF, np.float32)
        out[::SPF] = 1.0
        return out

    def stream_decoder(self):
        """Chunked decode of the impulse train is trivially exact."""
        fake = self

        class _SD:
            cfg = type("C", (), {"samples_per_frame": SPF})()

            def decode_chunk(self, codes):
                return fake.decode(codes)

            def reset(self):
                pass

        return _SD()


@pytest.fixture(scope="module")
def gen():
    args = tiny_test_args()
    params = init_csm_params(__import__("jax").random.key(0), args, jnp.float32)
    return args, Generator(
        params,
        args,
        mimi=FakeMimi(args.audio_num_codebooks),
        text_tokenizer=ByteTokenizer(),
        compute_dtype=jnp.float32,
    )


def test_generate_plain(gen):
    args, g = gen
    audio = g.generate("hi", speaker=1, max_audio_length_ms=400, temperature=1.0, topk=1)
    # up to 5 frames of 80ms; may stop early on EOS
    assert audio.shape[0] <= 5 * SPF
    assert audio.dtype == np.float32
    assert g.last_stats["frames"] * SPF == audio.shape[0]


def test_generate_with_context(gen):
    args, g = gen
    ctx = [
        Segment(speaker=0, text="hello", audio=np.random.default_rng(0).normal(size=SPF * 3).astype(np.float32)),
        Segment(speaker=1, text="hey", audio=np.random.default_rng(1).normal(size=SPF * 2).astype(np.float32)),
    ]
    audio = g.generate("next turn", speaker=0, context=ctx, max_audio_length_ms=240, temperature=1.0, topk=1)
    assert audio.shape[0] <= 3 * SPF


def test_packed_context_matches_segments(gen):
    """precompute_context: the packed preset is byte-identical input to
    the same segments inlined — generation matches exactly, and the
    per-call Mimi encode is skipped."""
    from csm_tpu.generator import PackedContext

    args, g = gen
    ctx = [
        Segment(speaker=0, text="hello", audio=np.random.default_rng(2)
                .normal(size=SPF * 3).astype(np.float32)),
    ]
    packed = g.precompute_context(ctx)
    assert isinstance(packed, PackedContext)
    a = g.generate("next", speaker=1, context=ctx,
                   max_audio_length_ms=240, temperature=1.0, topk=1, seed=4)
    b = g.generate("next", speaker=1, context=packed,
                   max_audio_length_ms=240, temperature=1.0, topk=1, seed=4)
    np.testing.assert_array_equal(a, b)


def test_prompt_length_contract(gen):
    """prompt_len must be < max_seq - max_frames
    (reference: src/csm/generator.py:192-194)."""
    args, g = gen
    with pytest.raises(ValueError, match="prompt too long"):
        g.generate("x" * 200, max_audio_length_ms=80 * (args.backbone.max_seq_len - 10))


def test_generate_batch(gen):
    args, g = gen
    outs = g.generate_batch(
        ["one", "two three"], [0, 1], max_audio_length_ms=240,
        temperature=1.0, topk=1,
    )
    assert len(outs) == 2
    for o in outs:
        assert o.shape[0] <= 3 * SPF


def test_watermarker_hook(gen):
    args, g = gen
    calls = []

    def wm(audio, sr):
        calls.append((len(audio), sr))
        return audio * 0.5, sr

    g2 = Generator(
        g.params, args, mimi=FakeMimi(args.audio_num_codebooks),
        text_tokenizer=ByteTokenizer(), watermarker=wm,
        compute_dtype=jnp.float32,
    )
    audio = g2.generate("hi", max_audio_length_ms=240, temperature=1.0, topk=1)
    if audio.shape[0]:
        assert calls and calls[0][1] == SR
        assert np.abs(audio).max() <= 0.5 + 1e-6


def test_streaming_matches_batch(gen):
    """Streaming chunks concatenate to EXACTLY the non-streaming waveform
    (argmax decoding; Mimi causality makes incremental decode exact)."""
    args, g = gen
    kwargs = dict(speaker=1, max_audio_length_ms=480, temperature=1.0, topk=1)
    full = g.generate("stream me", seed=0, **kwargs)
    chunks = list(
        g.generate_streaming("stream me", chunk_frames=2, seed=0, **kwargs)
    )
    assert chunks[-1][1] is True  # final flag
    assert sum(1 for _, d in chunks if d) == 1  # exactly one done signal
    audio = np.concatenate([c for c, _ in chunks]) if chunks else np.zeros(0)
    np.testing.assert_allclose(audio, full, atol=1e-6)
    # at least two incremental emissions for a 6-frame budget
    assert len([c for c, _ in chunks if len(c)]) >= 2


def test_contextual_generation_real_codec():
    """BASELINE.json config 2: two-speaker Segment history with
    Mimi-ENCODED reference audio, decoded back through the real (tiny)
    Mimi codec — the full encode->prompt->generate->decode path."""
    import jax

    from csm_tpu.codec.mimi import MimiConfig, mimi_init
    from csm_tpu.codec.transformer import MimiTransformerConfig
    from csm_tpu.data.tokenizers import MimiAudioTokenizer

    args = tiny_test_args()
    params = init_csm_params(jax.random.key(0), args, jnp.float32)
    mcfg = MimiConfig(
        num_quantizers=args.audio_num_codebooks,
        codebook_size=args.audio_vocab_size - 3,
        transformer=MimiTransformerConfig(num_layers=1),
    )
    mimi = MimiAudioTokenizer(mimi_init(jax.random.key(1), mcfg), cfg=mcfg)
    g = Generator(params, args, mimi=mimi, text_tokenizer=ByteTokenizer(),
                  compute_dtype=jnp.float32)

    rng = np.random.default_rng(3)
    ctx = [
        Segment(0, "hello there", (rng.standard_normal(SPF * 2) * 0.1).astype(np.float32)),
        Segment(1, "hi, how are you", (rng.standard_normal(SPF * 3) * 0.1).astype(np.float32)),
    ]
    audio = g.generate("doing great thanks", speaker=0, context=ctx,
                       max_audio_length_ms=240, temperature=0.9, topk=5, seed=2)
    assert audio.dtype == np.float32
    assert audio.shape[0] <= 3 * SPF
    assert np.all(np.isfinite(audio))
    # context actually conditions the generation: different context ->
    # (almost surely) different tokens under fixed seed
    audio2 = g.generate("doing great thanks", speaker=0, context=[],
                        max_audio_length_ms=240, temperature=0.9, topk=5, seed=2)
    if audio.shape == audio2.shape and audio.shape[0] > 0:
        assert not np.allclose(audio, audio2)
