"""Streaming Mimi decode == full decode, over 30+ s of audio.

The streaming decoder (csm_tpu/codec/streaming.py) carries conv input
histories, transposed-conv output tails, and a windowed transformer KV
cache; by linearity + causality the chunked output must equal the
full-sequence decode bit-for-bit up to float reassociation.  VERDICT.md
round-1 item #1: done = O(chunk) codec work per chunk and concatenated
chunks match full decode to <=1e-5-ish over >=30 s.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csm_tpu.codec.mimi import CSM_MIMI_CONFIG, mimi_decode, mimi_init
from csm_tpu.codec.streaming import (
    MimiStreamDecoder,
    mimi_decode_stream_init,
    mimi_decode_stream_step,
)

CFG = CSM_MIMI_CONFIG


@pytest.fixture(scope="module")
def mimi_params():
    return mimi_init(jax.random.key(7), CFG)


@pytest.fixture(scope="module")
def full_decode():
    return jax.jit(lambda p, c: mimi_decode(p, c, CFG))


def _stream_decode(params, codes, chunks):
    """Decode (B, K, T) codes in the given frame-chunk sizes."""
    state = mimi_decode_stream_init(params, codes.shape[0], CFG)
    step = jax.jit(lambda p, s, c: mimi_decode_stream_step(p, s, c, CFG))
    out = []
    t = 0
    for n in chunks:
        audio, state = step(params, state, codes[:, :, t : t + n])
        out.append(np.asarray(audio))
        t += n
    assert t == codes.shape[2]
    return np.concatenate(out, axis=1)


def _rel_err(a, b):
    return float(np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-9))


def test_stream_matches_full_30s(mimi_params, full_decode):
    """30.08 s (376 frames) decoded in 13-frame chunks == full decode."""
    T = 376  # 30.08 s at 12.5 Hz
    codes = np.asarray(
        jax.random.randint(jax.random.key(0), (1, 32, T), 0, CFG.codebook_size),
        np.int32,
    )
    full = np.asarray(full_decode(mimi_params, jnp.asarray(codes)))
    chunks = [13] * (T // 13) + ([T % 13] if T % 13 else [])
    stream = _stream_decode(mimi_params, codes, chunks)
    assert stream.shape == full.shape
    assert _rel_err(stream, full) < 1e-4


def test_stream_matches_full_irregular_chunks(mimi_params, full_decode):
    """Chunk-size pattern 1/7/2/25/... must not change the waveform."""
    chunks = [1, 7, 2, 25, 3, 13, 13, 1, 1, 9]
    T = sum(chunks)
    codes = np.asarray(
        jax.random.randint(jax.random.key(1), (2, 32, T), 0, CFG.codebook_size),
        np.int32,
    )
    full = np.asarray(full_decode(mimi_params, jnp.asarray(codes)))
    stream = _stream_decode(mimi_params, codes, chunks)
    assert _rel_err(stream, full) < 1e-4


def test_stream_crosses_sliding_window(mimi_params, full_decode):
    """>250 latent frames (the transformer window) so the KV ring wraps."""
    T = 150  # 300 latent frames at 25 Hz > window 250
    codes = np.asarray(
        jax.random.randint(jax.random.key(2), (1, 32, T), 0, CFG.codebook_size),
        np.int32,
    )
    full = np.asarray(full_decode(mimi_params, jnp.asarray(codes)))
    stream = _stream_decode(mimi_params, codes, [25] * 6)
    assert _rel_err(stream, full) < 1e-4


def test_stream_position_rebase_is_exact(mimi_params, full_decode, monkeypatch):
    """Streams must run past the RoPE table without corruption: positions
    rebase (uniform shift + counter-rotation of cached K) when they near
    the table edge.  Patch the threshold low (> window) so several
    rebases happen inside a 150-frame decode; output must still match the
    full decode exactly."""
    from csm_tpu.codec import streaming

    monkeypatch.setattr(streaming, "_REBASE_AT", 300)  # window is 250
    T = 150  # 300 latent frames -> rebase fires repeatedly
    codes = np.asarray(
        jax.random.randint(jax.random.key(4), (1, 32, T), 0, CFG.codebook_size),
        np.int32,
    )
    full = np.asarray(full_decode(mimi_params, jnp.asarray(codes)))
    stream = _stream_decode(mimi_params, codes, [15] * 10)
    assert _rel_err(stream, full) < 1e-4


def test_stream_decoder_wrapper(mimi_params, full_decode):
    dec = MimiStreamDecoder(mimi_params, CFG)
    codes = np.asarray(
        jax.random.randint(jax.random.key(3), (32, 26), 0, CFG.codebook_size),
        np.int32,
    )
    a = np.concatenate(
        [dec.decode_chunk(codes[:, :13]), dec.decode_chunk(codes[:, 13:])]
    )
    full = np.asarray(full_decode(mimi_params, jnp.asarray(codes)[None]))[0]
    assert a.shape == full.shape
    assert _rel_err(a, full) < 1e-4
    # reset() restarts the stream deterministically
    dec.reset()
    b = dec.decode_chunk(codes[:, :13])
    np.testing.assert_array_equal(a[: b.shape[0]], b)


# ---------------------------------------------------------------------------
# encode-side streaming (live audio in)
# ---------------------------------------------------------------------------


from csm_tpu.codec.mimi import mimi_encode
from csm_tpu.codec.streaming import (
    MimiStreamEncoder,
    mimi_encode_stream_init,
    mimi_encode_stream_step,
)


@pytest.fixture(scope="module")
def full_encode():
    return jax.jit(lambda p, a: mimi_encode(p, a, CFG))


def _stream_encode(params, audio, chunk_frames):
    """Encode (B, T) audio in fixed frame-chunks; returns (B, K, F)."""
    spf = CFG.samples_per_frame
    state = mimi_encode_stream_init(params, audio.shape[0], CFG)
    step = jax.jit(lambda p, s, a: mimi_encode_stream_step(p, s, a, CFG))
    out = []
    t = 0
    while t < audio.shape[1]:
        n = min(chunk_frames * spf, audio.shape[1] - t)
        codes, state = step(params, state, audio[:, t : t + n])
        out.append(np.asarray(codes))
        t += n
    return np.concatenate(out, axis=2)


def _speechlike(key, B, T):
    """Band-limited noise (smooth enough that RVQ argmax ties are rare)."""
    x = np.asarray(jax.random.normal(key, (B, T)), np.float32)
    k = np.hanning(65).astype(np.float32)
    k /= k.sum()
    return np.stack([np.convolve(r, k, mode="same") for r in x])


def test_stream_encode_matches_full_10s(mimi_params, full_encode):
    """10 s encoded in 5-frame chunks == full encode (codes exact up to
    RVQ argmax boundary ties — require >=99.9% match, as the Mimi oracle
    parity test does for encode)."""
    T = 125 * CFG.samples_per_frame  # 10 s
    audio = _speechlike(jax.random.key(3), 1, T)
    want = np.asarray(full_encode(mimi_params, jnp.asarray(audio)))
    got = _stream_encode(mimi_params, jnp.asarray(audio), chunk_frames=5)
    assert got.shape == want.shape
    match = float(np.mean(got == want))
    assert match >= 0.999, f"code match rate {match}"


def test_stream_encode_varied_chunks(mimi_params, full_encode):
    """Chunk size must not matter: 1-frame and 13-frame streams agree."""
    T = 39 * CFG.samples_per_frame
    audio = _speechlike(jax.random.key(5), 1, T)
    a = _stream_encode(mimi_params, jnp.asarray(audio), chunk_frames=1)
    b = _stream_encode(mimi_params, jnp.asarray(audio), chunk_frames=13)
    match = float(np.mean(a == b))
    assert match >= 0.999, f"cross-chunk match rate {match}"


def test_stream_encoder_wrapper_roundtrip(mimi_params):
    """MimiStreamEncoder feeds MimiStreamDecoder: encode→decode streaming
    round-trip runs end-to-end and rejects misaligned chunks."""
    spf = CFG.samples_per_frame
    enc = MimiStreamEncoder(mimi_params, CFG)
    dec = MimiStreamDecoder(mimi_params, CFG)
    audio = _speechlike(jax.random.key(9), 1, 6 * spf)[0]
    out = []
    for t in range(0, len(audio), 2 * spf):
        codes = enc.encode_chunk(audio[t : t + 2 * spf])
        assert codes.shape == (CFG.num_quantizers, 2)
        out.append(dec.decode_chunk(codes))
    assert np.concatenate(out).shape == (6 * spf,)
    with pytest.raises(ValueError):
        enc.encode_chunk(audio[: spf + 1])
