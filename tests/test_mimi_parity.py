"""Parity of the JAX Mimi codec against the torch ``MimiModel`` oracle.

The torch implementation (transformers.models.mimi) is the public
architecture the ``kyutai/mimi`` checkpoint ships in; the reference consumes
the same codec through ``moshi`` (src/csm/generator.py:66-70).  A random-init
torch model exercises every weight and padding rule, so exact parity here
means checkpoint imports are numerically faithful.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from csm_tpu.codec import mimi as jmimi
from csm_tpu.codec.convert import convert_mimi_state_dict
from csm_tpu.codec.transformer import MimiTransformerConfig

tx = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    cfg_t = tx.MimiConfig(num_hidden_layers=2)
    tm = tx.MimiModel(cfg_t).eval()
    state = tm.state_dict()
    params = convert_mimi_state_dict(state, num_layers=2)
    params = jax.tree.map(jnp.asarray, params)
    cfg_j = jmimi.MimiConfig(transformer=MimiTransformerConfig(num_layers=2))
    return tm, params, cfg_j


# jit the codec entry points (eager scans recompile per call).
enc_jit = jax.jit(jmimi.mimi_encode, static_argnames=("cfg", "num_quantizers"))
dec_jit = jax.jit(jmimi.mimi_decode, static_argnames=("cfg",))


def test_encode_parity(models):
    tm, params, cfg = models
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((1, 24000)).astype(np.float32) * 0.1

    with torch.no_grad():
        codes_t = tm.encode(torch.from_numpy(audio)[:, None, :]).audio_codes.numpy()
    codes_j = np.asarray(enc_jit(params, jnp.asarray(audio), cfg))

    assert codes_j.shape == codes_t.shape  # (1, 32, 13)
    match = (codes_j == codes_t).mean()
    assert match > 0.99, f"code match rate {match}"


def test_decode_parity(models):
    tm, params, cfg = models
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 2048, (1, 32, 13)).astype(np.int64)

    with torch.no_grad():
        audio_t = tm.decode(torch.from_numpy(codes)).audio_values.numpy()
    audio_j = np.asarray(dec_jit(params, jnp.asarray(codes), cfg))

    assert audio_j.shape == (1, audio_t.shape[-1])
    np.testing.assert_allclose(
        audio_j[0], audio_t[0, 0], atol=5e-4, rtol=1e-3
    )


def test_frame_length_math(models):
    tm, params, cfg = models
    for n_samples in (1920, 24000, 24001, 48000):
        with torch.no_grad():
            codes_t = tm.encode(
                torch.zeros(1, 1, n_samples)
            ).audio_codes
        assert jmimi.mimi_num_frames(n_samples) == codes_t.shape[-1], n_samples


def test_decode_length(models):
    _, params, cfg = models
    codes = jnp.zeros((1, 32, 25), jnp.int32)
    audio = dec_jit(params, codes, cfg)
    # 25 frames at 12.5 Hz = 2 s = 48000 samples at 24 kHz
    assert audio.shape == (1, 48000)


def test_decode_zero_pad_invariance(models):
    """Trailing zero-frame padding must not change earlier output (the
    codec is streaming-causal) — the MimiAudioTokenizer decode bucketing
    relies on this."""
    _, params, cfg = models
    rng = np.random.default_rng(2)
    codes = rng.integers(0, 2048, (1, 32, 10)).astype(np.int32)
    padded = np.zeros((1, 32, 25), np.int32)
    padded[:, :, :10] = codes
    a1 = np.asarray(dec_jit(params, jnp.asarray(codes), cfg))
    a2 = np.asarray(dec_jit(params, jnp.asarray(padded), cfg))
    np.testing.assert_allclose(a2[0, : a1.shape[1]], a1[0], atol=1e-5)


def test_encode_bucketing(models):
    """MimiAudioTokenizer.encode pads to 25-frame buckets: every length in
    a bucket reuses ONE compiled encoder, and (the encoder being
    streaming-causal) the trailing zero-pad never changes the real frames'
    codes vs exact-frame padding."""
    _, params, cfg = models
    from csm_tpu.data.tokenizers import MimiAudioTokenizer

    tok = MimiAudioTokenizer(params, cfg=cfg)
    spf = cfg.samples_per_frame
    rng = np.random.default_rng(3)
    lens = [1000, 24000, 25 * spf - 7]  # all inside the first 2 s bucket
    out = {}
    for n in lens:
        audio = (rng.standard_normal(n) * 0.1).astype(np.float32)
        out[n] = (audio, tok.encode(audio))
    assert tok._encode._cache_size() == 1, "bucketing must bound compiles"
    for n, (audio, codes) in out.items():
        F = -(-n // spf)
        assert codes.shape[1] == F
        exact = np.zeros(F * spf, np.float32)
        exact[:n] = audio
        ref = np.asarray(enc_jit(params, jnp.asarray(exact)[None], cfg))[0]
        np.testing.assert_array_equal(codes, ref[:, :F])
