"""int8 KV-cache tests: quantize-at-write correctness and bounded drift.

The quantized cache (csm_tpu/ops/kvcache.py QuantKV) must behave exactly
like the float cache up to the per-row symmetric quantization error
(absmax/127 per (position, head) row) through every write pattern the
runtime uses: scalar-offset prefill, per-row decode writes, and the full
transformer_apply cached path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from csm_tpu.models.config import tiny_test_args
from csm_tpu.ops.kvcache import (
    KVCache,
    QuantKV,
    dequantize_kv,
    init_kv_cache,
    quantize_kv_rows,
    reset_kv_cache,
    update_layer,
)


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 5, 3, 16)), jnp.float32)
    q = quantize_kv_rows(x)
    assert q.q.dtype == jnp.int8 and q.s.shape == (2, 5, 3, 1)
    back = dequantize_kv(q, jnp.float32)
    # error <= scale/2 = absmax/254 per row (+2% slack: TPU f32 division
    # is reciprocal-based and can flip a round() at the half boundary)
    bound = (
        np.asarray(jnp.max(jnp.abs(x), axis=-1, keepdims=True)) / 254 * 1.02
        + 1e-6
    )
    err = np.abs(np.asarray(back - x))
    np.testing.assert_array_less(err, np.broadcast_to(bound, err.shape))


def test_update_layer_quant_matches_float():
    """Scalar-offset AND per-row writes into a quantized cache land the
    same (dequantized) values as the float cache, up to quantization."""
    cfg = tiny_test_args().backbone
    rng = np.random.default_rng(1)
    B, S = 2, 4
    kf = init_kv_cache(cfg, B, jnp.float32, max_seq_len=16)
    kq = init_kv_cache(cfg, B, jnp.int8, max_seq_len=16)
    assert isinstance(kq.k, QuantKV)

    new_k = jnp.asarray(
        rng.standard_normal((B, S, cfg.num_kv_heads, cfg.head_dim)), jnp.float32
    )
    new_v = jnp.asarray(
        rng.standard_normal((B, S, cfg.num_kv_heads, cfg.head_dim)), jnp.float32
    )
    layer0 = lambda c: jax.tree.map(lambda x: x[0], c)  # noqa: E731
    off = jnp.asarray(3, jnp.int32)
    kf0, vf0 = update_layer(kf.k[0], kf.v[0], new_k, new_v, off)
    kq0, vq0 = update_layer(layer0(kq.k), layer0(kq.v), new_k, new_v, off)
    np.testing.assert_allclose(
        np.asarray(dequantize_kv(kq0, jnp.float32)), np.asarray(kf0), atol=0.02
    )
    np.testing.assert_allclose(
        np.asarray(dequantize_kv(vq0, jnp.float32)), np.asarray(vf0), atol=0.02
    )

    # per-row decode write (serving): each slot at its own offset
    roff = jnp.asarray([1, 7], jnp.int32)
    dk = new_k[:, :1]
    dv = new_v[:, :1]
    kf1, _ = update_layer(kf.k[0], kf.v[0], dk, dv, roff)
    kq1, _ = update_layer(layer0(kq.k), layer0(kq.v), dk, dv, roff)
    np.testing.assert_allclose(
        np.asarray(dequantize_kv(kq1, jnp.float32)), np.asarray(kf1), atol=0.02
    )

    # reset zeroes every leaf, preserving structure
    r = reset_kv_cache(kq)
    assert isinstance(r.k, QuantKV)
    assert not np.asarray(r.k.q).any() and not np.asarray(r.k.s).any()


def test_transformer_int8_kv_bounded_drift():
    """Prefill + one decode step through transformer_apply: the int8-cache
    output tracks the float-cache output within quantization noise."""
    from csm_tpu.models.llama import transformer_apply, transformer_init
    from csm_tpu.ops.attention import causal_mask_from_positions

    cfg = tiny_test_args().backbone
    params = transformer_init(jax.random.key(0), cfg, jnp.float32)
    rng = np.random.default_rng(2)
    B, S = 2, 6
    h = jnp.asarray(rng.standard_normal((B, S, cfg.embed_dim)), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    kv_pos = jnp.arange(16)
    mask = causal_mask_from_positions(pos, kv_pos)

    outs = {}
    for name, dt in (("f32", jnp.float32), ("int8", jnp.int8)):
        cache = init_kv_cache(cfg, B, dt, max_seq_len=16)
        o1, cache = transformer_apply(
            params, cfg, h, pos, mask, cache, jnp.zeros((), jnp.int32)
        )
        # decode step at position S
        pos1 = jnp.full((B, 1), S, jnp.int32)
        mask1 = causal_mask_from_positions(pos1, kv_pos)
        o2, _ = transformer_apply(
            params, cfg, h[:, :1], pos1, mask1, cache, jnp.asarray(S, jnp.int32)
        )
        outs[name] = (np.asarray(o1), np.asarray(o2))

    for a, b in zip(outs["f32"], outs["int8"]):
        scale = np.abs(a).max()
        np.testing.assert_allclose(b, a, atol=0.05 * scale)


def test_generation_int8_kv_runs_and_tracks():
    """End-to-end greedy generation with kv_dtype=int8: valid frames, and
    a high token-match rate vs the float-cache run (tiny f32 model —
    quantization rarely flips an argmax)."""
    from csm_tpu.models.csm import init_csm_params
    from csm_tpu.models.generation import generate_audio_tokens_jit

    args = tiny_test_args()
    params = init_csm_params(jax.random.key(0), args, jnp.float32)
    K = args.audio_num_codebooks
    rng = np.random.default_rng(3)
    T, S_pad, B = 6, 64, 1
    toks = np.zeros((B, S_pad, K + 1), np.int32)
    msk = np.zeros((B, S_pad, K + 1), bool)
    toks[0, :T, -1] = rng.integers(1, args.text_vocab_size, T)
    msk[0, :T, -1] = True

    res = {}
    for kv in (None, jnp.int8):
        res[kv] = generate_audio_tokens_jit(
            params, args, jax.random.key(0), jnp.asarray(toks),
            jnp.asarray(msk), jnp.full((B,), T, jnp.int32),
            max_frames=6, temperature=1.0, topk=1,
            compute_dtype=jnp.float32, kv_dtype=kv,
        )
    f_ref = np.asarray(res[None].frames)[0]
    f_q = np.asarray(res[jnp.int8].frames)[0]
    n = min(int(res[None].num_frames[0]), int(res[jnp.int8].num_frames[0]))
    assert n >= 1
    match = (f_ref[:n] == f_q[:n]).mean()
    assert match >= 0.9, f"int8-KV token match {match:.2%}"
