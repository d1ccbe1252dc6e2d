"""int8 weight-only quantization tests: error bounds + end-to-end decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csm_tpu.models.config import tiny_test_args
from csm_tpu.models.csm import init_csm_params
from csm_tpu.models.generation import generate_audio_tokens
from csm_tpu.models.llama import transformer_apply
from csm_tpu.ops.attention import causal_mask_from_positions
from csm_tpu.utils.quantize import (
    dequantize_weight,
    is_quantized,
    quantize_csm_params,
    quantize_weight,
)


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((2, 32, 48)), jnp.float32)
    q = quantize_weight(w)
    assert q["w8"].dtype == jnp.int8
    assert q["scale"].shape == (2, 1, 48)
    back = dequantize_weight(q)
    # symmetric int8: half a quantization step of rounding error plus the
    # bf16 rounding of the scale itself (~2^-8 relative on values ≤ 127·s)
    step = np.asarray(q["scale"], np.float32)
    assert np.all(np.abs(np.asarray(back) - np.asarray(w)) <= step * 1.05 + 1e-7)


def test_quantized_forward_close():
    args = tiny_test_args()
    params = init_csm_params(jax.random.key(0), args, jnp.float32)
    qparams = quantize_csm_params(params)
    cfg = args.backbone
    rng = np.random.default_rng(1)
    h = jnp.asarray(rng.standard_normal((2, 8, cfg.embed_dim)) * 0.1, jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(8), (2, 8))
    mask = causal_mask_from_positions(pos, pos[0])
    apply = jax.jit(transformer_apply, static_argnames=("cfg",))
    full, _ = apply(params["backbone"], cfg, h, pos, mask)
    quant, _ = apply(qparams["backbone"], cfg, h, pos, mask)
    # per-layer quantization noise stays small relative to activations
    rel = float(
        jnp.linalg.norm(quant - full) / jnp.maximum(jnp.linalg.norm(full), 1e-9)
    )
    assert rel < 0.05, rel


def test_quantized_generation_runs():
    args = tiny_test_args()
    params = init_csm_params(jax.random.key(0), args, jnp.float32)
    qparams = quantize_csm_params(params)
    K = args.audio_num_codebooks
    toks = jnp.zeros((1, 8, K + 1), jnp.int32).at[:, :6, -1].set(3)
    msk = jnp.zeros((1, 8, K + 1), bool).at[:, :6, -1].set(True)
    res = jax.jit(
        lambda p, k: generate_audio_tokens(
            p, args, k, toks, msk, jnp.full((1,), 6, jnp.int32),
            max_frames=3, temperature=0.9, topk=5, compute_dtype=jnp.float32,
        )
    )(qparams, jax.random.key(1))
    frames = np.asarray(res.frames)
    assert frames.shape == (1, 3, K)
    assert frames.min() >= 0 and frames.max() < args.audio_vocab_size


def test_int8_decoder_mixed_c0_exact():
    """int8-decoder mixed precision: only the acoustic decoder is
    quantized, so the semantic (codebook-0) token stream is BIT-IDENTICAL
    to the bf16 model under the same key — the quality exposure is
    confined to codebooks 1..K-1."""
    args = tiny_test_args()
    params = init_csm_params(jax.random.key(0), args, jnp.float32)
    qd = quantize_csm_params(params, components=("decoder",))
    assert is_quantized(qd["decoder"]["wq"])
    assert not is_quantized(qd["backbone"]["wq"])
    K = args.audio_num_codebooks
    toks = jnp.zeros((1, 8, K + 1), jnp.int32).at[:, :6, -1].set(3)
    msk = jnp.zeros((1, 8, K + 1), bool).at[:, :6, -1].set(True)
    run = jax.jit(
        lambda p, k: generate_audio_tokens(
            p, args, k, toks, msk, jnp.full((1,), 6, jnp.int32),
            max_frames=4, temperature=1.0, topk=1, compute_dtype=jnp.float32,
        )
    )
    ref = run(params, jax.random.key(1))
    got = run(qd, jax.random.key(1))
    # frame feedback embeds ALL codebooks into the next backbone step, so
    # exactness holds per-frame only while the acoustic tokens agree;
    # frame 0's c0 is computed from the text prompt alone -> always exact
    np.testing.assert_array_equal(
        np.asarray(got.frames)[0, 0, 0], np.asarray(ref.frames)[0, 0, 0]
    )


def test_server_int8_decoder_mode():
    """BatchedServer(weight_dtype="int8-decoder"): backbone stays float,
    decoder quantizes, serving runs end-to-end."""
    from csm_tpu.serving import BatchedServer, StreamRequest

    args = tiny_test_args()
    params = init_csm_params(jax.random.key(0), args, jnp.float32)
    server = BatchedServer(params, args, n_slots=1, max_seq_len=128,
                           temperature=1.0, topk=1,
                           compute_dtype=jnp.float32,
                           weight_dtype="int8-decoder")
    bb = server.params["backbone"]
    assert not is_quantized(bb["wqkv"] if "wqkv" in bb else bb["wq"])
    dec = server.params["decoder"]
    assert is_quantized(dec["wqkv"] if "wqkv" in dec else dec["wq"])
    K = args.audio_num_codebooks
    toks = np.zeros((6, K + 1), np.int32)
    msk = np.zeros((6, K + 1), bool)
    toks[:, -1] = 3
    msk[:, -1] = True
    results, _ = server.run([StreamRequest(toks, msk, max_frames=3,
                                           request_id=0)])
    assert results and results[0].frames.shape[1] == K


def test_streaming_quantize_matches_whole_tree():
    """quantize_csm_params_streaming (the 8B load path: per-layer-chunk
    upload+quantize, full float tree never on device) == the whole-tree
    quantizer, bit-for-bit, for int8 and int4."""
    from csm_tpu.utils.quantize import (
        quantize_csm_params,
        quantize_csm_params_int4,
        quantize_csm_params_streaming,
    )

    args = tiny_test_args()
    params = init_csm_params(jax.random.key(3), args, jnp.float32)
    host = jax.tree.map(np.asarray, params)
    for mode, whole in (
        ("int8", quantize_csm_params),
        ("int4", quantize_csm_params_int4),
    ):
        ref = jax.jit(whole)(params)
        got = quantize_csm_params_streaming(host, mode=mode)
        assert jax.tree_util.tree_structure(ref) == \
            jax.tree_util.tree_structure(got)
        for r, g in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(g))
