"""Training ↔ inference alignment: the amortized acoustic loss must score
exactly the quantity the frame decoder computes at inference.

For one audio frame, the loss path's teacher-forced decoder logits
(one batched pass over [h_t, c0..c30]) are compared position-by-position
against the inference-style incremental cached decode feeding the same
ground-truth codebooks — any off-by-one in positions, head indexing, or
the projection point would train the decoder on a different function than
generation uses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csm_tpu.models import csm
from csm_tpu.models.config import tiny_test_args
from csm_tpu.models.llama import transformer_apply
from csm_tpu.ops.attention import causal_mask_from_positions
from csm_tpu.ops.kvcache import init_kv_cache


@pytest.fixture(scope="module")
def setup():
    args = tiny_test_args()
    params = csm.init_csm_params(jax.random.key(0), args, jnp.float32)
    rng = np.random.default_rng(7)
    h_t = jnp.asarray(
        rng.standard_normal((1, args.backbone.embed_dim)), jnp.float32
    )
    frame = jnp.asarray(
        rng.integers(0, args.audio_vocab_size, args.audio_num_codebooks), jnp.int32
    )
    return args, params, h_t, frame


def teacher_forced_logits(args, params, h_t, frame):
    """The compute_loss decoder pass (csm_tpu/training/losses.py)."""
    K = args.audio_num_codebooks
    cb_idx = jnp.arange(K - 1)
    cb_embeds = params["audio_embeddings"][
        frame[None, : K - 1] + cb_idx[None, :] * args.audio_vocab_size
    ]  # (1, K-1, E_b)
    dec_in = jnp.concatenate([h_t[:, None, :], cb_embeds], axis=1)
    dec_in = dec_in @ params["projection"]
    pos = jnp.broadcast_to(jnp.arange(K), (1, K))
    mask = causal_mask_from_positions(pos, pos[0])
    dh, _ = transformer_apply(params["decoder"], args.decoder, dec_in, pos, mask)
    return jnp.einsum("nkd,kdv->nkv", dh[:, 1:, :], params["audio_head"])[0]


def incremental_logits(args, params, h_t, frame):
    """The generate_frame inner loop (csm_tpu/models/csm.py:197-238), but
    fed the ground-truth codebooks instead of samples."""
    K = args.audio_num_codebooks
    dec = args.decoder
    cache = init_kv_cache(dec, 1, jnp.float32, max_seq_len=K)
    kv_pos = jnp.arange(K)

    c0_embed = csm.embed_audio(params, args, 0, frame[None, 0])
    curr = jnp.stack([h_t[0], c0_embed[0]])[None]  # (1, 2, E_b)
    proj = curr @ params["projection"]
    pos01 = jnp.broadcast_to(jnp.arange(2), (1, 2))
    dh, cache = transformer_apply(
        params["decoder"], dec, proj, pos01,
        causal_mask_from_positions(pos01, kv_pos), cache, jnp.zeros((), jnp.int32),
    )
    logits = [dh[:, -1, :] @ params["audio_head"][0]]

    for i in range(2, K):
        ci_embed = csm.embed_audio(params, args, i - 1, frame[None, i - 1])[:, None]
        proj = ci_embed @ params["projection"]
        pos = jnp.full((1, 1), i)
        dh, cache = transformer_apply(
            params["decoder"], dec, proj, pos,
            causal_mask_from_positions(pos, kv_pos), cache, jnp.int32(i),
        )
        logits.append(dh[:, -1, :] @ params["audio_head"][i - 1])
    return jnp.concatenate(logits, axis=0)  # (K-1, V)


def test_loss_decoder_matches_inference_decoder(setup):
    args, params, h_t, frame = setup
    tf = np.asarray(jax.jit(
        lambda: teacher_forced_logits(args, params, h_t, frame)
    )())
    inc = np.asarray(jax.jit(
        lambda: incremental_logits(args, params, h_t, frame)
    )())
    np.testing.assert_allclose(tf, inc, atol=2e-4, rtol=2e-4)
