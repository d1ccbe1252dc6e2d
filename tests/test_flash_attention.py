"""Pallas flash-attention tests (run on the TPU; skipped elsewhere).

Parity with the XLA GQA attention under the PAD_POS position-mask
contract, gradient parity through the custom_vjp, and end-to-end: a long
bucketed prefill with the flash kernel generates the same tokens as the
XLA path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csm_tpu.models.config import tiny_test_args
from csm_tpu.ops.attention import causal_mask_from_positions, gqa_attention
from csm_tpu.ops import flash_attention as fa

pytestmark = pytest.mark.skipif(
    not fa.flash_available(), reason="no TPU backend for Pallas kernels"
)


def rand(shape, dtype=jnp.float32, seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape), dtype)


def test_parity_with_pad_positions():
    """Bucketed-prefill shapes: per-row prompt lengths, PAD_POS slots."""
    B, S, Hq, Hkv, D = 2, 300, 8, 2, 64
    T = 448
    q, k, v = rand((B, S, Hq, D)), rand((B, T, Hkv, D), seed=1), rand((B, T, Hkv, D), seed=2)
    PAD = 1 << 28
    lens = np.array([260, 300])
    qpos = np.where(np.arange(S)[None] < lens[:, None], np.arange(S)[None], PAD)
    kv_lens = np.array([260, 300])
    kvpos = np.where(np.arange(T)[None] < kv_lens[:, None], np.arange(T)[None], PAD)
    qpos, kvpos = jnp.asarray(qpos, jnp.int32), jnp.asarray(kvpos, jnp.int32)

    ref = gqa_attention(q, k, v, causal_mask_from_positions(qpos, kvpos))
    out = jax.jit(fa.flash_gqa_attention)(q, k, v, qpos, kvpos)
    rows = np.arange(S)[None] < lens[:, None]  # only real rows are defined
    np.testing.assert_allclose(
        np.asarray(out)[rows], np.asarray(ref)[rows], atol=2e-5
    )


def test_bf16_parity_with_f32_oracle():
    """Production dtype: bf16 operands take the MXU's native
    bf16×bf16→f32 mode (flash_attention._dot).  Bound vs the f32 oracle
    on the SAME bf16 inputs: softmax probs ∈ [0,1] and f32 accumulation
    keep the output within a few bf16 ulps."""
    B, S, Hq, Hkv, D = 2, 512, 8, 2, 64
    q = rand((B, S, Hq, D), jnp.bfloat16)
    k = rand((B, S, Hkv, D), jnp.bfloat16, seed=1)
    v = rand((B, S, Hkv, D), jnp.bfloat16, seed=2)
    qpos = jnp.broadcast_to(jnp.arange(S), (B, S)).astype(jnp.int32)
    kvpos = jnp.arange(S, dtype=jnp.int32)

    ref = gqa_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        causal_mask_from_positions(qpos, kvpos),
    )
    out = jax.jit(fa.flash_gqa_attention)(q, k, v, qpos, kvpos)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=3e-2, rtol=3e-2
    )


def test_gradient_matches_xla():
    """Pallas backward (dq/dkv kernels) vs XLA autodiff through the
    reference attention.  The two are independent algorithms in f32, so
    the bound is relative (observed max rel err ~7e-5)."""
    B, S, Hq, Hkv, D = 1, 256, 8, 2, 64
    q, k, v = rand((B, S, Hq, D)), rand((B, S, Hkv, D), seed=1), rand((B, S, Hkv, D), seed=2)
    qpos = jnp.broadcast_to(jnp.arange(S), (B, S)).astype(jnp.int32)
    kvpos = jnp.arange(S, dtype=jnp.int32)

    def loss_flash(q, k, v):
        return (fa.flash_gqa_attention(q, k, v, qpos, kvpos) ** 2).sum()

    def loss_xla(q, k, v):
        m = causal_mask_from_positions(qpos, kvpos)
        return (gqa_attention(q, k, v, m) ** 2).sum()

    g1 = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    g2 = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3)


def test_gradient_matches_xla_padded_rows():
    """Bucketed-prefill gradient: per-row lengths with PAD_POS query and kv
    slots, T != S.  Exercises the masked-row / sentinel paths of the dq and
    dkv kernels (padded kv slots must get exactly zero gradient)."""
    B, S, Hq, Hkv, D = 2, 300, 8, 2, 64
    T = 448
    q, k, v = rand((B, S, Hq, D)), rand((B, T, Hkv, D), seed=1), rand((B, T, Hkv, D), seed=2)
    PAD = 1 << 28
    lens = np.array([260, 300])
    qpos = np.where(np.arange(S)[None] < lens[:, None], np.arange(S)[None], PAD)
    kvpos = np.where(np.arange(T)[None] < lens[:, None], np.arange(T)[None], PAD)
    qpos, kvpos = jnp.asarray(qpos, jnp.int32), jnp.asarray(kvpos, jnp.int32)
    # loss over real rows only (padded rows carry no cotangent, as in training)
    rows = jnp.asarray(np.arange(S)[None] < lens[:, None])[..., None, None]

    def loss_flash(q, k, v):
        return (jnp.where(rows, fa.flash_gqa_attention(q, k, v, qpos, kvpos), 0.0) ** 2).sum()

    def loss_xla(q, k, v):
        m = causal_mask_from_positions(qpos, kvpos)
        return (jnp.where(rows, gqa_attention(q, k, v, m), 0.0) ** 2).sum()

    g1 = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    g2 = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(g1, g2):
        # grads are O(10); 5e-4 abs absorbs f32 cancellation on ~zero elements
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3)
    # dead kv slots: exactly zero
    dead = np.arange(T)[None] >= lens[:, None]
    np.testing.assert_array_equal(np.asarray(g1[1])[dead], 0.0)
    np.testing.assert_array_equal(np.asarray(g1[2])[dead], 0.0)


def test_gradient_with_lse_cotangent():
    """flash_gqa_attention_with_lse must carry gradients through BOTH
    outputs — the ring-attention log-space merge differentiates through
    lse (∂lse/∂s = p folds into the kernel's row term).  Oracle: the ring
    module's XLA chunk attention, which autodiffs plainly."""
    from csm_tpu.parallel.ring_attention import _xla_chunk_attention

    B, S, Hq, Hkv, D = 1, 256, 4, 2, 64
    q, k, v = rand((B, S, Hq, D)), rand((B, S, Hkv, D), seed=1), rand((B, S, Hkv, D), seed=2)
    qpos = jnp.broadcast_to(jnp.arange(S), (B, S)).astype(jnp.int32)
    kvpos = jnp.broadcast_to(jnp.arange(S), (B, S)).astype(jnp.int32)

    def loss_flash(q, k, v):
        out, L = fa.flash_gqa_attention_with_lse(q, k, v, qpos, kvpos)
        # nonlinear in lse so its cotangent is nontrivial
        return (out**2).sum() + jnp.sin(L).sum()

    def loss_xla(q, k, v):
        out, lse = _xla_chunk_attention(q, k, v, qpos, kvpos)  # lse (B, S, Hq)
        return (out.astype(q.dtype) ** 2).sum() + jnp.sin(lse.transpose(0, 2, 1)).sum()

    g1 = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    g2 = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3)


def test_ring_attention_differentiates_on_tpu():
    """Regression (review finding): the ring's TPU chunk path must have a
    VJP — a 1-device seq mesh runs the flash chunk inside shard_map+scan
    under jax.grad on the real chip."""
    from csm_tpu.parallel.ring_attention import make_sp_mesh, sharded_ring_attention
    from csm_tpu.ops.attention import causal_mask_from_positions, gqa_attention

    B, S, Hq, Hkv, D = 1, 256, 4, 2, 64
    q, k, v = rand((B, S, Hq, D)), rand((B, S, Hkv, D), seed=1), rand((B, S, Hkv, D), seed=2)
    qpos = jnp.broadcast_to(jnp.arange(S), (B, S)).astype(jnp.int32)
    kvpos = jnp.arange(S, dtype=jnp.int32)
    mesh = make_sp_mesh(jax.devices()[:1])

    def loss_ring(q, k, v):
        return (sharded_ring_attention(mesh, q, k, v, qpos, kvpos) ** 2).sum()

    def loss_ref(q, k, v):
        m = causal_mask_from_positions(qpos, kvpos)
        return (gqa_attention(q, k, v, m) ** 2).sum()

    g1 = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    g2 = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3)


def test_long_context_generation_4096(monkeypatch):
    """Beyond the reference's hard 2048 cap (src/csm/generator.py:118): a
    2500-token prompt in a 4096-position context generates, and the flash
    prefill produces the same argmax tokens as the XLA path."""
    from csm_tpu.models.csm import init_csm_params
    from csm_tpu.models.generation import bucket_length, generate_audio_tokens

    assert bucket_length(2500) == 4096  # the extended bucket ladder

    base = tiny_test_args()
    args = dataclasses.replace(
        base,
        backbone_config=dataclasses.replace(base.backbone_config, max_seq_len=4096),
        decoder_config=dataclasses.replace(base.decoder_config, max_seq_len=4096),
    )
    params = init_csm_params(jax.random.key(0), args, jnp.float32)
    K = args.audio_num_codebooks
    rng = np.random.default_rng(11)
    B, T_real, S_pad = 1, 2500, 4096
    toks = np.zeros((B, S_pad, K + 1), np.int32)
    msk = np.zeros((B, S_pad, K + 1), bool)
    toks[:, :T_real, -1] = rng.integers(1, args.text_vocab_size, (B, T_real))
    msk[:, :T_real, -1] = True
    lens = jnp.full((B,), T_real, jnp.int32)

    def gen():
        return np.asarray(
            jax.jit(
                lambda p, k: generate_audio_tokens(
                    p, args, k, jnp.asarray(toks), jnp.asarray(msk), lens,
                    max_frames=3, temperature=1.0, topk=1,
                    compute_dtype=jnp.float32,
                )
            )(params, jax.random.key(3)).frames
        )

    flash_frames = gen()
    monkeypatch.setenv("CSM_TPU_NO_FLASH", "1")
    np.testing.assert_array_equal(flash_frames, gen())


def test_generation_prefill_flash_equals_xla(monkeypatch):
    """A 300-token prompt (bucket 512 ⇒ flash prefill) generates the same
    argmax tokens as the XLA path (CSM_TPU_NO_FLASH=1)."""
    from csm_tpu.models.csm import init_csm_params
    from csm_tpu.models.generation import generate_audio_tokens

    base = tiny_test_args()
    args = dataclasses.replace(
        base,
        backbone_config=dataclasses.replace(base.backbone_config, max_seq_len=1024),
        decoder_config=dataclasses.replace(base.decoder_config, max_seq_len=1024),
    )
    params = init_csm_params(jax.random.key(0), args, jnp.float32)
    K = args.audio_num_codebooks
    rng = np.random.default_rng(5)
    B, T_real, S_pad = 1, 300, 512
    toks = np.zeros((B, S_pad, K + 1), np.int32)
    msk = np.zeros((B, S_pad, K + 1), bool)
    toks[:, :T_real, -1] = rng.integers(1, args.text_vocab_size, (B, T_real))
    msk[:, :T_real, -1] = True
    lens = jnp.full((B,), T_real, jnp.int32)

    def gen():
        return np.asarray(
            jax.jit(
                lambda p, k: generate_audio_tokens(
                    p, args, k, jnp.asarray(toks), jnp.asarray(msk), lens,
                    max_frames=3, temperature=1.0, topk=1,
                    compute_dtype=jnp.float32,
                )
            )(params, jax.random.key(3)).frames
        )

    flash_frames = gen()
    monkeypatch.setenv("CSM_TPU_NO_FLASH", "1")
    xla_frames = gen()
    np.testing.assert_array_equal(flash_frames, xla_frames)


def test_chunked_attention_matches_dense():
    """chunked_gqa_attention (the non-Pallas flash-pattern fallback in
    training/losses.py) == gqa_attention + causal mask, fwd AND grads,
    including the pad path (S not a multiple of block_q)."""
    from csm_tpu.ops.attention import chunked_gqa_attention

    rng = np.random.default_rng(7)
    B, S, Hq, Hkv, D = 2, 19, 4, 2, 8
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))

    ref = gqa_attention(q, k, v, causal_mask_from_positions(pos, pos[0]))
    out = chunked_gqa_attention(q, k, v, pos, pos[0], block_q=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def f_ref(q, k, v):
        m = causal_mask_from_positions(pos, pos[0])
        return jnp.sum(gqa_attention(q, k, v, m) ** 2)

    def f_chk(q, k, v):
        return jnp.sum(chunked_gqa_attention(q, k, v, pos, pos[0], block_q=8) ** 2)

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    g_chk = jax.grad(f_chk, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_chk, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
