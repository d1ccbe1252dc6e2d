"""Fused qkv / gate-up projection layout (models/llama.fuse_projections).

The fused layout is pure re-layout — identical contractions through fewer,
larger HBM streams — so outputs must match the separate layout to float
noise, for float and int8 weights, through both transformer_apply and the
full generation loop.  Generator/BatchedServer fuse automatically on a
single device (CSM_TPU_NO_FUSE=1 disables).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csm_tpu.models import csm
from csm_tpu.models.config import tiny_test_args
from csm_tpu.models.csm import fuse_csm_params, init_csm_params
from csm_tpu.models.generation import generate_audio_tokens
from csm_tpu.models.llama import fuse_projections, transformer_apply
from csm_tpu.ops.attention import causal_mask_from_positions
from csm_tpu.utils.quantize import quantize_csm_params

gen_jit = jax.jit(
    generate_audio_tokens,
    static_argnames=("args", "max_frames", "topk", "compute_dtype"),
)


@pytest.fixture(scope="module")
def tiny_model():
    args = tiny_test_args()
    params = init_csm_params(jax.random.key(0), args, jnp.float32)
    return args, params


def _prompt(args, B=2, T=6, S_pad=8, seed=3):
    rng = np.random.default_rng(seed)
    K = args.audio_num_codebooks
    tokens = np.zeros((B, S_pad, K + 1), dtype=np.int32)
    mask = np.zeros((B, S_pad, K + 1), dtype=bool)
    tokens[:, :T, -1] = rng.integers(1, args.text_vocab_size, (B, T))
    mask[:, :T, -1] = True
    return jnp.asarray(tokens), jnp.asarray(mask), jnp.full((B,), T, jnp.int32)


def test_transformer_apply_parity(tiny_model):
    args, params = tiny_model
    cfg = args.backbone
    rng = np.random.default_rng(1)
    h = jnp.asarray(rng.standard_normal((2, 8, cfg.embed_dim)) * 0.1, jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(8), (2, 8))
    mask = causal_mask_from_positions(pos, pos[0])
    apply = jax.jit(transformer_apply, static_argnames=("cfg",))
    sep, _ = apply(params["backbone"], cfg, h, pos, mask)
    fus, _ = apply(fuse_projections(params["backbone"]), cfg, h, pos, mask)
    np.testing.assert_allclose(
        np.asarray(fus), np.asarray(sep), rtol=1e-5, atol=1e-6
    )


def test_generation_loop_parity(tiny_model):
    args, params = tiny_model
    fused = fuse_csm_params(params)
    tokens, mask, T = _prompt(args)
    key = jax.random.key(7)
    a = gen_jit(params, args, key, tokens, mask, T,
                max_frames=6, topk=1, temperature=1.0,
                compute_dtype=jnp.float32)
    b = gen_jit(fused, args, key, tokens, mask, T,
                max_frames=6, topk=1, temperature=1.0,
                compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(a.frames), np.asarray(b.frames))
    np.testing.assert_array_equal(np.asarray(a.num_frames), np.asarray(b.num_frames))


def test_int8_fusion_parity(tiny_model):
    args, params = tiny_model
    q = quantize_csm_params(params)
    qf = fuse_csm_params(q)
    assert set(qf["backbone"]["wqkv"]) == {"w8", "scale"}
    tokens, mask, T = _prompt(args, seed=11)
    key = jax.random.key(9)
    a = gen_jit(q, args, key, tokens, mask, T,
                max_frames=4, topk=1, temperature=1.0,
                compute_dtype=jnp.float32)
    b = gen_jit(qf, args, key, tokens, mask, T,
                max_frames=4, topk=1, temperature=1.0,
                compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(a.frames), np.asarray(b.frames))


def test_fuse_idempotent(tiny_model):
    _, params = tiny_model
    once = fuse_csm_params(params)
    twice = fuse_csm_params(once)
    assert once["backbone"] is twice["backbone"]
    assert "wq" not in once["backbone"] and "wqkv" in once["backbone"]


def test_fused_rejects_unmerged_lora(tiny_model):
    args, params = tiny_model
    cfg = args.backbone
    fused = fuse_projections(params["backbone"])
    h = jnp.zeros((1, 4, cfg.embed_dim), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(4), (1, 4))
    mask = causal_mask_from_positions(pos, pos[0])
    r = 2
    lora = {
        "wq": {
            "a": jnp.zeros((cfg.num_layers, cfg.embed_dim, r)),
            "b": jnp.zeros((cfg.num_layers, r, cfg.num_heads * cfg.head_dim)),
        }
    }
    with pytest.raises(ValueError, match="fused"):
        transformer_apply(fused, cfg, h, pos, mask, lora=lora, lora_scale=2.0)
