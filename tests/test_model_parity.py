"""Parity of the JAX CSM core against the PyTorch oracle.

The oracle (tests/torch_oracle.py) reimplements the reference semantics
(src/csm/models/model.py) in float32; these tests are the TPU build's
analogue of the reference's MLX-vs-PyTorch parity testing
(src/csm/mlx/token_analyzer.py, README.md:217).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from csm_tpu.models.config import tiny_test_args
from csm_tpu.models import csm
from csm_tpu.models.llama import transformer_apply
from csm_tpu.ops.attention import causal_mask_from_positions
from csm_tpu.ops.kvcache import init_kv_cache
from csm_tpu.utils.checkpoint_compat import (
    convert_torch_state_dict,
    export_to_torch_names,
)
from torch_oracle import OracleCSM, make_random_state_dict


@pytest.fixture(scope="module")
def tiny():
    args = tiny_test_args()
    state = make_random_state_dict(args, seed=0)
    params = jax.tree.map(jnp.asarray, convert_torch_state_dict(state, args))
    oracle = OracleCSM(state, args)
    return args, state, params, oracle


def random_frames(args, B, S, seed=1):
    """Random (tokens, mask) in the 33-column frame layout."""
    rng = np.random.default_rng(seed)
    K = args.audio_num_codebooks
    tokens = np.zeros((B, S, K + 1), dtype=np.int64)
    mask = np.zeros((B, S, K + 1), dtype=bool)
    for b in range(B):
        for s in range(S):
            if rng.random() < 0.5:  # text position
                tokens[b, s, -1] = rng.integers(0, args.text_vocab_size)
                mask[b, s, -1] = True
            else:  # audio position
                tokens[b, s, :K] = rng.integers(0, args.audio_vocab_size, K)
                mask[b, s, :K] = True
    return tokens, mask


def test_backbone_full_forward_parity(tiny):
    args, state, params, oracle = tiny
    tokens, mask = random_frames(args, B=2, S=12)

    h_torch = oracle.backbone_h(
        torch.from_numpy(tokens), torch.from_numpy(mask)
    ).numpy()
    h_jax = np.asarray(
        jax.jit(
            csm.backbone_forward,
            static_argnames=("args", "compute_dtype"),
        )(params, args, jnp.asarray(tokens), jnp.asarray(mask), compute_dtype=jnp.float32)
    )
    np.testing.assert_allclose(h_jax, h_torch, atol=2e-4, rtol=2e-4)


def test_generate_frame_parity_argmax(tiny):
    """One full frame with topk=1 (deterministic) must match the oracle."""
    args, state, params, oracle = tiny
    tokens, mask = random_frames(args, B=2, S=9)

    frame_torch = oracle.generate_frame_argmax(
        torch.from_numpy(tokens), torch.from_numpy(mask)
    ).numpy()

    B, S, _ = tokens.shape
    fs = csm.init_frame_state(args, B, jnp.float32, max_seq_len=64)
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    frame_jax, _ = jax.jit(
        csm.generate_frame, static_argnames=("args", "topk", "compute_dtype")
    )(
        params,
        args,
        jax.random.key(0),
        jnp.asarray(tokens),
        jnp.asarray(mask),
        pos,
        fs,
        temperature=1.0,
        topk=1,
        compute_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(frame_jax), frame_torch)


def test_multi_frame_decode_parity(tiny):
    """Incremental cached decode over several frames matches the oracle's
    full-recompute path (validates KV-cache correctness end to end)."""
    args, state, params, oracle = tiny
    K = args.audio_num_codebooks
    tokens_np, mask_np = random_frames(args, B=1, S=6)

    fs = csm.init_frame_state(args, 1, jnp.float32, max_seq_len=64)
    step = jax.jit(
        csm.generate_frame,
        static_argnames=("args", "topk", "compute_dtype"),
    )

    cur_tokens = jnp.asarray(tokens_np)
    cur_mask = jnp.asarray(mask_np)
    pos = jnp.broadcast_to(jnp.arange(6), (1, 6))
    oracle_tokens = torch.from_numpy(tokens_np)
    oracle_mask = torch.from_numpy(mask_np)

    for step_i in range(3):
        frame_jax, fs = step(
            params,
            args,
            jax.random.key(step_i),
            cur_tokens,
            cur_mask,
            pos,
            fs,
            temperature=1.0,
            topk=1,
            compute_dtype=jnp.float32,
        )
        frame_torch = oracle.generate_frame_argmax(oracle_tokens, oracle_mask).numpy()
        np.testing.assert_array_equal(np.asarray(frame_jax), frame_torch)

        # feed the frame back: audio cols live, text col dead
        # (reference: src/csm/generator.py:203-207)
        new_tok = np.zeros((1, 1, K + 1), dtype=np.int64)
        new_tok[0, 0, :K] = frame_torch[0]
        new_mask = np.zeros((1, 1, K + 1), dtype=bool)
        new_mask[0, 0, :K] = True
        cur_tokens = jnp.asarray(new_tok)
        cur_mask = jnp.asarray(new_mask)
        pos = pos[:, -1:] + 1
        oracle_tokens = torch.cat([oracle_tokens, torch.from_numpy(new_tok)], dim=1)
        oracle_mask = torch.cat([oracle_mask, torch.from_numpy(new_mask)], dim=1)


def test_cached_vs_uncached_transformer(tiny):
    """Chunked cached forward == one uncached full forward."""
    args, _, params, _ = tiny
    cfg = args.backbone
    B, S = 2, 10
    rng = np.random.default_rng(3)
    h = jnp.asarray(rng.standard_normal((B, S, cfg.embed_dim)), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))

    apply = jax.jit(transformer_apply, static_argnames=("cfg",))

    full_mask = causal_mask_from_positions(pos, jnp.arange(S))
    h_full, _ = apply(params["backbone"], cfg, h, pos, full_mask)

    cache = init_kv_cache(cfg, B, jnp.float32, max_seq_len=16)
    kv_pos = jnp.arange(16)
    outs = []
    offset = 0
    for chunk in (4, 3, 3):
        hc = h[:, offset : offset + chunk]
        pc = pos[:, offset : offset + chunk]
        m = causal_mask_from_positions(pc, kv_pos)
        out, cache = apply(
            params["backbone"], cfg, hc, pc, m, cache, jnp.int32(offset)
        )
        outs.append(out)
        offset += chunk
    h_inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(h_inc), np.asarray(h_full), atol=1e-5, rtol=1e-5
    )


def test_checkpoint_roundtrip(tiny):
    """import → export → import is the identity."""
    args, state, params, _ = tiny
    exported = export_to_torch_names(jax.tree.map(np.asarray, params), args)
    reimported = convert_torch_state_dict(exported, args)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), b, atol=1e-6),
        jax.tree.map(np.asarray, params),
        reimported,
    )


def test_safetensors_roundtrip(tiny, tmp_path):
    """safetensors export (reference torchtune names) → import is identity
    (the reference's MLX checkpoint format, src/csm/training/utils.py:577-861)."""
    from csm_tpu.utils.safetensors_io import (
        load_params_safetensors,
        save_params_safetensors,
    )

    args, state, params, _ = tiny
    p = str(tmp_path / "model.safetensors")
    save_params_safetensors(p, params, args)
    params2, args2 = load_params_safetensors(p)
    assert args2 == args
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        params,
        params2,
    )
