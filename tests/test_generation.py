"""Tests for the fused (single-jit) generation loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csm_tpu.models import csm
from csm_tpu.models.config import tiny_test_args
from csm_tpu.models.generation import (
    bucket_length,
    generate_audio_tokens,
)

# jit everything under test: eager lax.while_loop/scan would recompile per
# call and dispatch op-by-op over the TPU tunnel.
gen_jit = jax.jit(
    generate_audio_tokens,
    static_argnames=("args", "max_frames", "topk", "compute_dtype"),
)
frame_jit = jax.jit(
    csm.generate_frame, static_argnames=("args", "topk", "compute_dtype")
)


@pytest.fixture(scope="module")
def tiny_model():
    args = tiny_test_args()
    params = csm.init_csm_params(jax.random.key(0), args, jnp.float32)
    return args, params


def make_text_prompt(args, B, T, S_pad, seed=0):
    """Random text-only prompt, right-padded to S_pad."""
    rng = np.random.default_rng(seed)
    K = args.audio_num_codebooks
    tokens = np.zeros((B, S_pad, K + 1), dtype=np.int32)
    mask = np.zeros((B, S_pad, K + 1), dtype=bool)
    tokens[:, :T, -1] = rng.integers(1, args.text_vocab_size, (B, T))
    mask[:, :T, -1] = True
    return jnp.asarray(tokens), jnp.asarray(mask), jnp.full((B,), T, jnp.int32)


def stepped_reference(args, params, key, tokens, mask, T, max_frames):
    """Python-stepped decode using generate_frame directly (the reference's
    loop structure, src/csm/generator.py:196-207) as the oracle for the
    fused loop."""
    B = tokens.shape[0]
    K = args.audio_num_codebooks
    state = csm.init_frame_state(
        args, B, jnp.float32, max_seq_len=tokens.shape[1] + max_frames
    )
    col = jnp.arange(tokens.shape[1], dtype=jnp.int32)
    pos = jnp.where(col[None, :] < T, col[None, :], csm.PAD_POS)
    frames = []
    frame, state = frame_jit(
        params, args, jax.random.fold_in(key, 0), tokens, mask, pos, state,
        1.0, 1, jnp.float32, last_idx=jnp.full((B,), T - 1),
    )
    frames.append(np.asarray(frame))
    step_mask = jnp.zeros((B, 1, K + 1), bool).at[:, :, :K].set(True)
    for i in range(1, max_frames):
        step_tokens = jnp.zeros((B, 1, K + 1), jnp.int32).at[:, 0, :K].set(frame)
        p = jnp.full((B, 1), T + i - 1, jnp.int32)
        frame, state = frame_jit(
            params, args, jax.random.fold_in(key, i), step_tokens, step_mask,
            p, state, 1.0, 1, jnp.float32,
        )
        frames.append(np.asarray(frame))
    return np.stack(frames, axis=1)  # (B, n, K)


def test_fused_equals_stepped(tiny_model):
    """Fused while_loop decode == Python-stepped decode (argmax/topk=1).

    Note the fused loop folds key with i+1 for frame i's successor; the
    stepped oracle mirrors that keying.
    """
    args, params = tiny_model
    tokens, mask, T = make_text_prompt(args, B=1, T=6, S_pad=8)
    max_frames = 4

    res = gen_jit(
        params, args, jax.random.key(7), tokens, mask, T,
        max_frames=max_frames, temperature=1.0, topk=1,
        compute_dtype=jnp.float32,
    )
    # stepped oracle: frame i uses fold_in(key, i) with the same indexing
    stepped = stepped_reference(
        args, params, jax.random.key(7), tokens, mask, 6, max_frames
    )
    fused = np.asarray(res.frames)
    n = int(res.num_frames[0])
    assert n == max_frames or np.all(fused[0, n:] == 0)
    np.testing.assert_array_equal(fused[0, :n], stepped[0, :n])


def test_padding_invariance(tiny_model):
    """The same prompt padded to different bucket sizes generates identical
    frames — validates PAD_POS cache-slot masking."""
    args, params = tiny_model
    T, max_frames = 5, 3
    outs = []
    for S_pad in (5, 8, 16):
        tokens, mask, lens = make_text_prompt(args, B=1, T=T, S_pad=S_pad, seed=3)
        res = gen_jit(
            params, args, jax.random.key(11), tokens, mask, lens,
            max_frames=max_frames, temperature=1.0, topk=1,
            compute_dtype=jnp.float32,
        )
        outs.append(np.asarray(res.frames))
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


def test_batch_rows_independent(tiny_model):
    """Row 0 of a batch-2 generation == the same prompt generated alone
    (different prompt lengths per row)."""
    args, params = tiny_model
    K = args.audio_num_codebooks
    rng = np.random.default_rng(9)
    S_pad, max_frames = 8, 3

    # Row 1 intentionally LONGER than row 0: regression for the per-row RoPE
    # bug (positions beyond row 0's length must still get correct tables).
    toks = np.zeros((2, S_pad, K + 1), np.int32)
    msk = np.zeros((2, S_pad, K + 1), bool)
    lens = np.array([4, 6], np.int32)
    for b, t in enumerate(lens):
        toks[b, :t, -1] = rng.integers(1, args.text_vocab_size, t)
        msk[b, :t, -1] = True

    res2 = gen_jit(
        params, args, jax.random.key(5), jnp.asarray(toks), jnp.asarray(msk),
        jnp.asarray(lens), max_frames=max_frames, temperature=1.0, topk=1,
        compute_dtype=jnp.float32,
    )
    for b in range(2):
        res1 = gen_jit(
            params, args, jax.random.key(5), jnp.asarray(toks[b : b + 1]),
            jnp.asarray(msk[b : b + 1]), jnp.asarray(lens[b : b + 1]),
            max_frames=max_frames, temperature=1.0, topk=1,
            compute_dtype=jnp.float32,
        )
        np.testing.assert_array_equal(
            np.asarray(res2.frames)[b], np.asarray(res1.frames)[0]
        )


def test_bucket_length():
    assert bucket_length(1) == 64
    assert bucket_length(64) == 64
    assert bucket_length(65) == 128
    assert bucket_length(2048) == 2048
    # long-context buckets (csm_1b_args(max_seq_len=) extension)
    assert bucket_length(2049) == 4096
    assert bucket_length(8192) == 8192
    with pytest.raises(ValueError):
        bucket_length(8193)
