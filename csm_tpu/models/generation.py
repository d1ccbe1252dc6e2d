"""Fully-compiled autoregressive audio-token generation.

The reference drives its frame loop from Python — one ``generate_frame``
call per 80 ms frame plus a host sync to test EOS
(src/csm/generator.py:196-207).  Here the ENTIRE generation — bucketed
prompt prefill, the frame loop, per-frame EOS detection and early exit —
is one ``jax.lax.while_loop`` inside one jit: zero host round-trips until
the final token buffer is fetched.

Variable-length handling under XLA's static shapes (SURVEY.md §7.3):
  * prompts are right-padded to a static bucket; padding rows carry
    PAD_POS positions so their cache slots are never attended;
  * EOS (all-zero frame, reference src/csm/generator.py:198-199) is
    tracked per batch row in a ``done`` bitmap; finished rows keep
    stepping harmlessly (outputs masked) until all rows finish or
    ``max_frames`` is hit — the while_loop exits early on full EOS.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from csm_tpu.models import csm
from csm_tpu.models.config import ModelArgs

# callers filter to <= max_seq_len; 4096/8192 serve long-context configs
# (csm_1b_args(max_seq_len=...), beyond the reference's 2048 cap)
PROMPT_BUCKETS = (64, 128, 256, 512, 1024, 2048, 4096, 8192)


def bucket_length(n: int, buckets=PROMPT_BUCKETS) -> int:
    """Smallest bucket >= n (compile-count control for prompt prefill)."""
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"prompt length {n} exceeds max bucket {buckets[-1]}")


class GenerationResult(NamedTuple):
    frames: jnp.ndarray  # (B, max_frames, K) int32; zero-filled after EOS
    num_frames: jnp.ndarray  # (B,) int32 valid frame count per row


def generate_audio_tokens(
    params: dict,
    args: ModelArgs,
    key: jax.Array,
    prompt_tokens: jnp.ndarray,
    prompt_mask: jnp.ndarray,
    prompt_len: jnp.ndarray,
    max_frames: int,
    temperature: float | jnp.ndarray = 0.9,
    topk: int = 50,
    compute_dtype=jnp.bfloat16,
    kv_dtype=None,
) -> GenerationResult:
    """Generate up to ``max_frames`` 32-codebook frames after the prompt.

    Jittable end-to-end (static: args, max_frames, topk, compute_dtype and
    the prompt bucket shape).

    Args:
        prompt_tokens: (B, S_pad, K+1) right-padded prompt frames.
        prompt_mask: (B, S_pad, K+1) column liveness (False on padding rows).
        prompt_len: (B,) real prompt lengths.
        kv_dtype: cache storage dtype (``jnp.int8`` = quantized KV cache,
            half the decode HBM stream; None = compute_dtype).
    """
    K = args.audio_num_codebooks
    B, S_pad, _ = prompt_tokens.shape
    max_seq_len = S_pad + max_frames

    state = csm.init_frame_state(
        args, B, compute_dtype, max_seq_len=max_seq_len, kv_dtype=kv_dtype
    )

    # Prefill positions: 0..len-1 then PAD_POS on padding rows.
    col = jnp.arange(S_pad, dtype=jnp.int32)
    input_pos = jnp.where(
        col[None, :] < prompt_len[:, None], col[None, :], csm.PAD_POS
    )

    frame0, state = csm.generate_frame(
        params,
        args,
        jax.random.fold_in(key, 0),
        prompt_tokens,
        prompt_mask,
        input_pos,
        state,
        temperature,
        topk,
        compute_dtype,
        last_idx=prompt_len - 1,
    )

    frames_buf = jnp.zeros((B, max_frames, K), jnp.int32)
    done0 = jnp.all(frame0 == 0, axis=1)
    frames_buf = jax.lax.dynamic_update_slice(
        frames_buf,
        jnp.where(done0[:, None], 0, frame0)[:, None, :],
        (0, 0, 0),
    )
    num0 = (~done0).astype(jnp.int32)

    # Frame i consumes frame i-1 as a 1-position 33-column token: audio
    # columns live, text column dead (reference src/csm/generator.py:203-207).
    step_mask = jnp.zeros((B, 1, K + 1), bool).at[:, :, :K].set(True)

    def cond(carry):
        i, _, _, done, _, _ = carry
        return (i < max_frames) & ~jnp.all(done)

    def body(carry):
        i, frame, state, done, frames_buf, num_frames = carry
        step_tokens = jnp.zeros((B, 1, K + 1), jnp.int32).at[:, 0, :K].set(frame)
        # frame i-1 is consumed as the token at position prompt_len + (i-1)
        # (the prompt occupies 0..prompt_len-1)
        pos = (prompt_len[:, None] + i - 1).astype(jnp.int32)  # (B, 1)
        new_frame, state = csm.generate_frame(
            params,
            args,
            jax.random.fold_in(key, i),  # frame written at buffer index i
            step_tokens,
            step_mask,
            pos,
            state,
            temperature,
            topk,
            compute_dtype,
        )
        now_done = done | jnp.all(new_frame == 0, axis=1)
        write = jnp.where(now_done[:, None], 0, new_frame)
        frames_buf = jax.lax.dynamic_update_slice(
            frames_buf, write[:, None, :], (0, i, 0)
        )
        num_frames = num_frames + (~now_done).astype(jnp.int32)
        return i + 1, new_frame, state, now_done, frames_buf, num_frames

    _, _, _, _, frames_buf, num_frames = jax.lax.while_loop(
        cond, body, (jnp.int32(1), frame0, state, done0, frames_buf, num0)
    )
    return GenerationResult(frames=frames_buf, num_frames=num_frames)


_generate_jit = jax.jit(
    generate_audio_tokens,
    static_argnames=("args", "max_frames", "topk", "compute_dtype", "kv_dtype"),
)


def generate_audio_tokens_jit(*args, **kwargs) -> GenerationResult:
    """Cached-jit entry point (one compile per (bucket, max_frames, topk))."""
    return _generate_jit(*args, **kwargs)
