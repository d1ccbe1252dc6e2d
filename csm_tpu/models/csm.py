"""CSM dual-transformer model — TPU-native core.

Capability equivalent of the reference ``Model``
(src/csm/models/model.py:110-216): a Llama-3.2-1B backbone consuming
interleaved text+audio token frames and predicting the semantic (codebook-0)
Mimi token per 80 ms frame, plus a Llama-3.2-100M decoder autoregressively
filling the remaining 31 acoustic codebooks.

TPU-first design decisions:
  * ``generate_frame`` is ONE jitted function: backbone incremental step,
    codebook-0 sample, and the 31-step decoder inner loop as a
    ``jax.lax.scan`` with a fresh 32-slot decoder KV cache per frame — the
    reference drives this loop from Python per frame
    (src/csm/models/model.py:182-193);
  * the decoder cache "reset every frame" (reference :181) is a zeros init
    inside the traced function — no host round-trip;
  * embeddings use codebook-offset addressing into one
    (audio_vocab * num_codebooks, E) table, exactly the reference scheme
    (src/csm/models/model.py:202-215);
  * all sampling is fused in (csm_tpu/ops/sampling.py — exponential-race
    semantics preserved).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from csm_tpu.models.config import ModelArgs
from csm_tpu.models.llama import transformer_apply, transformer_init
from csm_tpu.ops.attention import causal_mask_from_positions
from csm_tpu.ops.kvcache import KVCache, init_kv_cache
from csm_tpu.ops.sampling import sample_topk


def init_csm_params(key: jax.Array, args: ModelArgs, dtype=jnp.float32) -> dict:
    """Initialize the full CSM parameter tree.

    Layout (reference: src/csm/models/model.py:118-126):
        backbone / decoder: layer-stacked transformer trees,
        text_embeddings  (text_vocab, E_b),
        audio_embeddings (audio_vocab * K, E_b),
        projection       (E_b, E_d)           [stored (in, out)],
        codebook0_head   (E_b, audio_vocab)   [stored (in, out)],
        audio_head       (K-1, E_d, audio_vocab).
    """
    bb, dec = args.backbone, args.decoder
    kb, kd, k1, k2, k3, k4, k5 = jax.random.split(key, 7)

    def init(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) / jnp.sqrt(fan_in)).astype(
            dtype
        )

    return {
        "backbone": transformer_init(kb, bb, dtype),
        "decoder": transformer_init(kd, dec, dtype),
        "text_embeddings": init(k1, (args.text_vocab_size, bb.embed_dim), bb.embed_dim),
        "audio_embeddings": init(
            k2,
            (args.audio_vocab_size * args.audio_num_codebooks, bb.embed_dim),
            bb.embed_dim,
        ),
        "projection": init(k3, (bb.embed_dim, dec.embed_dim), bb.embed_dim),
        "codebook0_head": init(k4, (bb.embed_dim, args.audio_vocab_size), bb.embed_dim),
        "audio_head": init(
            k5,
            (args.audio_num_codebooks - 1, dec.embed_dim, args.audio_vocab_size),
            dec.embed_dim,
        ),
    }


def fuse_csm_params(params: dict) -> dict:
    """Fuse backbone+decoder qkv / gate-up projections for decode.

    Single-device inference layout (csm_tpu/models/llama.fuse_projections):
    same bytes through fewer, larger HBM streams — measured +6% on the
    decode projection scan (scripts/bench_qkv_fusion.py).  Not for meshes
    (TP shards q/k/v head groups separately) or unmerged-LoRA params.
    Idempotent on already-fused trees.
    """
    from csm_tpu.models.llama import fuse_projections

    out = dict(params)
    for comp in ("backbone", "decoder"):
        if "wqkv" not in params[comp]:
            out[comp] = fuse_projections(params[comp])
    return out


def embed_audio(
    params: dict, args: ModelArgs, codebook: jnp.ndarray | int, tokens: jnp.ndarray
) -> jnp.ndarray:
    """Embed audio tokens for one codebook with offset addressing
    (reference: src/csm/models/model.py:202-204)."""
    return params["audio_embeddings"][tokens + codebook * args.audio_vocab_size]


def embed_tokens(
    params: dict, args: ModelArgs, tokens: jnp.ndarray, dtype=None
) -> jnp.ndarray:
    """Embed a (B, S, K+1) token frame → (B, S, K+1, E)
    (reference: src/csm/models/model.py:206-216).

    Column layout: 0..K-1 audio codebooks, K = text.

    ``dtype`` — cast the embedding TABLES before the gather, so the big
    (B, S, K+1, E) gather output materializes at the compute dtype (half
    the bytes for bf16 training) instead of the f32 master dtype.
    """
    K = args.audio_num_codebooks
    text_table = params["text_embeddings"]
    audio_table = params["audio_embeddings"]
    if dtype is not None:
        text_table = text_table.astype(dtype)
        audio_table = audio_table.astype(dtype)
    text_embeds = text_table[tokens[:, :, -1]][:, :, None, :]
    offsets = args.audio_vocab_size * jnp.arange(K, dtype=tokens.dtype)
    audio_embeds = audio_table[tokens[:, :, :K] + offsets]
    return jnp.concatenate([audio_embeds, text_embeds], axis=-2)


def masked_embed_sum(
    params: dict,
    args: ModelArgs,
    tokens: jnp.ndarray,
    tokens_mask: jnp.ndarray,
    dtype=None,
) -> jnp.ndarray:
    """Embed + mask + sum over the frame columns → (B, S, E)
    (reference: src/csm/models/model.py:166-168)."""
    embeds = embed_tokens(params, args, tokens, dtype=dtype)
    return jnp.sum(embeds * tokens_mask[..., None].astype(embeds.dtype), axis=2)


# Sentinel position for unwritten / padding cache slots: larger than any real
# query position, so `kv_pos <= q_pos` (the causal mask) is always False.
# Host scalar (NOT jnp): a module-level device array becomes an MLIR constant
# whose value must be fetched device->host at every trace — pathologically
# slow over a tunneled TPU transport.
PAD_POS = np.int32(1 << 28)


class FrameState(NamedTuple):
    """Decode-loop carry: backbone KV cache, fill offset, per-slot positions.

    ``kv_pos`` (B, max_seq) holds the absolute position written into each
    cache slot (PAD_POS for unwritten/padding slots) — this is what lets
    right-padded bucketed prompts coexist with a static-shape cache: padded
    slots are written but carry PAD_POS and are never attended.

    ``offset`` is scalar (single-utterance generation: all rows fill in
    lockstep) or (B,) per-row (multi-slot serving: each slot's row fills
    independently and resets when a new request is admitted).
    """

    cache: KVCache
    offset: jnp.ndarray  # scalar or (B,) int32: cache columns written
    kv_pos: jnp.ndarray  # (B, max_seq) int32


def init_frame_state(
    args: ModelArgs,
    batch_size: int,
    dtype=jnp.bfloat16,
    max_seq_len: int | None = None,
    kv_dtype=None,
) -> FrameState:
    """``kv_dtype`` — cache storage dtype override (``jnp.int8`` for a
    quantized cache, csm_tpu/ops/kvcache.py); defaults to ``dtype``."""
    cache = init_kv_cache(
        args.backbone, batch_size, kv_dtype or dtype, max_seq_len
    )
    return FrameState(
        cache=cache,
        offset=jnp.zeros((), jnp.int32),
        kv_pos=jnp.full((batch_size, cache.max_seq_len), PAD_POS, jnp.int32),
    )


def generate_frame(
    params: dict,
    args: ModelArgs,
    key: jax.Array,
    tokens: jnp.ndarray,
    tokens_mask: jnp.ndarray,
    input_pos: jnp.ndarray,
    state: FrameState,
    temperature: float | jnp.ndarray,
    topk: int,
    compute_dtype=jnp.bfloat16,
    last_idx: Optional[jnp.ndarray] = None,
    lora: Optional[dict] = None,
    lora_ids: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, FrameState]:
    """Generate one 32-codebook audio frame (jittable).

    ``lora``/``lora_ids`` — optional ADAPTER BANK for multi-LoRA serving
    ({"backbone": tree|None, "decoder": tree|None}, trees layer-stacked
    (L, A, ...) with scaling folded into b — training/lora.fuse_lora_bank)
    plus per-row adapter ids (B,) int32; id 0 is the zero adapter (base
    model).  The reference can only serve ONE fine-tune per process; a
    bank serves every speaker's adapter from one batched server.

    Equivalent of the reference ``Model.generate_frame``
    (src/csm/models/model.py:140-195) with the 31-iteration decoder loop
    compiled to ``lax.scan``.

    Args:
        tokens/tokens_mask: (B, S, K+1) current input frame(s).
        input_pos: (B, S) absolute positions (RoPE + causal mask).  Padding
            rows (right-padded bucketed prompts) must carry PAD_POS.
        state: backbone cache + write offset (new tokens are written at
            ``state.offset``; callers keep input_pos == offset..offset+S).
        temperature/topk: sampling params (topk static).
        last_idx: (B,) index of the last REAL prompt row within ``tokens``
            (None → S-1, the decode-step case).

    Returns:
        ((B, K) int32 sampled codes, updated FrameState)
    """
    K = args.audio_num_codebooks
    bb, dec = args.backbone, args.decoder
    B, S, _ = tokens.shape

    keys = jax.random.split(key, K)

    # ---- backbone incremental step ----
    h = masked_embed_sum(params, args, tokens, tokens_mask).astype(compute_dtype)
    if state.offset.ndim == 1:  # per-row offsets (serving): S must be 1
        new_kv_pos = state.kv_pos.at[jnp.arange(B), state.offset].set(
            input_pos[:, 0].astype(jnp.int32)
        )
    else:
        new_kv_pos = jax.lax.dynamic_update_slice(
            state.kv_pos,
            input_pos.astype(jnp.int32),
            (jnp.zeros((), jnp.int32), state.offset),
        )
    # Long prefill uses the Pallas flash kernel (no (S, T) mask/score
    # materialization); decode steps (S=1) and short prefill stay on XLA.
    from csm_tpu.ops.flash_attention import use_flash

    if use_flash(S):
        bb_mask, flash_pos = None, (input_pos, new_kv_pos)
    else:
        bb_mask, flash_pos = causal_mask_from_positions(input_pos, new_kv_pos), None
    bb_lora = lora.get("backbone") if lora else None
    dec_lora = lora.get("decoder") if lora else None
    # bank scaling is folded into b (fuse_lora_bank), so scale = 1
    h, new_cache = transformer_apply(
        params["backbone"], bb, h, input_pos, bb_mask, state.cache, state.offset,
        flash_pos=flash_pos, lora=bb_lora, lora_ids=lora_ids, lora_scale=1.0,
    )
    new_state = FrameState(new_cache, state.offset + S, new_kv_pos)

    if last_idx is None:
        last_h = h[:, -1, :]  # (B, E_b)
    else:
        last_h = h[jnp.arange(B), last_idx, :]

    # ---- codebook 0 from the backbone head ----
    c0_logits = last_h @ params["codebook0_head"]
    c0_sample = sample_topk(keys[0], c0_logits, topk, temperature)  # (B,)
    c0_embed = embed_audio(params, args, 0, c0_sample).astype(compute_dtype)  # (B, E_b)

    # ---- decoder: fresh 32-slot cache per frame (reference :135,:181) ----
    dec_cache = init_kv_cache(dec, B, compute_dtype, max_seq_len=K)
    dec_kv_pos = jnp.arange(K)

    # First decoder call consumes [last_h, c0_embed] at positions (0, 1).
    curr_h = jnp.stack([last_h, c0_embed], axis=1)  # (B, 2, E_b)
    proj_h = (curr_h @ params["projection"]).astype(compute_dtype)
    pos01 = jnp.broadcast_to(jnp.arange(2), (B, 2))
    dec_mask = causal_mask_from_positions(pos01, dec_kv_pos)
    dec_h, dec_cache = transformer_apply(
        params["decoder"], dec, proj_h, pos01, dec_mask, dec_cache,
        jnp.zeros((), jnp.int32), lora=dec_lora, lora_ids=lora_ids,
        lora_scale=1.0,
    )
    c1_logits = (dec_h[:, -1, :] @ params["audio_head"][0]).astype(jnp.float32)
    c1_sample = sample_topk(keys[1], c1_logits, topk, temperature)

    if K == 2:
        return jnp.stack([c0_sample, c1_sample], axis=1), new_state

    # ---- codebooks 2..K-1: scanned single-position decoder steps ----
    def body(carry, xs):
        dec_cache, prev_sample, prev_cb = carry
        i, head, k_i = xs  # i = decoder position; head predicts codebook i
        ci_embed = embed_audio(params, args, prev_cb, prev_sample)[:, None, :]
        proj = (ci_embed @ params["projection"]).astype(compute_dtype)
        pos = jnp.broadcast_to(i[None, None], (B, 1))
        mask = causal_mask_from_positions(pos, dec_kv_pos)
        dh, dec_cache = transformer_apply(
            params["decoder"], dec, proj, pos, mask, dec_cache, i,
            lora=dec_lora, lora_ids=lora_ids, lora_scale=1.0,
        )
        logits = (dh[:, -1, :] @ head).astype(jnp.float32)
        sample = sample_topk(k_i, logits, topk, temperature)
        return (dec_cache, sample, prev_cb + 1), sample

    idxs = jnp.arange(2, K, dtype=jnp.int32)
    heads = params["audio_head"][1:]  # (K-2, E_d, V)
    (_, _, _), samples = jax.lax.scan(
        body, (dec_cache, c1_sample, jnp.int32(1)), (idxs, heads, keys[2:])
    )
    # samples: (K-2, B) -> (B, K-2)
    frame = jnp.concatenate(
        [c0_sample[:, None], c1_sample[:, None], samples.T], axis=1
    )
    return frame.astype(jnp.int32), new_state


def backbone_forward(
    params: dict,
    args: ModelArgs,
    tokens: jnp.ndarray,
    tokens_mask: jnp.ndarray,
    positions: Optional[jnp.ndarray] = None,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Full-sequence (non-cached) backbone pass for training
    (reference: src/csm/training/utils.py:56-107).

    Returns (B, S, E_b) hidden states.
    """
    B, S, _ = tokens.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    h = masked_embed_sum(params, args, tokens, tokens_mask).astype(compute_dtype)
    mask = causal_mask_from_positions(positions, positions[0])
    h, _ = transformer_apply(params["backbone"], args.backbone, h, positions, mask)
    return h
