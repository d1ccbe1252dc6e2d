"""CSM training losses — semantic + compute-amortized acoustic.

Capability equivalent of the reference ``compute_loss``
(src/csm/training/utils.py:56-119) — but with the acoustic term implemented
for real.  The reference leaves it as a 0.0 placeholder
(src/csm/training/utils.py:109-117); the intended scheme is documented at
docs/reference/sesame_csm/training.md:52-68 (Sesame's "compute
amortization"): the backbone learns codebook-0 on EVERY frame, while the
audio decoder is trained on a random 1/16 subset of frames, teacher-forced
over all 31 acoustic codebooks.

TPU-first design:
  * the whole loss is one jittable function — backbone full-sequence pass,
    loss-masked semantic CE, then a static-size gather of the amortized
    frame subset and ONE batched decoder pass over (n_sub, 32, E) —
    no per-frame Python;
  * frame subsampling uses `jax.lax.top_k` over masked uniform scores, so
    the subset size is static (shapes stay XLA-friendly) while membership
    is uniformly random over valid frames;
  * cross-entropy runs in float32 off bf16 logits.

Batch layout (produced by csm_tpu/data — mirrors the reference contract,
src/csm/data/training_data.py:245-358):
    tokens       (B, T, K+1) int32  interleaved text+audio frames
    tokens_mask  (B, T, K+1) bool   column liveness
    targets      (B, T, K)   int32  audio frame to predict from position t
                                    (i.e. the frame at input position t+1)
    target_mask  (B, T)      bool   True where ``targets`` holds a real frame
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from csm_tpu.models import csm
from csm_tpu.models.config import ModelArgs
from csm_tpu.models.llama import transformer_apply
from csm_tpu.ops.attention import causal_mask_from_positions


class Batch(NamedTuple):
    tokens: jnp.ndarray
    tokens_mask: jnp.ndarray
    targets: jnp.ndarray
    target_mask: jnp.ndarray


def masked_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Mean CE over positions where ``mask`` is True (float32)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(nll * mask) / denom


def _select_amortized_frames(
    key: jax.Array, target_mask: jnp.ndarray, n_sub: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pick ``n_sub`` random valid (b, t) frame indices (static shape).

    Returns (flat_idx (n_sub,), sel_valid (n_sub,)).  When fewer than
    ``n_sub`` frames are valid, the extras carry sel_valid=False.
    """
    flat_valid = target_mask.reshape(-1)
    scores = jax.random.uniform(key, flat_valid.shape)
    scores = jnp.where(flat_valid, scores, -1.0)
    _, flat_idx = jax.lax.top_k(scores, n_sub)
    return flat_idx, flat_valid[flat_idx]


def compute_loss(
    params: dict,
    args: ModelArgs,
    key: jax.Array,
    batch: Batch,
    semantic_weight: float = 100.0,
    acoustic_weight: float = 1.0,
    amortization_ratio: int = 16,
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
    lora: Optional[dict] = None,
    lora_scale: float = 0.0,
    lora_dropout: float = 0.0,
    seq_mesh=None,
    pp_mesh=None,
    pp_microbatches: int = 1,
    ring_layout: str = "auto",
) -> Tuple[jnp.ndarray, dict]:
    """Total training loss + metrics.

    ``seq_mesh`` — optional mesh with a ``seq`` axis: the backbone runs
    sequence-parallel ring attention (csm_tpu/parallel/ring_attention.py)
    so context length scales with the axis size (long-context training
    beyond the reference's 2048 cap; shard the batch's time dim over
    ``seq``).  The short (32-step) decoder stays local.

    ``ring_layout`` — sequence layout for the ring: "zigzag" balances the
    causal work per device (contiguous gives device n-1 ~2x device 0's
    scores), "contiguous" is the plain split, "auto" (default) picks
    zigzag whenever T divides by 2x the seq axis and falls back to
    contiguous otherwise.  Results are identical either way
    (csm_tpu/parallel/ring_attention.py zigzag_perm).

    ``pp_mesh`` — optional mesh with a ``pipe`` axis: the backbone runs
    pipeline-parallel (csm_tpu/parallel/pipeline.py) with its layer stack
    sharded over the stages — the 8B-flavor memory lever.  The decoder /
    embeddings / heads run replicated across stages (they are <5% of the
    8B FLOPs).  Mutually exclusive with ``seq_mesh``.

    total = semantic_weight * CE(codebook-0 over all frames)
          + acoustic_weight * CE(codebooks 1..K-1 over a 1/amortization_ratio
                                 random frame subset, teacher-forced)

    Reference weights: semantic ×100, acoustic ×1
    (src/csm/training/utils.py:61-62, src/csm/cli/train.py semantic/acoustic
    weight flags).
    """
    K = args.audio_num_codebooks
    bb, dec = args.backbone, args.decoder
    B, T, _ = batch.tokens.shape
    k_bb_drop, k_dec_drop, key = jax.random.split(key, 3)
    drop_on = lora is not None and lora_dropout > 0.0

    # ---- backbone over the full sequence ----
    from csm_tpu.ops.flash_attention import use_flash

    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    # tables cast BEFORE the gather: the (B, T, 33, E) gather output is the
    # biggest training activation — bf16 halves it (8B-fits lever)
    h = csm.masked_embed_sum(
        params, args, batch.tokens, batch.tokens_mask, dtype=compute_dtype
    )
    attn_impl = None
    if pp_mesh is not None:
        if seq_mesh is not None:
            raise ValueError("pp_mesh and seq_mesh are mutually exclusive")
        from csm_tpu.parallel.pipeline import pipelined_transformer

        h = pipelined_transformer(
            params["backbone"], bb, h, positions[0], pp_mesh, pp_microbatches,
            lora=None if lora is None else lora.get("backbone"),
            lora_scale=lora_scale, remat=remat,
            lora_dropout_rate=lora_dropout if drop_on else 0.0,
            lora_dropout_key=k_bb_drop if drop_on else None,
        )  # (B, T, E_b)
    else:
        if seq_mesh is not None:
            from csm_tpu.parallel.ring_attention import (
                SEQ_AXIS,
                sharded_ring_attention,
            )

            layout = ring_layout
            if layout == "auto":
                n_seq = seq_mesh.shape[SEQ_AXIS]
                layout = "zigzag" if T % (2 * n_seq) == 0 else "contiguous"
            mask, flash_pos = None, None
            attn_impl = lambda q, k, v: sharded_ring_attention(  # noqa: E731
                seq_mesh, q, k, v, positions, positions[0], layout=layout
            )
        elif use_flash(T):
            mask, flash_pos = None, (positions, positions[0])
        elif T >= 512:
            # non-Pallas backends (CPU meshes, CSM_TPU_NO_FLASH): the
            # flash pattern in pure XLA — O(block*T) scores, not O(T^2)
            from csm_tpu.ops.attention import chunked_gqa_attention

            mask, flash_pos = None, None
            attn_impl = lambda q, k, v: chunked_gqa_attention(  # noqa: E731
                q, k, v, positions, positions[0]
            )
        else:
            mask, flash_pos = causal_mask_from_positions(positions, positions[0]), None
        h, _ = transformer_apply(
            params["backbone"], bb, h, positions, mask, remat=remat,
            lora=None if lora is None else lora.get("backbone"),
            lora_scale=lora_scale,
            flash_pos=flash_pos,
            lora_dropout_rate=lora_dropout if drop_on else 0.0,
            lora_dropout_key=k_bb_drop if drop_on else None,
            attn_impl=attn_impl,
        )  # (B, T, E_b)
    return _loss_from_backbone_out(
        params, args, key, batch, h,
        semantic_weight=semantic_weight,
        acoustic_weight=acoustic_weight,
        amortization_ratio=amortization_ratio,
        compute_dtype=compute_dtype, remat=remat,
        lora=lora, lora_scale=lora_scale,
        drop_on=drop_on, k_dec_drop=k_dec_drop,
        lora_dropout=lora_dropout,
    )


def _loss_from_backbone_out(
    params, args, key, batch, h, *,
    semantic_weight, acoustic_weight, amortization_ratio,
    compute_dtype, remat, lora, lora_scale,
    drop_on, k_dec_drop, lora_dropout,
) -> Tuple[jnp.ndarray, dict]:
    """Semantic CE + amortized acoustic decoder CE, given the backbone's
    (B, T, E_b) output ``h`` (shared by the local / sequence-parallel /
    pipeline-parallel backbone paths)."""
    K = args.audio_num_codebooks
    dec = args.decoder
    B, T, _ = batch.tokens.shape

    # ---- semantic loss: codebook-0 on every frame ----
    c0_logits = h @ params["codebook0_head"]  # (B, T, V)
    semantic_loss = masked_cross_entropy(
        c0_logits, batch.targets[:, :, 0], batch.target_mask
    )

    # ---- acoustic loss: amortized decoder CE ----
    n_sub = max(1, (B * T) // amortization_ratio)
    k_sel, _ = jax.random.split(key)
    flat_idx, sel_valid = _select_amortized_frames(k_sel, batch.target_mask, n_sub)

    h_flat = h.reshape(B * T, -1)[flat_idx]  # (n_sub, E_b)
    tgt_flat = batch.targets.reshape(B * T, K)[flat_idx]  # (n_sub, K)

    # Teacher-forced decoder input: [h_t, embed(c0), ..., embed(c_{K-2})],
    # K positions; output j>=1 predicts codebook j via audio_head[j-1]
    # (mirrors the generate_frame inner loop, src/csm/models/model.py:176-193).
    cb_idx = jnp.arange(K - 1)
    cb_embeds = params["audio_embeddings"].astype(compute_dtype)[
        tgt_flat[:, : K - 1] + cb_idx[None, :] * args.audio_vocab_size
    ]  # (n_sub, K-1, E_b) at compute dtype (table cast before gather)
    dec_in = jnp.concatenate(
        [h_flat[:, None, :].astype(cb_embeds.dtype), cb_embeds], axis=1
    )  # (n_sub, K, E_b)
    dec_in = (dec_in @ params["projection"]).astype(compute_dtype)

    dec_pos = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32), (n_sub, K))
    dec_mask = causal_mask_from_positions(dec_pos, dec_pos[0])
    dh, _ = transformer_apply(
        params["decoder"], dec, dec_in, dec_pos, dec_mask, remat=remat,
        lora=None if lora is None else lora.get("decoder"),
        lora_scale=lora_scale,
        lora_dropout_rate=lora_dropout if drop_on else 0.0,
        lora_dropout_key=k_dec_drop if drop_on else None,
    )  # (n_sub, K, E_d)

    # Logits for codebooks 1..K-1 from decoder positions 1..K-1.
    dec_logits = jnp.einsum(
        "nkd,kdv->nkv", dh[:, 1:, :], params["audio_head"]
    )  # (n_sub, K-1, V)
    acoustic_loss = masked_cross_entropy(
        dec_logits,
        tgt_flat[:, 1:],
        jnp.broadcast_to(sel_valid[:, None], (n_sub, K - 1)),
    )

    total = semantic_weight * semantic_loss + acoustic_weight * acoustic_loss
    metrics = {
        "loss": total,
        "semantic_loss": semantic_loss,
        "acoustic_loss": acoustic_loss,
        "num_target_frames": jnp.sum(batch.target_mask),
        "num_amortized_frames": jnp.sum(sel_valid),
    }
    return total, metrics
