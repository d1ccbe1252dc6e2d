"""Grouped-query attention.

XLA path: a single fused einsum chain with f32 accumulation — XLA already
fuses scale+mask+softmax into the matmuls on TPU.  The Pallas flash-attention
kernel (csm_tpu/ops/flash_attention.py) is used for long-sequence training /
prefill; this path is the correctness oracle and the decode (S=1) path, where
attention is HBM-bandwidth-bound on the KV cache and XLA's codegen is already
near roofline.

Equivalent of the reference's torchtune attention
(src/csm/models/model.py:11-42) and MLX ``mlx_attention``
(src/csm/mlx/mlx_ops.py:286-359).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Host scalar (NOT jnp): a module-level device array becomes an MLIR constant
# whose value must be fetched device->host at every trace — pathologically
# slow over a tunneled TPU transport.
NEG_INF = np.float32(-1e30)


def gqa_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Grouped-query scaled-dot-product attention.

    Args:
        q: (B, S, Hq, D) queries.
        k: (B, T, Hkv, D) keys (Hq % Hkv == 0).
        v: (B, T, Hkv, D) values.
        mask: (B, S, T) or (1, S, T) boolean; True = attend.

    Returns:
        (B, S, Hq, D) in q.dtype.
    """
    B, S, Hq, D = q.shape
    T, Hkv = k.shape[1], k.shape[2]
    G = Hq // Hkv

    qf = q.reshape(B, S, Hkv, G, D).astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    scale = 1.0 / jnp.sqrt(jnp.float32(D))
    scores = jnp.einsum("bskgd,btkd->bskgt", qf * scale, kf)
    scores = jnp.where(mask[:, :, None, None, :], scores, NEG_INF)
    probs = jnp.exp(scores - jnp.max(scores, axis=-1, keepdims=True))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jnp.einsum("bskgt,btkd->bskgd", probs, vf)
    return out.reshape(B, S, Hq, D).astype(q.dtype)


def chunked_gqa_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_pos: jnp.ndarray,
    kv_pos: jnp.ndarray,
    block_q: int = 256,
) -> jnp.ndarray:
    """Flash-pattern attention in pure XLA: scan over query blocks.

    Peak memory is O(block_q * T) scores per block instead of O(S * T) —
    the non-Pallas training fallback (CPU meshes, ``CSM_TPU_NO_FLASH``).
    ``jax.checkpoint`` on the block body keeps the backward at the same
    O(block_q * T): scores are recomputed per block, never stacked.

    Numerically identical to ``gqa_attention`` with
    ``causal_mask_from_positions(q_pos, kv_pos)`` (same ops, blockwise).
    """
    B, S, Hq, D = q.shape
    if kv_pos.ndim == 1:
        kv_pos = jnp.broadcast_to(kv_pos[None, :], (B, kv_pos.shape[0]))
    BQ = min(block_q, S)
    pad = (-S) % BQ
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        # padded rows attend nothing (finite NEG_INF keeps them NaN-free);
        # their outputs are sliced away below
        q_pos = jnp.pad(q_pos, ((0, 0), (0, pad)), constant_values=-1)
    n = (S + pad) // BQ

    qb = q.reshape(B, n, BQ, Hq, D).transpose(1, 0, 2, 3, 4)
    pb = q_pos.reshape(B, n, BQ).transpose(1, 0, 2)

    @jax.checkpoint
    def body(carry, x):
        qi, pi = x
        mask = kv_pos[:, None, :] <= pi[:, :, None]
        return carry, gqa_attention(qi, k, v, mask)

    _, ob = jax.lax.scan(body, None, (qb, pb))
    out = ob.transpose(1, 0, 2, 3, 4).reshape(B, S + pad, Hq, D)
    return out[:, :S]


def causal_mask_from_positions(
    q_pos: jnp.ndarray, kv_pos: jnp.ndarray
) -> jnp.ndarray:
    """mask[b, i, j] = kv_pos[b, j] <= q_pos[b, i].

    This is the reference's ``_index_causal_mask`` of a tril buffer
    (src/csm/models/model.py:59-76) without materializing the
    (max_seq, max_seq) table.  Padding slots carry a large sentinel
    position (csm_tpu.models.csm.PAD_POS) and are therefore never
    attended by any real query.

    Args:
        q_pos: (B, S) int query positions.
        kv_pos: (T,) or (B, T) int key positions.
    """
    if kv_pos.ndim == 1:
        kv_pos = kv_pos[None, :]
    return kv_pos[:, None, :] <= q_pos[:, :, None]
