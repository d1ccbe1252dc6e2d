"""Split residual vector quantizer for the Mimi codec.

1 semantic + 31 acoustic codebooks, each 2048 entries × 256 dims, with
1×1-conv input/output projections between the 512-d latent and the 256-d
VQ space (docs/reference/sesame_csm/components.md:55-86).

Codebooks are stored as ``embed_sum`` / ``cluster_usage`` (the EMA-training
parameterization the public checkpoints ship); the effective embedding is
``embed_sum / max(cluster_usage, eps)``.

TPU notes: nearest-codebook search is one (B*T, 256) @ (256, 2048) matmul
per quantizer (argmin of squared L2 == argmax of ``2x·e - ||e||²``) — MXU
work, no gather loops.  Encode scans over the residual chain; decode is a
batched embedding-lookup sum.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

EPS = 1e-5


class RVQParams(NamedTuple):
    input_proj: jnp.ndarray  # (hidden, vq_dim)   x @ W
    output_proj: jnp.ndarray  # (vq_dim, hidden)
    embed_sum: jnp.ndarray  # (Q, codebook_size, vq_dim)
    cluster_usage: jnp.ndarray  # (Q, codebook_size)


def codebook_embeddings(p: RVQParams) -> jnp.ndarray:
    """(Q, codebook_size, vq_dim) effective embeddings."""
    usage = jnp.maximum(p.cluster_usage, EPS)[..., None]
    return p.embed_sum / usage


def rvq_encode(p: RVQParams, x: jnp.ndarray) -> jnp.ndarray:
    """Encode latents to codes.

    Args:
        x: (B, T, hidden) latents.
    Returns:
        (B, Q, T) int32 codes.
    """
    embeds = codebook_embeddings(p).astype(jnp.float32)  # (Q, C, D)
    residual = (x @ p.input_proj).astype(jnp.float32)  # (B, T, D)

    def step(residual, layer):
        embed = layer  # (C, D)
        # argmin ||r - e||^2 = argmax (2 r·e - ||e||^2)
        scores = 2.0 * (residual @ embed.T) - jnp.sum(embed**2, axis=-1)
        idx = jnp.argmax(scores, axis=-1)  # (B, T)
        quantized = embed[idx]
        return residual - quantized, idx

    _, codes = jax.lax.scan(step, residual, embeds)
    return jnp.transpose(codes, (1, 0, 2)).astype(jnp.int32)  # (B, Q, T)


def rvq_decode(p: RVQParams, codes: jnp.ndarray) -> jnp.ndarray:
    """Decode codes to latents.

    Args:
        codes: (B, Q, T) int codes (Q may be < num codebooks).
    Returns:
        (B, T, hidden) latents.
    """
    embeds = codebook_embeddings(p)  # (Qmax, C, D)
    Q = codes.shape[1]
    # gather each quantizer's embedding and sum over Q
    per_q = jax.vmap(lambda e, c: e[c], in_axes=(0, 1), out_axes=1)(
        embeds[:Q], codes
    )  # (B, Q, T, D)
    summed = jnp.sum(per_q, axis=1)  # (B, T, D)
    return summed @ p.output_proj


class SplitRVQParams(NamedTuple):
    semantic: RVQParams  # Q = 1
    acoustic: RVQParams  # Q = 31


def split_rvq_encode(
    p: SplitRVQParams, x: jnp.ndarray, num_quantizers: int | None = None
) -> jnp.ndarray:
    """(B, T, hidden) → (B, K, T) codes; codebook 0 is semantic."""
    sem = rvq_encode(p.semantic, x)
    if num_quantizers == 1:
        return sem
    ac = rvq_encode(p.acoustic, x)
    if num_quantizers is not None:
        ac = ac[:, : num_quantizers - 1]
    return jnp.concatenate([sem, ac], axis=1)


def split_rvq_decode(p: SplitRVQParams, codes: jnp.ndarray) -> jnp.ndarray:
    """(B, K, T) codes → (B, T, hidden) latents."""
    out = rvq_decode(p.semantic, codes[:, :1])
    if codes.shape[1] > 1:
        out = out + rvq_decode(p.acoustic, codes[:, 1:])
    return out
