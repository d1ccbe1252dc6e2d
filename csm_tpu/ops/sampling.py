"""Token sampling.

Reproduces the reference's sampler semantics (src/csm/models/model.py:79-96):
temperature scaling → top-k threshold mask (ties at the k-th value are KEPT,
because the mask is ``logits < kth``) → categorical draw via the
exponential-race trick (``argmax(probs / Exp(1))``), which avoids a device
sync in torch and is natively jittable here.

Mathematically ``argmax(probs / q)`` with ``q ~ Exp(1)`` equals
``argmax(log_probs + Gumbel)`` equals ``argmax(masked_logits + Gumbel)``
(log-softmax subtracts a per-row constant), so we sample via Gumbel-max on
the masked logits — one fused VPU pass, no softmax needed.

The optional ``guard_tokens`` reproduces the MLX backend's "MIMI codec
safety" guard that forbids tokens 1..31
(reference: src/csm/mlx/components/sampling.py:57-63,114-134).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Host scalar (NOT jnp): a module-level device array becomes an MLIR constant
# whose value must be fetched device->host at every trace — pathologically
# slow over a tunneled TPU transport.
NEG_INF = np.float32(-1e30)


def topk_mask(logits: jnp.ndarray, topk: int) -> jnp.ndarray:
    """Mask all logits strictly below the k-th largest to -inf.

    Matches torch ``logits < torch.topk(logits, k)[0][..., -1, None]``
    — values tied with the k-th largest survive.
    """
    kth = jax.lax.top_k(logits, topk)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def sample_topk(
    key: jax.Array,
    logits: jnp.ndarray,
    topk: int,
    temperature: float | jnp.ndarray,
    guard_tokens: Optional[Tuple[int, int]] = None,
) -> jnp.ndarray:
    """Sample token ids from top-k filtered, temperature-scaled logits.

    Args:
        key: PRNG key.
        logits: (..., vocab) float logits.
        topk: static int, number of top logits to keep.
        temperature: sampling temperature (>0).
        guard_tokens: optional (lo, hi) inclusive range of token ids to
            forbid (the MLX backend guards (1, 31)).

    Returns:
        (...,) int32 sampled token ids.
    """
    logits = logits.astype(jnp.float32) / temperature
    if guard_tokens is not None:
        lo, hi = guard_tokens
        ids = jnp.arange(logits.shape[-1])
        logits = jnp.where((ids >= lo) & (ids <= hi), NEG_INF, logits)
    masked = topk_mask(logits, topk)
    gumbel = jax.random.gumbel(key, masked.shape, dtype=jnp.float32)
    return jnp.argmax(masked + gumbel, axis=-1).astype(jnp.int32)


def sample_categorical(
    key: jax.Array, logits: jnp.ndarray, temperature: float | jnp.ndarray = 1.0
) -> jnp.ndarray:
    """Plain categorical sampling (reference MLX
    ``mlx_categorical_sampling`` = top-k with k=vocab,
    src/csm/mlx/components/sampling.py:141-167)."""
    logits = logits.astype(jnp.float32) / temperature
    gumbel = jax.random.gumbel(key, logits.shape, dtype=jnp.float32)
    return jnp.argmax(logits + gumbel, axis=-1).astype(jnp.int32)


def topk_probs(logits: jnp.ndarray, topk: int, temperature: float) -> jnp.ndarray:
    """The exact sampling distribution used by ``sample_topk`` — softmax over
    the top-k-masked, temperature-scaled logits.  Used by the token-parity
    analyzer (reference: src/csm/mlx/token_analyzer.py)."""
    masked = topk_mask(logits.astype(jnp.float32) / temperature, topk)
    return jax.nn.softmax(masked, axis=-1)
