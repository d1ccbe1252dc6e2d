"""Token sampling.

Reproduces the reference's sampler semantics (src/csm/models/model.py:79-96):
temperature scaling → top-k threshold → categorical draw over the kept
set.  The reference implements the draw as an exponential race
(``argmax(probs / Exp(1))``, i.e. Gumbel-max) to avoid a device sync in
torch; here the draw is inverse-CDF over the top-k values with ONE
uniform per row — the same distribution with ~vocab/k times less RNG
and reduction work per call (this runs 32× per generated frame inside
the decoder scan; see BENCHMARKS.md).  ``topk_mask``/``topk_probs`` keep
the reference's keep-ties mask semantics for analysis parity.

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
    # Inverse-CDF over the top-k VALUES: one uniform per row instead of a
    # (…, vocab) Gumbel field + argmax — the per-step sampling cost in the
    # 31-iteration decoder scan is RNG/VPU work that scales with
    # batch×vocab, and softmax/cumsum over k=50 values is ~40× less of
    # it.  Distribution is identical to softmax over the top-k-masked
    # logits (the reference's semantics) up to ties at the k-th value:
    # the mask form keeps all tied tokens, top_k keeps exactly k — a
    # measure-zero event for continuous logits (the torch reference's
    # own topk makes the same arbitrary tie choice).
    vals, idx = jax.lax.top_k(logits, topk)  # (…, k) sorted desc
    p = jax.nn.softmax(vals, axis=-1)
    c = jnp.cumsum(p, axis=-1)
    u = jax.random.uniform(key, logits.shape[:-1] + (1,), dtype=jnp.float32)
    j = jnp.minimum(jnp.sum(c < u, axis=-1), topk - 1)  # searchsorted
    return jnp.take_along_axis(idx, j[..., None], axis=-1)[..., 0].astype(
        jnp.int32
    )


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
