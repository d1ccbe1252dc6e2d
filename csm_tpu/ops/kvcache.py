"""Static-shape KV caches for incremental decoding.

The reference relies on torchtune's in-place KV caches
(src/csm/models/model.py:128-138: backbone cache len 2048, decoder cache
truncated to 32 slots, reset every frame).  Under XLA everything is
functional: the cache is a pytree carried through ``lax.scan`` /
``lax.while_loop`` and updated with ``dynamic_update_slice`` — XLA turns
this into an in-place donation on TPU.

Layout: (num_layers, batch, max_seq, num_kv_heads, head_dim).  Sequence on
the second-to-last-but-one axis keeps the per-step update a contiguous
lane-aligned slice write.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from csm_tpu.models.config import TransformerConfig


class KVCache(NamedTuple):
    k: jnp.ndarray  # (L, B, S, Hkv, D)
    v: jnp.ndarray  # (L, B, S, Hkv, D)

    @property
    def max_seq_len(self) -> int:
        return self.k.shape[2]


def init_kv_cache(
    cfg: TransformerConfig,
    batch_size: int,
    dtype=jnp.bfloat16,
    max_seq_len: int | None = None,
) -> KVCache:
    """Allocate an all-zero cache.

    ``max_seq_len`` overrides the config length (the reference truncates the
    audio-decoder cache to ``audio_num_codebooks`` slots,
    src/csm/models/model.py:135).
    """
    seq = max_seq_len if max_seq_len is not None else cfg.max_seq_len
    shape = (cfg.num_layers, batch_size, seq, cfg.num_kv_heads, cfg.head_dim)
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def reset_kv_cache(cache: KVCache) -> KVCache:
    """Zero the cache (reference ``reset_caches``,
    src/csm/models/model.py:197-200)."""
    return KVCache(jnp.zeros_like(cache.k), jnp.zeros_like(cache.v))


def update_layer(
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    k_new: jnp.ndarray,
    v_new: jnp.ndarray,
    offset: jnp.ndarray,
):
    """Write (B, S, Hkv, D) new keys/values into one layer's
    (B, Smax, Hkv, D) cache.

    ``offset`` — scalar (all rows share the write start: prefill / the
    single-utterance loop) or (B,) per-row starts (multi-slot serving,
    where each slot fills its row independently).  Per-row writes require
    S == 1 (the decode step) and lower to a row-indexed scatter.
    """
    offset = offset.astype(jnp.int32)
    if offset.ndim == 1:  # per-row decode write
        assert k_new.shape[1] == 1, "per-row cache offsets require S == 1"
        B = k_cache.shape[0]
        rows = jnp.arange(B)
        k_cache = k_cache.at[rows, offset].set(k_new[:, 0].astype(k_cache.dtype))
        v_cache = v_cache.at[rows, offset].set(v_new[:, 0].astype(v_cache.dtype))
        return k_cache, v_cache
    zero = jnp.zeros((), dtype=jnp.int32)
    start = (zero, offset, zero, zero)
    k_cache = jax.lax.dynamic_update_slice(k_cache, k_new.astype(k_cache.dtype), start)
    v_cache = jax.lax.dynamic_update_slice(v_cache, v_new.astype(v_cache.dtype), start)
    return k_cache, v_cache
