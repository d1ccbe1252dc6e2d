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

int8 KV (``QuantKV``): K/V quantize at WRITE time with one symmetric
scale per (batch, position, kv-head) row over head_dim, and dequantize at
the attention load — the convert+scale fuses into the attention matmul's
operand read exactly like the int8 weight-only path
(csm_tpu/utils/quantize.py), so decode streams int8 bytes from HBM.  At
decode (S=1) attention is bandwidth-bound on the cache, so this halves
the dominant HBM stream AND doubles slot capacity per GiB.
"""

from __future__ import annotations

from typing import NamedTuple, Union

import jax
import jax.numpy as jnp

from csm_tpu.models.config import TransformerConfig


class QuantKV(NamedTuple):
    """int8-quantized half of a KV cache (keys OR values).

    q: int8, same shape as the float cache (L?, B, S, Hkv, D)
    s: float32 per-row scale (L?, B, S, Hkv, 1) — symmetric, absmax/127
    """

    q: jnp.ndarray
    s: jnp.ndarray


KVHalf = Union[jnp.ndarray, QuantKV]


class KVCache(NamedTuple):
    k: KVHalf  # (L, B, S, Hkv, D) array, or QuantKV of the same shape
    v: KVHalf

    @property
    def max_seq_len(self) -> int:
        leaf = self.k.q if isinstance(self.k, QuantKV) else self.k
        return leaf.shape[2]


def quantize_kv_rows(x: jnp.ndarray) -> QuantKV:
    """Symmetric int8 per (…, row) over the last (head_dim) axis."""
    m = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    s = jnp.maximum(m / 127.0, 1e-8)
    q = jnp.round(x.astype(jnp.float32) / s).astype(jnp.int8)
    return QuantKV(q, s)


def dequantize_kv(c: KVHalf, dtype) -> jnp.ndarray:
    """QuantKV → dense at ``dtype`` (int8 bytes stream from HBM; the
    convert+scale fuses into the consumer matmul).  Pass-through for a
    plain array."""
    if isinstance(c, QuantKV):
        return (c.q.astype(jnp.float32) * c.s).astype(dtype)
    return c


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

    ``dtype=jnp.int8`` allocates a quantized cache (QuantKV halves):
    int8 codes + f32 per-row scales, written via ``update_layer`` which
    quantizes incoming K/V rows in-program.
    """
    seq = max_seq_len if max_seq_len is not None else cfg.max_seq_len
    shape = (cfg.num_layers, batch_size, seq, cfg.num_kv_heads, cfg.head_dim)
    if dtype == jnp.int8:
        def half():
            return QuantKV(
                jnp.zeros(shape, jnp.int8),
                jnp.zeros(shape[:-1] + (1,), jnp.float32),
            )

        return KVCache(half(), half())
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def reset_kv_cache(cache: KVCache) -> KVCache:
    """Zero the cache (reference ``reset_caches``,
    src/csm/models/model.py:197-200)."""
    return jax.tree.map(jnp.zeros_like, cache)


def _write_rows(cache: jnp.ndarray, new: jnp.ndarray, offset: jnp.ndarray):
    """Write (B, S, ...) into (B, Smax, ...) at scalar or (B,) offset."""
    if offset.ndim == 1:  # per-row decode write
        B = cache.shape[0]
        rows = jnp.arange(B)
        return cache.at[rows, offset].set(new[:, 0].astype(cache.dtype))
    zero = jnp.zeros((), dtype=jnp.int32)
    start = (zero, offset) + (zero,) * (cache.ndim - 2)
    return jax.lax.dynamic_update_slice(cache, new.astype(cache.dtype), start)


def update_layer(
    k_cache: KVHalf,
    v_cache: KVHalf,
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

    Quantized caches (QuantKV) quantize the incoming rows here — the
    cache never holds float K/V.
    """
    offset = offset.astype(jnp.int32)
    if offset.ndim == 1:
        assert k_new.shape[1] == 1, "per-row cache offsets require S == 1"
    if isinstance(k_cache, QuantKV):
        qk, qv = quantize_kv_rows(k_new), quantize_kv_rows(v_new)
        k_cache = QuantKV(
            _write_rows(k_cache.q, qk.q, offset),
            _write_rows(k_cache.s, qk.s, offset),
        )
        v_cache = QuantKV(
            _write_rows(v_cache.q, qv.q, offset),
            _write_rows(v_cache.s, qv.s, offset),
        )
        return k_cache, v_cache
    return (
        _write_rows(k_cache, k_new, offset),
        _write_rows(v_cache, v_new, offset),
    )
