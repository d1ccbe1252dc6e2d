"""Rotary position embeddings with Llama-3.x frequency scaling.

The reference backbone/decoder use torchtune's ``llama3_2`` factories with
``rope_base=500_000, scale_factor=32`` (reference: src/csm/models/model.py:11-42).
torchtune's Llama3ScaledRoPE rescales the per-dimension frequencies exactly as
Llama 3.1 does (low/high frequency wavelength bands); we reproduce those
semantics here.

Convention note: torchtune applies RoPE to *interleaved* (even, odd) pairs of
the head dimension.  On TPU we use the half-split ("rotate_half") convention —
contiguous halves vectorize better on the VPU (no strided gathers) — and the
checkpoint converter permutes q/k projection rows at import time so the two
conventions compute identical attention scores (see
``csm_tpu.utils.checkpoint_compat.interleaved_to_half_perm``).
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np

from csm_tpu.models.config import TransformerConfig


def scaled_rope_freqs(
    head_dim: int,
    rope_base: float = 500_000.0,
    scale_factor: float = 32.0,
    low_freq_factor: float = 1.0,
    high_freq_factor: float = 4.0,
    old_context_len: int = 8192,
) -> np.ndarray:
    """Per-pair inverse frequencies with Llama-3.1 band scaling.

    Returns float64 numpy of shape (head_dim // 2,) — computed on host at
    trace time, constant-folded by XLA.
    """
    exponents = np.arange(0, head_dim, 2, dtype=np.float64) / head_dim
    freqs = 1.0 / (rope_base**exponents)

    low_freq_wavelen = old_context_len / low_freq_factor
    high_freq_wavelen = old_context_len / high_freq_factor
    wavelen = 2.0 * math.pi / freqs

    # Three bands: high-frequency kept, low-frequency fully scaled,
    # middle band smoothly interpolated.
    smooth = (old_context_len / wavelen - low_freq_factor) / (
        high_freq_factor - low_freq_factor
    )
    scaled = np.where(
        wavelen < high_freq_wavelen,
        freqs,
        np.where(
            wavelen > low_freq_wavelen,
            freqs / scale_factor,
            (1.0 - smooth) * freqs / scale_factor + smooth * freqs,
        ),
    )
    return scaled


@functools.lru_cache(maxsize=16)
def _rope_tables(
    head_dim: int,
    max_seq_len: int,
    rope_base: float,
    scale_factor: float,
    low_freq_factor: float,
    high_freq_factor: float,
    old_context_len: int,
):
    """Precomputed (cos, sin) tables, shape (max_seq_len, head_dim // 2).

    Cached as HOST numpy arrays — caching jnp arrays would leak tracers when
    the first call happens under jit (the cached constant would belong to
    that trace).  ``jnp.asarray`` at the use site turns them into per-trace
    constants XLA folds away.
    """
    freqs = scaled_rope_freqs(
        head_dim,
        rope_base,
        scale_factor,
        low_freq_factor,
        high_freq_factor,
        old_context_len,
    )
    t = np.arange(max_seq_len, dtype=np.float64)
    angles = np.outer(t, freqs)  # (T, D/2)
    return (
        np.cos(angles).astype(np.float32),
        np.sin(angles).astype(np.float32),
    )


def rope_tables(cfg: TransformerConfig):
    return _rope_tables(
        cfg.head_dim,
        cfg.max_seq_len,
        cfg.rope_base,
        cfg.rope_scale_factor,
        cfg.rope_low_freq_factor,
        cfg.rope_high_freq_factor,
        cfg.rope_old_context_len,
    )


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Apply rotary embedding in the half-split convention.

    Args:
        x: (..., seq, num_heads, head_dim)
        cos/sin: (seq, head_dim//2) or (batch, seq, head_dim//2) position
            tables — a heads axis is inserted here so they broadcast against
            x's (..., seq, num_heads, head_dim//2).

    Returns same shape/dtype as x (rotation computed in float32).
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    half = xf.shape[-1] // 2
    x1, x2 = xf[..., :half], xf[..., half:]
    cos = jnp.expand_dims(cos, -2)  # broadcast over heads
    sin = jnp.expand_dims(sin, -2)
    out1 = x1 * cos - x2 * sin
    out2 = x2 * cos + x1 * sin
    return jnp.concatenate([out1, out2], axis=-1).astype(dtype)


def rope_at_positions(cfg: TransformerConfig, positions: jnp.ndarray):
    """Gather (cos, sin) at integer positions.

    Args:
        positions: (seq,) or (batch, seq) int32 positions.

    Returns (cos, sin) with shape positions.shape + (head_dim // 2,).
    """
    cos, sin = rope_tables(cfg)
    return jnp.asarray(cos)[positions], jnp.asarray(sin)[positions]
