"""Normalization layers.

The reference transformers use torchtune RMSNorm (eps 1e-5) on sa_norm /
mlp_norm / final norm (reference: src/csm/models/model.py:11-42 via torchtune
llama3_2).  Computed in float32 and cast back — the standard numerically-safe
pattern for bf16 weights on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * scale.astype(jnp.float32)).astype(dtype)
