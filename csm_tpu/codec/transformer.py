"""Mimi bottleneck transformer (encoder- and decoder-side).

8 layers, d=512, 8-head MHA, standard RoPE (θ=10000, no frequency scaling,
HF rotate-half convention — no import permutation needed), pre-LayerNorm
(with bias), LayerScale residual gains, GELU MLP, sliding-window causal
attention (window 250).  Mirrors the codec transformer of the Mimi codec
the reference consumes as an external dependency
(src/csm/generator.py:66-70; docs/reference/moshi/model_architecture.md).

Functional, layer-stacked, scanned — same pattern as csm_tpu/models/llama.py.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MimiTransformerConfig:
    num_layers: int = 8
    num_heads: int = 8
    embed_dim: int = 512
    intermediate_dim: int = 2048
    head_dim: int = 64
    rope_theta: float = 10_000.0
    sliding_window: int = 250
    norm_eps: float = 1e-5


@functools.lru_cache(maxsize=8)
def _rope_tables(head_dim: int, theta: float, max_len: int):
    inv = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    ang = np.outer(np.arange(max_len, dtype=np.float64), inv)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """HF convention: full-width cos/sin with rotate_half. x: (B,S,H,D)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    half = xf.shape[-1] // 2
    x1, x2 = xf[..., :half], xf[..., half:]
    cos = cos[None, :, None, :]
    sin = sin[None, :, None, :]
    out1 = x1 * cos - x2 * sin
    out2 = x2 * cos + x1 * sin
    return jnp.concatenate([out1, out2], axis=-1).astype(dtype)


def _layer_norm(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def mimi_transformer_apply(
    params: dict, cfg: MimiTransformerConfig, h: jnp.ndarray
) -> jnp.ndarray:
    """Full-sequence pass. h: (B, S, E) → (B, S, E).

    Causal with sliding window: position i attends to j in
    (i - window, i].
    """
    B, S, E = h.shape
    H, D = cfg.num_heads, cfg.head_dim
    cos_np, sin_np = _rope_tables(D, cfg.rope_theta, max(S, 1))
    cos = jnp.asarray(cos_np[:S])
    sin = jnp.asarray(sin_np[:S])

    i = jnp.arange(S)[:, None]
    j = jnp.arange(S)[None, :]
    mask = (j <= i) & (j > i - cfg.sliding_window)  # (S, S)

    def body(h, lp):
        x = _layer_norm(h, lp["ln1_scale"], lp["ln1_bias"], cfg.norm_eps)
        q = (x @ lp["wq"]).reshape(B, S, H, D)
        k = (x @ lp["wk"]).reshape(B, S, H, D)
        v = (x @ lp["wv"]).reshape(B, S, H, D)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)
        scale = 1.0 / jnp.sqrt(jnp.float32(D))
        scores = jnp.einsum(
            "bshd,bthd->bhst", q.astype(jnp.float32) * scale, k.astype(jnp.float32)
        )
        scores = jnp.where(mask[None, None], scores, jnp.float32(-1e30))
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("bhst,bthd->bshd", probs, v.astype(jnp.float32))
        attn = attn.reshape(B, S, E).astype(h.dtype)
        h = h + lp["attn_scale"] * (attn @ lp["wo"])

        x = _layer_norm(h, lp["ln2_scale"], lp["ln2_bias"], cfg.norm_eps)
        mlp = jax.nn.gelu(x @ lp["fc1"], approximate=False) @ lp["fc2"]
        h = h + lp["mlp_scale"] * mlp
        return h, None

    h, _ = jax.lax.scan(body, h, params["layers"])
    return h


def mimi_transformer_init(key, cfg: MimiTransformerConfig, dtype=jnp.float32):
    E, I, L = cfg.embed_dim, cfg.intermediate_dim, cfg.num_layers
    ks = jax.random.split(key, 6)

    def init(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) / np.sqrt(fan_in)).astype(dtype)

    return {
        "layers": {
            "wq": init(ks[0], (L, E, E), E),
            "wk": init(ks[1], (L, E, E), E),
            "wv": init(ks[2], (L, E, E), E),
            "wo": init(ks[3], (L, E, E), E),
            "fc1": init(ks[4], (L, E, I), E),
            "fc2": init(ks[5], (L, I, E), I),
            "ln1_scale": jnp.ones((L, E), dtype),
            "ln1_bias": jnp.zeros((L, E), dtype),
            "ln2_scale": jnp.ones((L, E), dtype),
            "ln2_bias": jnp.zeros((L, E), dtype),
            "attn_scale": jnp.full((L, E), 0.01, dtype),
            "mlp_scale": jnp.full((L, E), 0.01, dtype),
        }
    }
