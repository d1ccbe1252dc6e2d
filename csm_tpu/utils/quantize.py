"""Weight-only int8 quantization for inference.

Single-stream decode is HBM-bandwidth-bound on weight reads
(BENCHMARKS.md): storing the transformer projection weights as int8 with
per-output-channel bf16 scales halves the bytes streamed per frame, and
XLA fuses the int8→bf16 convert into the matmul operand load (measured
~1.7x on the scanned matvec chain).  Opt-in speed mode for serving /
generation — training always uses full-precision weights.

Layout: each (L, in, out) projection becomes
``{"w8": int8 (L, in, out), "scale": bf16 (L, 1, out)}`` with symmetric
per-(layer, out-channel) scales; norms, embeddings, heads and the
backbone→decoder projection stay in their original dtype (they are a
small fraction of per-frame traffic).  The layer forward
(csm_tpu/models/llama.py) dequantizes transparently.
"""

from __future__ import annotations

import jax.numpy as jnp

QUANTIZED_PROJS = ("wq", "wk", "wv", "wo", "w1", "w2", "w3")


def quantize_weight(w: jnp.ndarray) -> dict:
    """(..., in, out) float → {"w8", "scale"} with per-out-channel scales."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # (..., 1, out)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w8 = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"w8": w8, "scale": scale.astype(jnp.bfloat16)}


def dequantize_weight(q: dict, dtype=jnp.float32) -> jnp.ndarray:
    return (q["w8"].astype(jnp.float32) * q["scale"].astype(jnp.float32)).astype(dtype)


def is_quantized(w) -> bool:
    return isinstance(w, dict) and "w8" in w


def quantize_transformer(tp: dict) -> dict:
    out = dict(tp)
    # also cover the fused inference layout (models/llama.fuse_projections):
    # per-out-channel scales make quantize(fuse(w)) == fuse(quantize(w))
    for name in QUANTIZED_PROJS + ("wqkv", "w13"):
        if name not in tp:
            continue
        # idempotent: an already-quantized projection is reused as-is (the
        # multi-speaker trainer shares ONE quantized base across speakers)
        out[name] = tp[name] if is_quantized(tp[name]) else quantize_weight(tp[name])
    return out


def quantize_csm_params(params: dict, components=("backbone", "decoder")) -> dict:
    """Quantize the transformer stacks of a CSM parameter tree (inference
    only — the embeddings/heads/norms keep their dtype)."""
    out = dict(params)
    for comp in components:
        out[comp] = quantize_transformer(params[comp])
    return out
