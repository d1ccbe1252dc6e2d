"""Functional Llama-3.2-style transformer (backbone & audio decoder).

Capability equivalent of torchtune's ``llama3_2`` decoder as used by the
reference (src/csm/models/model.py:11-56: tok_embeddings/output replaced by
Identity — the transformer maps hidden states to hidden states).

TPU-first design:
  * parameters are a flat dict of *layer-stacked* arrays (leading axis =
    num_layers) and the forward is a ``jax.lax.scan`` over layers — one
    compiled layer body regardless of depth, fast compiles, and XLA double-
    buffers the per-layer weight fetch from HBM;
  * weights stored (in_features, out_features) so every projection is a plain
    ``x @ W`` row-major MXU matmul (the checkpoint converter transposes
    torchtune's (out, in) layout);
  * KV cache is functional (csm_tpu/ops/kvcache.py) and threaded through the
    scan;
  * RoPE uses the half-split convention (see csm_tpu/ops/rope.py for the
    interleaved→half-split import permutation).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from csm_tpu.models.config import TransformerConfig
from csm_tpu.ops.attention import gqa_attention
from csm_tpu.ops.kvcache import KVCache, QuantKV, dequantize_kv, update_layer
from csm_tpu.ops.norms import rms_norm
from csm_tpu.ops.rope import apply_rope, rope_at_positions


def transformer_init(key: jax.Array, cfg: TransformerConfig, dtype=jnp.float32):
    """Initialize layer-stacked transformer parameters.

    Returns a dict:
        wq (L, E, Hq*D), wk (L, E, Hkv*D), wv (L, E, Hkv*D), wo (L, Hq*D, E),
        w1/w3 (L, E, I), w2 (L, I, E), sa_norm/mlp_norm (L, E), norm (E,)
    """
    E, I = cfg.embed_dim, cfg.intermediate_dim
    L = cfg.num_layers
    D = cfg.head_dim
    qd, kvd = cfg.num_heads * D, cfg.num_kv_heads * D

    keys = jax.random.split(key, 7)

    def init(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) / jnp.sqrt(fan_in)).astype(
            dtype
        )

    return {
        "wq": init(keys[0], (L, E, qd), E),
        "wk": init(keys[1], (L, E, kvd), E),
        "wv": init(keys[2], (L, E, kvd), E),
        "wo": init(keys[3], (L, qd, E), qd),
        "w1": init(keys[4], (L, E, I), E),
        "w3": init(keys[5], (L, E, I), E),
        "w2": init(keys[6], (L, I, E), I),
        "sa_norm": jnp.ones((L, E), dtype),
        "mlp_norm": jnp.ones((L, E), dtype),
        "norm": jnp.ones((E,), dtype),
    }


def fuse_projections(tp: dict) -> dict:
    """Fuse wq/wk/wv → wqkv and w1/w3 → w13 (inference-only layout).

    The decode step is HBM-bandwidth-bound matvecs; fusing the three
    attention input projections into one (E, qd+2·kvd) matmul and the two
    SwiGLU input projections into one (E, 2·I) matmul reads the same bytes
    through fewer, larger HBM streams (better DMA pipelining per
    scripts/bench_qkv_fusion.py).  Works on float weights and on the int8
    weight-only format ({"w8", "scale"} — per-out-channel scales
    concatenate along the output axis, csm_tpu/utils/quantize.py).

    Fused params are for cached/serving inference; training, LoRA
    (unmerged adapters target the separate names), and checkpoint export
    keep the canonical separate layout.
    """
    out = {
        k: v for k, v in tp.items() if k not in ("wq", "wk", "wv", "w1", "w3")
    }

    def cat(names):
        ws = [tp[n] for n in names]
        if isinstance(ws[0], dict):
            # quantized formats concatenate field-wise: int8 (w8/scale) and
            # grouped int4 (w4p/scale4) both pack/scale along axes that are
            # unaffected by an out-axis concat
            return {
                k: jnp.concatenate([w[k] for w in ws], axis=-1)
                for k in ws[0]
            }
        return jnp.concatenate(ws, axis=-1)

    out["wqkv"] = cat(("wq", "wk", "wv"))
    out["w13"] = cat(("w1", "w3"))
    return out


def _layer_forward(
    h: jnp.ndarray,
    lp: dict,
    cfg: TransformerConfig,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    mask: jnp.ndarray,
    kv_layer: Optional[Tuple[jnp.ndarray, jnp.ndarray]],
    cache_offset: Optional[jnp.ndarray],
    lora: Optional[dict] = None,
    lora_scale: float = 0.0,
    flash_pos: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    lora_dropout_rate: float = 0.0,
    lora_key: Optional[jax.Array] = None,
    attn_impl=None,
    lora_ids: Optional[jnp.ndarray] = None,
):
    """One transformer block. Returns (h, (k_cache, v_cache)|None).

    ``lora`` — optional {proj_name: {"a": (in, r), "b": (r, out)}} low-rank
    adapters for this layer (csm_tpu/training/lora.py).  The adapter path
    is computed low-rank — (x @ a) @ b — so only a/b receive gradients and
    no merged weight is materialized (capability of the reference
    LoRALinear, src/csm/mlx/components/lora.py:71-105, built the XLA way).
    """
    B, S, E = h.shape
    D = cfg.head_dim

    proj_ids = {"wq": 0, "wk": 1, "wv": 2, "wo": 3, "w1": 4, "w2": 5, "w3": 6}

    def proj(x, name):
        w = lp[name]
        if isinstance(w, dict) and "w4p" in w:  # grouped int4
            # XLA can't fuse the nibble unpack, so decode shapes run the
            # Pallas fused-dequant kernel (csm_tpu/ops/int4_matmul.py)
            from csm_tpu.ops.int4_matmul import int4_matmul

            y = int4_matmul(x, w)
        elif isinstance(w, dict):  # int8 weight-only quantization
            # XLA fuses the convert into the matmul operand load, so only
            # int8 bytes stream from HBM (csm_tpu/utils/quantize.py)
            y = (x @ w["w8"].astype(x.dtype)) * w["scale"].astype(x.dtype)
        else:
            # weights cast to the activation dtype: params may be stored
            # f32 while the compute dtype is bf16
            y = x @ w.astype(x.dtype)
        if lora is not None and name in lora:
            ad = lora[name]
            xa = x
            if lora_dropout_rate > 0.0 and lora_key is not None:
                # adapter-input dropout (reference LoRALinear,
                # src/csm/mlx/components/lora.py:71-105); one key per
                # (layer, projection)
                k = jax.random.fold_in(lora_key, proj_ids[name])
                keep = jax.random.bernoulli(k, 1.0 - lora_dropout_rate, x.shape)
                xa = jnp.where(keep, x / (1.0 - lora_dropout_rate), 0.0).astype(
                    x.dtype
                )
            if ad["a"].ndim == 3:
                # ADAPTER BANK (multi-LoRA serving): per-layer (A, in, r)
                # with per-ROW ids — each batch row applies its own
                # adapter (id 0 = zeros = base model).  Scaling is folded
                # into b at bank build time (training/lora.fuse_lora_bank)
                a = ad["a"][lora_ids].astype(x.dtype)  # (B, in, r)
                b = ad["b"][lora_ids].astype(x.dtype)  # (B, r, out)
                y = y + jnp.einsum(
                    "bsr,bro->bso", jnp.einsum("bsi,bir->bsr", xa, a), b
                ) * lora_scale
            else:
                y = y + ((xa @ ad["a"].astype(x.dtype))
                         @ ad["b"].astype(x.dtype)) * lora_scale
        return y

    # --- attention ---
    x = rms_norm(h, lp["sa_norm"], cfg.norm_eps)
    if "wqkv" in lp:  # fused inference layout (fuse_projections)
        qd, kvd = cfg.num_heads * D, cfg.num_kv_heads * D
        qkv = proj(x, "wqkv")
        q = qkv[..., :qd].reshape(B, S, cfg.num_heads, D)
        k = qkv[..., qd : qd + kvd].reshape(B, S, cfg.num_kv_heads, D)
        v = qkv[..., qd + kvd :].reshape(B, S, cfg.num_kv_heads, D)
    else:
        q = proj(x, "wq").reshape(B, S, cfg.num_heads, D)
        k = proj(x, "wk").reshape(B, S, cfg.num_kv_heads, D)
        v = proj(x, "wv").reshape(B, S, cfg.num_kv_heads, D)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    def attend(q, k, v):
        if attn_impl is not None:  # e.g. sequence-parallel ring attention
            return attn_impl(q, k, v)
        if flash_pos is not None:
            from csm_tpu.ops.flash_attention import flash_gqa_attention

            return flash_gqa_attention(q, k, v, flash_pos[0], flash_pos[1])
        return gqa_attention(q, k, v, mask)

    if kv_layer is not None:
        k_cache, v_cache = update_layer(kv_layer[0], kv_layer[1], k, v, cache_offset)
        # int8 caches dequantize at the attention load (convert+scale fuse
        # into the matmul operand read; only int8 bytes stream from HBM)
        kd = dequantize_kv(k_cache, q.dtype)
        vd = dequantize_kv(v_cache, q.dtype)
        use_decode_kernel = False
        import os as _os
        if (S == 1 and attn_impl is None and flash_pos is None
                and not isinstance(k_cache, QuantKV)
                and _os.environ.get("CSM_TPU_DECODE_KERNEL") == "1"):
            # OPT-IN experiment (CSM_TPU_DECODE_KERNEL=1): a Pallas
            # decode-attention kernel (csm_tpu/ops/decode_attention.py).
            # Measured end-to-end NEUTRAL on this rig — Pallas block DMA
            # streams the cache no faster than XLA's attention here, so
            # the default stays XLA; the effective long-context decode
            # lever is the int8 KV cache (BENCHMARKS.md §long context).
            # Quantized caches keep the XLA path either way — feeding
            # the kernel would materialize the dequantized copy.
            from csm_tpu.ops.decode_attention import decode_supported
            from csm_tpu.ops.flash_attention import flash_available

            use_decode_kernel = flash_available() and decode_supported(
                q, kd, mask)
        if use_decode_kernel:
            from csm_tpu.ops.decode_attention import decode_gqa_attention

            attn = decode_gqa_attention(q, kd, vd, mask)
        else:
            attn = attend(q, kd, vd)
        new_kv = (k_cache, v_cache)
    else:
        attn = attend(q, k, v)
        new_kv = None

    h = h + proj(attn.reshape(B, S, cfg.num_heads * D), "wo")

    # --- SwiGLU MLP ---
    x = rms_norm(h, lp["mlp_norm"], cfg.norm_eps)
    if "w13" in lp:  # fused inference layout
        I = cfg.intermediate_dim
        g13 = proj(x, "w13")
        gate, up = jax.nn.silu(g13[..., :I]), g13[..., I:]
    else:
        gate = jax.nn.silu(proj(x, "w1"))
        up = proj(x, "w3")
    h = h + proj(gate * up, "w2")
    return h, new_kv


def transformer_apply(
    params: dict,
    cfg: TransformerConfig,
    h: jnp.ndarray,
    positions: jnp.ndarray,
    mask: jnp.ndarray,
    cache: Optional[KVCache] = None,
    cache_offset: Optional[jnp.ndarray] = None,
    remat: bool = False,
    lora: Optional[dict] = None,
    lora_scale: float = 0.0,
    flash_pos: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    lora_dropout_rate: float = 0.0,
    lora_dropout_key: Optional[jax.Array] = None,
    attn_impl=None,
    lora_ids: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """Run the transformer.

    Args:
        h: (B, S, E) input hidden states.
        positions: (B, S) or (S,) int positions for RoPE.
        mask: (B, S, T) boolean attention mask (T = cache len if cached,
            else S).
        cache: optional KVCache; if given, new K/V are written at
            ``cache_offset`` and attention runs over the full cache.
        cache_offset: scalar int32 write offset into the cache.
        remat: rematerialize each layer on the backward pass
            (jax.checkpoint over the scanned layer body) — trades FLOPs
            for HBM during training.
        lora: optional layer-stacked low-rank adapters
            {proj: {"a": (L, in, r), "b": (L, r, out)}}; scanned alongside
            the base weights.
        lora_scale: alpha / r.
        flash_pos: optional (q_pos (B, S), kv_pos (T,) | (B, T)) — use the
            Pallas flash-attention kernel (csm_tpu/ops/flash_attention.py)
            with position-derived masking instead of the materialized
            ``mask`` (long-sequence prefill / training on TPU).
        attn_impl: optional ``(q, k, v) -> out`` override of the attention
            op itself — used for sequence-parallel ring attention
            (csm_tpu/parallel/ring_attention.py), where masking comes from
            positions closed over by the callable.  Takes precedence over
            ``flash_pos``/``mask``.
        lora_dropout_rate / lora_dropout_key: adapter-input dropout during
            LoRA training (per-layer, per-projection keys; inactive when
            the key is None — i.e. at eval/inference).

    Returns:
        (h_out (B, S, E), updated cache or None)
    """
    # Per-row position tables: rows of a batch may sit at different absolute
    # positions (bucketed prompts of different lengths, per-row decode
    # offsets) — cos/sin are (B, S, D/2) in that case.  Out-of-range PAD_POS
    # indices clamp harmlessly (those slots are never attended).
    cos, sin = rope_at_positions(cfg, positions)

    layer_names = (
        ("wqkv",) if "wqkv" in params else ("wq", "wk", "wv")
    ) + (
        ("w13",) if "w13" in params else ("w1", "w3")
    ) + ("wo", "w2", "sa_norm", "mlp_norm")
    if "wqkv" in params and lora is not None:
        if not set(lora).issubset({"wqkv", "w13", "wo", "w2"}):
            raise ValueError(
                "fused projections (fuse_projections) require LoRA adapters "
                "to be merged first (training/lora.merge_lora) or fused into "
                "bank form (training/lora.fuse_lora_bank)"
            )
    stacked = {name: params[name] for name in layer_names}

    if cache is not None:
        xs = (stacked, lora, cache.k, cache.v)

        def body(carry, x):
            lp, lo, kc, vc = x
            h_new, kv = _layer_forward(
                carry, lp, cfg, cos, sin, mask, (kc, vc), cache_offset,
                lora=lo, lora_scale=lora_scale, flash_pos=flash_pos,
                attn_impl=attn_impl, lora_ids=lora_ids,
            )
            return h_new, kv

        h, (new_k, new_v) = jax.lax.scan(body, h, xs)
        new_cache = KVCache(new_k, new_v)
    else:
        L = cfg.num_layers
        layer_keys = (
            jax.random.split(lora_dropout_key, L)
            if (lora_dropout_key is not None and lora_dropout_rate > 0.0)
            else None
        )
        xs = (stacked, lora, layer_keys)

        def body(carry, x):
            lp, lo, lk = x
            h_new, _ = _layer_forward(
                carry, lp, cfg, cos, sin, mask, None, None,
                lora=lo, lora_scale=lora_scale, flash_pos=flash_pos,
                lora_dropout_rate=lora_dropout_rate, lora_key=lk,
                attn_impl=attn_impl, lora_ids=lora_ids,
            )
            return h_new, None

        if remat:
            body = jax.checkpoint(body)
        h, _ = jax.lax.scan(body, h, xs)
        new_cache = None

    h = rms_norm(h, params["norm"], cfg.norm_eps)
    return h, new_cache
