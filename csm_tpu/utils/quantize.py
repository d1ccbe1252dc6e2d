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


# ---------------------------------------------------------------------------
# int4 grouped quantization (opt-in; Pallas fused-dequant kernel)
#
# XLA fuses int8→bf16 converts into matmul operand loads, but it will NOT
# fuse a nibble unpack (measured: the unpacked weights materialize and the
# "int4" scan runs slower than bf16 — scripts/bench_int4_probe.py), so
# int4 decode needs the custom kernel in csm_tpu/ops/int4_matmul.py.
#
# Layout: {"w4p": uint8 (..., in/2, out), "scale4": bf16 (..., in/gs, out)}.
# Nibbles are TWO'S-COMPLEMENT int4 (q ∈ [-7, 7]) packed over ADJACENT
# INPUT ROWS: byte row r holds input row 2r in the low nibble and input
# row 2r + 1 in the high nibble.  That is exactly the element order of
# Mosaic's sub-byte bitcast (uint8 → int4 doubles the sublane axis,
# low nibble first), so the kernel unpacks a whole block with ONE
# hardware bitcast + convert instead of mask/shift VPU arithmetic — the
# arithmetic unpack measured VPU-bound at ~2.5 simple ops/weight, slower
# than just reading int8.  Per-(group, out-channel) scales (group_size
# along the INPUT axis) keep 4-bit error local, the standard grouped
# int4 recipe.
# ---------------------------------------------------------------------------

INT4_GROUP_SIZE = 128


def quantize_weight_int4(w: jnp.ndarray, group_size: int = INT4_GROUP_SIZE) -> dict:
    """(..., in, out) float → {"w4p", "scale4"} grouped int4."""
    wf = w.astype(jnp.float32)
    K, N = wf.shape[-2], wf.shape[-1]
    group_size = min(group_size, K)  # tiny test models: one group per column
    if K % group_size or group_size % 2:
        raise ValueError(f"in dim {K} must divide by even group_size {group_size}")
    G = K // group_size
    grp = wf.reshape(*wf.shape[:-2], G, group_size, N)
    amax = jnp.max(jnp.abs(grp), axis=-2, keepdims=True)  # (..., G, 1, N)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(grp / scale), -7, 7).astype(jnp.int32)
    q = q.reshape(*wf.shape[:-2], K, N)
    lo = q[..., 0::2, :] & 0x0F  # two's-complement nibbles
    hi = q[..., 1::2, :] & 0x0F
    packed = (lo | (hi << 4)).astype(jnp.uint8)
    # no "gs" leaf: the group size is derivable from shapes
    # (gs = 2·w4p.rows / scale4.groups), and a scalar leaf would break
    # lax.scan slicing of layer-stacked trees
    return {
        "w4p": packed,
        "scale4": scale[..., 0, :].astype(jnp.bfloat16),  # (..., G, N)
    }


def dequantize_weight_int4(q: dict, dtype=jnp.float32) -> jnp.ndarray:
    """Reference unpack: exact inverse of quantize_weight_int4's packing."""
    p, scale = q["w4p"], q["scale4"]
    K2, N = p.shape[-2], p.shape[-1]
    G = scale.shape[-2]
    gs = 2 * K2 // G
    p32 = p.astype(jnp.int32)
    lo = ((p32 & 0x0F) ^ 8) - 8  # sign-extend the nibble
    hi = ((p32 >> 4) ^ 8) - 8
    full = jnp.stack([lo, hi], axis=-2)  # (..., K/2, 2, N)
    full = full.reshape(*p.shape[:-2], 2 * K2, N).astype(jnp.float32)
    grp = full.reshape(*p.shape[:-2], G, gs, N)
    w = grp * scale[..., :, None, :].astype(jnp.float32)
    return w.reshape(*p.shape[:-2], 2 * K2, N).astype(dtype)


def is_quantized_int4(w) -> bool:
    return isinstance(w, dict) and "w4p" in w


def quantize_transformer_int4(tp: dict, group_size: int = INT4_GROUP_SIZE) -> dict:
    out = dict(tp)
    for name in QUANTIZED_PROJS + ("wqkv", "w13"):
        if name not in tp:
            continue
        w = tp[name]
        if is_quantized_int4(w):
            continue
        if is_quantized(w):
            raise ValueError(f"{name} is already int8-quantized; int4 must "
                             "quantize from the float weights")
        out[name] = quantize_weight_int4(w, group_size)
    return out


def quantize_csm_params_int4(
    params: dict,
    components=("backbone", "decoder"),
    group_size: int = INT4_GROUP_SIZE,
) -> dict:
    """Grouped-int4 quantize the transformer stacks (inference only)."""
    out = dict(params)
    for comp in components:
        out[comp] = quantize_transformer_int4(params[comp], group_size)
    return out


def init_transformer_quantized(key, cfg, mode: str = "int8",
                               layers_per_chunk: int = 2) -> dict:
    """``models.llama.transformer_init``'s tree, initialized + quantized
    in PER-LAYER-CHUNK jit calls — for models whose bf16 tree exceeds the
    chip (8B): the quantizer's f32/int32 intermediates on a full 8B leaf
    (e.g. the 3.5 GiB w1 stack) don't all fuse away, so bounding each
    call to ~2 layers keeps transients in the hundreds of MiB.  Matches
    ``transformer_init``'s shapes and normal/sqrt(fan_in) distribution.
    """
    import jax
    import numpy as np

    qfn = {"int8": quantize_weight, "int4": quantize_weight_int4}[mode]
    E, I, L = cfg.embed_dim, cfg.intermediate_dim, cfg.num_layers
    D = cfg.head_dim
    qd, kvd = cfg.num_heads * D, cfg.num_kv_heads * D
    specs = {
        "wq": ((L, E, qd), E), "wk": ((L, E, kvd), E),
        "wv": ((L, E, kvd), E), "wo": ((L, qd, E), qd),
        "w1": ((L, E, I), E), "w3": ((L, E, I), E), "w2": ((L, I, E), I),
    }
    tp = {}
    for i, (name, (shape, fan)) in enumerate(sorted(specs.items())):
        parts, j = [], 0
        while j < L:
            c = min(layers_per_chunk, L - j)
            f = jax.jit(lambda k, s=(c,) + shape[1:], fi=fan: qfn(
                (jax.random.normal(k, s, jnp.bfloat16)
                 / np.sqrt(fi).astype(np.float32))
            ))
            parts.append(jax.block_until_ready(
                f(jax.random.fold_in(jax.random.fold_in(key, i), j))
            ))
            j += c
        tp[name] = (
            jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *parts)
            if len(parts) > 1 else parts[0]
        )
        del parts
    ones = jax.jit(lambda: (
        jnp.ones((L, E), jnp.bfloat16), jnp.ones((L, E), jnp.bfloat16),
        jnp.ones((E,), jnp.bfloat16),
    ))()
    tp["sa_norm"], tp["mlp_norm"], tp["norm"] = ones
    return tp


def init_csm_params_quantized(key, args, mode: str = "int8") -> dict:
    """Full CSM tree with backbone/decoder projections quantized at init;
    embeddings / heads / norms bf16 (the ``quantize_csm_params*``
    component policy).  The 8B no-checkpoint load path: the bf16 8B tree
    (~16 GiB) can never exist on a 16 GiB chip, so the tree only ever
    materializes in its quantized form (scripts/bench_8b.py measured
    runs use exactly this)."""
    import jax
    import numpy as np

    bb, dec = args.backbone, args.decoder
    kb, kd, k1, k2, k3, k4, k5 = jax.random.split(key, 7)
    params = {
        "backbone": init_transformer_quantized(kb, bb, mode),
        "decoder": init_transformer_quantized(kd, dec, mode),
    }
    emb = lambda k, shape, fan: jax.block_until_ready(jax.jit(  # noqa: E731
        lambda kk: (jax.random.normal(kk, shape, jnp.float32)
                    / np.sqrt(fan)).astype(jnp.bfloat16)
    )(k))
    K = args.audio_num_codebooks
    params["text_embeddings"] = emb(
        k1, (args.text_vocab_size, bb.embed_dim), bb.embed_dim)
    params["audio_embeddings"] = emb(
        k2, (args.audio_vocab_size * K, bb.embed_dim), bb.embed_dim)
    params["projection"] = emb(k3, (bb.embed_dim, dec.embed_dim), bb.embed_dim)
    params["codebook0_head"] = emb(
        k4, (bb.embed_dim, args.audio_vocab_size), bb.embed_dim)
    params["audio_head"] = emb(
        k5, (K - 1, dec.embed_dim, args.audio_vocab_size), dec.embed_dim)
    return params


def quantize_csm_params_streaming(
    host_params: dict,
    mode: str = "int8",
    components=("backbone", "decoder"),
    layers_per_chunk: int = 2,
) -> dict:
    """Device-put + quantize a HOST (numpy) CSM tree WITHOUT ever
    materializing the full float tree on device.

    The 8B QLoRA load path needs this: the bf16 8B tree is ~16 GiB —
    more than one v5e chip — so ``load then quantize`` OOMs before the
    quantizer runs.  Each layer-stacked projection is uploaded and
    quantized in per-layer-chunk jit calls (the quantizer's f32/int32
    intermediates bound the transient, not the leaf size); everything
    else device-puts as-is.
    """
    import jax
    import jax.numpy as jnp

    qfn = {"int8": quantize_weight, "int4": quantize_weight_int4}[mode]
    out = {}
    for comp, tree in host_params.items():
        if comp not in components or not isinstance(tree, dict):
            out[comp] = jax.tree.map(jnp.asarray, tree)
            continue
        ctree = {}
        for name, w in tree.items():
            if name not in QUANTIZED_PROJS + ("wqkv", "w13"):
                ctree[name] = jax.tree.map(jnp.asarray, w)
                continue
            if getattr(w, "ndim", 0) != 3:
                # a projection name with an unexpected rank means the host
                # tree is not the layer-stacked layout this path assumes;
                # uploading it unquantized would silently OOM the 8B path
                raise ValueError(
                    f"{comp}.{name}: expected layer-stacked (L, in, out) "
                    f"projection, got ndim={getattr(w, 'ndim', None)}"
                )
            L = w.shape[0]
            parts, j = [], 0
            while j < L:
                c = min(layers_per_chunk, L - j)
                parts.append(
                    jax.block_until_ready(jax.jit(qfn)(jnp.asarray(w[j:j + c])))
                )
                j += c
            ctree[name] = (
                jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *parts)
                if len(parts) > 1 else parts[0]
            )
            del parts
        out[comp] = ctree
    return out
