"""Shape-true 8B quantization quality probes (round-4 verdict Weak #3 /
Next #6): KL + greedy signals AT THE REAL 8B SHAPE, not just the tiny
shapes tests/test_int4.py covers.

The bf16 8B tree can never exist on one chip, so the true bf16 oracle
for the semantic channel (c0 logits) is computed by STREAMING one layer
at a time: the quantized trees' float pre-images are regenerable
deterministically (init_csm_params_quantized's per-chunk keys), so each
layer's bf16 weights are rebuilt on the fly, applied, and discarded —
the full bf16 backbone forward at ~0.5 GiB transient.

Reported (JSON lines):
  * c0 softmax KL(bf16-oracle ‖ int8) and (‖ int4) at 8B shape —
    the promotion-rule metric (csm_tpu/serving.py header: KL < 0.01)
  * greedy frame-token agreement int8 ↔ int4 (the acoustic channel,
    between the two quantized configs — no bf16 frame oracle fits)
  * int4 Pallas kernel vs XLA-dequant reference: max |Δlogit| and
    greedy equality at the 8B shape (kernel-correctness, not quality)

Usage: python scripts/bench_8b_quality.py [prompt_len]
"""
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_default_matmul_precision", "highest")

from csm_tpu.models.config import csm_8b_args
from csm_tpu.utils.transport import warm_transport


def log(*a):
    print(*a, file=sys.stderr, flush=True)


KEY0 = 0  # same base key as init_csm_params_quantized callers below


def regen_layer_bf16(cfg, key, layer, layers_per_chunk=2):
    """Rebuild ONE backbone layer's bf16 projection weights exactly as
    init_transformer_quantized drew them (same per-chunk fold_in keys,
    same normal/sqrt(fan) bf16 values) — the streamed bf16 oracle's
    weight source (csm_tpu/utils/quantize.py)."""
    E, I, L = cfg.embed_dim, cfg.intermediate_dim, cfg.num_layers
    D = cfg.head_dim
    qd, kvd = cfg.num_heads * D, cfg.num_kv_heads * D
    specs = {
        "wq": ((L, E, qd), E), "wk": ((L, E, kvd), E),
        "wv": ((L, E, kvd), E), "wo": ((L, qd, E), qd),
        "w1": ((L, E, I), E), "w3": ((L, E, I), E), "w2": ((L, I, E), I),
    }
    j = layer - layer % layers_per_chunk
    c = min(layers_per_chunk, L - j)
    lp = {}
    for i, (name, (shape, fan)) in enumerate(sorted(specs.items())):
        k = jax.random.fold_in(jax.random.fold_in(key, i), j)
        chunk = (jax.random.normal(k, (c,) + shape[1:], jnp.bfloat16)
                 / np.sqrt(fan).astype(np.float32))
        lp[name] = chunk[layer - j].astype(jnp.bfloat16)
    lp["sa_norm"] = jnp.ones((E,), jnp.bfloat16)
    lp["mlp_norm"] = jnp.ones((E,), jnp.bfloat16)
    return lp


def oracle_c0_probs(args, params_q, tokens, mask):
    """True bf16 c0 softmax at 8B shape via layer streaming.  Embeddings,
    final norm and c0 head are bf16 in the quantized tree (identical to
    the oracle's), so they are reused from it."""
    from csm_tpu.models.csm import masked_embed_sum
    from csm_tpu.models.llama import _layer_forward
    from csm_tpu.ops.attention import causal_mask_from_positions
    from csm_tpu.ops.norms import rms_norm
    from csm_tpu.ops.rope import rope_at_positions

    bb = args.backbone
    kb = jax.random.split(jax.random.key(KEY0), 7)[0]
    S = tokens.shape[1]
    pos = jnp.arange(S, dtype=jnp.int32)

    @jax.jit
    def embed(tokens, mask):
        h = masked_embed_sum(params_q, args, tokens, mask)
        return h.astype(jnp.bfloat16)

    @jax.jit
    def layer_step(h, lp):
        cos, sin = rope_at_positions(bb, pos)
        m = causal_mask_from_positions(pos[None], pos)
        h2, _ = _layer_forward(h, lp, bb, cos, sin, m, None, None)
        return h2

    @jax.jit
    def head(h):
        hn = rms_norm(h[:, -1], params_q["backbone"]["norm"], bb.norm_eps)
        logits = hn.astype(jnp.float32) @ params_q["codebook0_head"].astype(
            jnp.float32)
        return jax.nn.softmax(logits, axis=-1)

    h = embed(tokens, mask)
    for l in range(bb.num_layers):
        lp = regen_layer_bf16(bb, kb, l)
        h = layer_step(h, lp)
        del lp
    return np.asarray(head(h))[0].astype(np.float64)


def quant_c0_probs(args, params, tokens, mask):
    from csm_tpu.models.csm import backbone_forward

    h = jax.jit(
        lambda p, t, m: backbone_forward(p, args, t, m,
                                         compute_dtype=jnp.bfloat16)
    )(params, tokens, mask)
    logits = (h[:, -1].astype(jnp.float32)
              @ params["codebook0_head"].astype(jnp.float32))
    return np.asarray(jax.nn.softmax(logits, axis=-1))[0].astype(np.float64)


def greedy_frames(args, params, tokens, mask, n_frames=3):
    from csm_tpu.models.generation import generate_audio_tokens

    S = tokens.shape[1]
    res = jax.jit(
        lambda p, k: generate_audio_tokens(
            p, args, k, tokens, mask, jnp.full((1,), S, jnp.int32),
            max_frames=n_frames, temperature=1.0, topk=1,
            compute_dtype=jnp.bfloat16,
        )
    )(params, jax.random.key(0))
    return np.asarray(res.frames)[0]


def kl(p, q):
    nz = (p > 1e-12) & (q > 1e-12)
    return float(np.sum(p[nz] * np.log(p[nz] / q[nz])))


def main():
    warm_transport(verbose=True)
    args = csm_8b_args()
    K = args.audio_num_codebooks
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rng = np.random.default_rng(0)
    tokens = np.zeros((1, S, K + 1), np.int32)
    mask = np.zeros((1, S, K + 1), bool)
    tokens[0, :, -1] = rng.integers(1, args.text_vocab_size, S)
    mask[0, :, -1] = True
    tokens, mask = jnp.asarray(tokens), jnp.asarray(mask)

    from csm_tpu.utils.quantize import init_csm_params_quantized

    # ---- int8 pass ----
    t0 = time.time()
    p8 = init_csm_params_quantized(jax.random.key(KEY0), args, "int8")
    log(f"int8 tree ready in {time.time() - t0:.1f}s")
    probs8 = quant_c0_probs(args, p8, tokens, mask)
    oracle = oracle_c0_probs(args, p8, tokens, mask)  # reuses p8's bf16 leaves
    f8 = greedy_frames(args, p8, tokens, mask)
    del p8
    gc.collect()

    # ---- int4 pass ----
    t0 = time.time()
    p4 = init_csm_params_quantized(jax.random.key(KEY0), args, "int4")
    log(f"int4 tree ready in {time.time() - t0:.1f}s")
    probs4 = quant_c0_probs(args, p4, tokens, mask)
    f4 = greedy_frames(args, p4, tokens, mask)
    # kernel-vs-XLA parity at 8B shape (env read at trace time)
    os.environ["CSM_TPU_NO_INT4_KERNEL"] = "1"
    probs4_xla = quant_c0_probs(args, p4, tokens, mask)
    f4_xla = greedy_frames(args, p4, tokens, mask)
    del os.environ["CSM_TPU_NO_INT4_KERNEL"]
    del p4
    gc.collect()

    out = {
        "mode": "8b_quality", "prompt_len": S,
        "c0_kl_bf16_vs_int8": round(kl(oracle, probs8), 6),
        "c0_kl_bf16_vs_int4": round(kl(oracle, probs4), 6),
        "c0_kl_int8_vs_int4": round(kl(probs8, probs4), 6),
        "greedy_match_int8_vs_int4": float(np.mean(f8 == f4)),
        "int4_kernel_vs_xla_greedy_equal": bool(np.array_equal(f4, f4_xla)),
        "int4_kernel_vs_xla_c0_max_abs_dprob": float(
            np.max(np.abs(probs4 - probs4_xla))),
        # context: the 1B-shape promotion rule is KL < 0.01 nats AND
        # greedy >= 0.95 ON REAL WEIGHTS (csm_tpu/serving.py header)
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
