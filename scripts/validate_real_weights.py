"""One-command real-weights validation pack (VERDICT round-1 item #3).

Every importer in this repo (CSM ``ckpt.pt``, Mimi, SilentCipher) is
parity-tested against *random-init* torch models, because this
environment has zero network egress.  Day 1 with the real public weights
should be a button press, not a debugging session — this script runs the
full validation battery in one shot and prints/writes a report:

  1. tokenizer       — the real Llama-3.2 tokenizer loads from the HF cache
  2. csm-layerwise   — per-layer backbone activation parity vs the torch
                       oracle fed the SAME checkpoint (import fidelity)
  3. csm-frames      — greedy multi-frame generation token parity
                       (exercises the cached incremental decode path)
  4. sampling        — token-distribution parity on REAL c0 logits
                       (empirical vs analytic; JAX vs torch exponential-race)
  5. int8            — int8-vs-bf16 quality delta: c0 softmax KL + greedy
                       token match
  6. mimi            — encode code-match + decode waveform parity vs
                       ``transformers.MimiModel`` loaded from the same file
  7. watermark       — encode -> phase-shift decode -> verify roundtrip,
                       achieved SDR

With the real weights downloaded locally (they come from
``sesame/csm-1b`` ``ckpt.pt``, the reference's load path
src/csm/generator.py:221-244; ``kyutai/mimi`` via the HF
``model.safetensors``, generator.py:66-70; and ``sony/silentcipher``
44.1k ``enc_c.ckpt/dec_c.ckpt/dec_m_0.ckpt``, watermarking/utils.py:10-24),
the exact invocation is:

    python scripts/validate_real_weights.py \
        --csm-ckpt /path/to/ckpt.pt \
        --mimi-ckpt /path/to/mimi/model.safetensors \
        --silentcipher-dir /path/to/silentcipher/44_1_khz/73999_iteration \
        --tokenizer meta-llama/Llama-3.2-1B \
        --flavor 1b --report validation_report.json

Without any paths it runs the same battery end-to-end against
random-init torch stand-ins at --flavor tiny (what CI exercises here:
tests/test_validate_real_weights.py).
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.join(REPO, "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)


def log(*a):
    print(*a, flush=True)


# ---------------------------------------------------------------------------
# checks
# ---------------------------------------------------------------------------


def check_tokenizer(name: str) -> dict:
    from csm_tpu.data.tokenizers import load_text_tokenizer

    try:
        tok = load_text_tokenizer(name, allow_byte_fallback=False)
        ids = tok.encode("[0]hello world")
        return {
            "pass": True,
            "bos_id": tok.bos_id,
            "eos_id": tok.eos_id,
            "sample_len": len(ids),
        }
    except RuntimeError as e:
        # a cold cache in an offline environment is an expected WARN (the
        # check exists to be green on the real-weights machine); anything
        # else is a genuine failure
        offline = "cached files" in str(e) or "couldn't connect" in str(e)
        return {
            "pass": None if offline else False,
            "warn": "tokenizer not in local HF cache (offline?) — populate "
            "the cache before running with real CSM weights",
            "error": str(e).splitlines()[0],
        }


def _prompt(args, T=16, seed=5):
    rng = np.random.default_rng(seed)
    K = args.audio_num_codebooks
    tokens = np.zeros((1, T, K + 1), np.int64)
    mask = np.zeros((1, T, K + 1), bool)
    tokens[0, :, -1] = rng.integers(1, args.text_vocab_size, T)
    mask[0, :, -1] = True
    return tokens, mask


def check_csm_layerwise(state, params, args) -> dict:
    """Per-layer backbone activation parity: torch oracle vs JAX, fed the
    same checkpoint and the same prompt."""
    import torch

    from torch_oracle import OracleCSM

    from csm_tpu.models import csm
    from csm_tpu.models.llama import _layer_forward
    from csm_tpu.ops.attention import causal_mask_from_positions
    from csm_tpu.ops.rope import rope_at_positions

    oracle = OracleCSM(state, args)
    tokens, mask = _prompt(args)

    collect: list = []
    with torch.no_grad():
        embeds = oracle.embed_tokens(torch.from_numpy(tokens))
        h_t = (embeds * torch.from_numpy(mask).unsqueeze(-1).float()).sum(2)
        B, S, _ = h_t.shape
        pos = torch.arange(S).unsqueeze(0).expand(B, S)
        m = torch.tril(torch.ones(S, S, dtype=torch.bool))[None].expand(B, S, S)
        h_final_t = oracle.backbone(h_t, pos, m, collect=collect)
        c0_t = (h_final_t[:, -1] @ state["codebook0_head.weight"].T).numpy()

    # JAX side, one layer at a time (f32, no cache)
    cfg = args.backbone
    h_j = csm.masked_embed_sum(
        params, args, jnp.asarray(tokens.astype(np.int32)), jnp.asarray(mask)
    ).astype(jnp.float32)
    embed_diff = float(np.max(np.abs(np.asarray(h_j) - h_t.numpy())))
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    jmask = causal_mask_from_positions(positions, positions[0])
    cos, sin = rope_at_positions(cfg, positions)
    names = ("wq", "wk", "wv", "wo", "w1", "w2", "w3", "sa_norm", "mlp_norm")

    @jax.jit
    def layerwise(params, h):
        def body(carry, lp):
            h_new, _ = _layer_forward(carry, lp, cfg, cos, sin, jmask, None, None)
            return h_new, h_new

        stacked = {n: params["backbone"][n] for n in names}
        _, per_layer = jax.lax.scan(body, h, stacked)
        return per_layer

    per_layer_j = np.asarray(layerwise(params, h_j))  # (L, B, S, E)
    layer_diffs = [
        float(np.max(np.abs(per_layer_j[i] - collect[i].numpy())))
        for i in range(cfg.num_layers)
    ]

    from csm_tpu.models.csm import backbone_forward

    h_final_j = np.asarray(
        jax.jit(
            lambda p, t, m: backbone_forward(p, args, t, m, compute_dtype=jnp.float32)
        )(params, jnp.asarray(tokens.astype(np.int32)), jnp.asarray(mask))
    )
    c0_j = h_final_j[:, -1] @ np.asarray(params["codebook0_head"], np.float32)
    scale = max(float(np.max(np.abs(h_final_t.numpy()))), 1e-9)
    final_diff = float(np.max(np.abs(h_final_j - h_final_t.numpy()))) / scale
    c0_scale = max(float(np.max(np.abs(c0_t))), 1e-9)
    c0_diff = float(np.max(np.abs(c0_j - c0_t))) / c0_scale

    tol = 2e-3  # relative, f32 across two matmul stacks
    rel_layers = [d / scale for d in layer_diffs]
    return {
        "pass": embed_diff < 1e-5
        and max(rel_layers) < tol
        and final_diff < tol
        and c0_diff < tol,
        "embed_max_abs_diff": embed_diff,
        "per_layer_rel_diff": rel_layers,
        "final_hidden_rel_diff": final_diff,
        "c0_logits_rel_diff": c0_diff,
        "c0_logits": c0_j[0],  # reused by the sampling check
    }


def check_csm_frames(state, params, args, n_frames=3) -> dict:
    """Greedy multi-frame parity: torch full-recompute oracle vs the JAX
    cached incremental decode (the production path)."""
    import torch

    from torch_oracle import OracleCSM

    from csm_tpu.models.generation import generate_audio_tokens

    oracle = OracleCSM(state, args)
    K = args.audio_num_codebooks
    tokens, mask = _prompt(args)

    # oracle: frame-by-frame full recompute with feedback
    t_tok = torch.from_numpy(tokens)
    t_msk = torch.from_numpy(mask)
    oracle_frames = []
    with torch.no_grad():
        for _ in range(n_frames):
            frame = oracle.generate_frame_argmax(t_tok, t_msk)  # (1, K)
            oracle_frames.append(frame[0].numpy())
            row = torch.zeros(1, 1, K + 1, dtype=torch.int64)
            row[0, 0, :K] = frame[0]
            mrow = torch.zeros(1, 1, K + 1, dtype=torch.bool)
            mrow[0, 0, :K] = True
            t_tok = torch.cat([t_tok, row], dim=1)
            t_msk = torch.cat([t_msk, mrow], dim=1)
    oracle_frames = np.stack(oracle_frames)

    S = tokens.shape[1]
    res = jax.jit(
        lambda p, k: generate_audio_tokens(
            p, args, k, jnp.asarray(tokens.astype(np.int32)), jnp.asarray(mask),
            jnp.full((1,), S, jnp.int32), max_frames=n_frames,
            temperature=1.0, topk=1, compute_dtype=jnp.float32,
        )
    )(params, jax.random.key(0))
    got = np.asarray(res.frames)[0]
    n = int(res.num_frames[0])
    # compare up to the EOS point (greedy EOS must agree too)
    cmp = min(n if n else n_frames, n_frames)
    match = float(np.mean(got[:cmp] == oracle_frames[:cmp])) if cmp else 1.0
    return {
        "pass": match == 1.0,
        "frames_compared": cmp,
        "token_match_rate": match,
    }


def check_sampling(c0_logits: np.ndarray, topk=50, temperature=0.9) -> dict:
    """Distribution parity on real logits: JAX sampler vs analytic top-k
    distribution, and vs a torch exponential-race reference sampler."""
    import torch

    from csm_tpu.utils.token_analyzer import analyze_sampler, histogram, \
        distribution_similarity

    res = analyze_sampler(c0_logits, topk=topk, temperature=temperature,
                          n_samples=4096)

    # torch reference: the reference's sample_topk semantics
    # (src/csm/models/model.py:79-96)
    lt = torch.from_numpy(np.asarray(c0_logits, np.float32)) / temperature
    vals, idx = torch.topk(lt, topk)
    masked = torch.full_like(lt, float("-inf")).scatter(-1, idx, vals)
    probs = torch.softmax(masked, dim=-1)
    g = torch.Generator().manual_seed(0)
    q = torch.empty_like(probs).exponential_(1.0, generator=g)
    draws = []
    for _ in range(4096):
        q.exponential_(1.0, generator=g)
        draws.append(int(torch.argmax(probs / q, dim=-1)))
    ht = histogram(np.asarray(draws), c0_logits.shape[-1])
    from csm_tpu.ops.sampling import topk_probs

    analytic = np.asarray(topk_probs(jnp.asarray(c0_logits), topk, temperature))
    torch_sim = distribution_similarity(ht, analytic / analytic.sum())

    return {
        "pass": res["similarity"] > 0.95 and torch_sim > 0.95,
        "jax_vs_analytic_similarity": res["similarity"],
        "torch_vs_analytic_similarity": torch_sim,
        "top10_overlap": res["top10_overlap"],
    }


def check_int8(params, args) -> dict:
    """Quantization quality (int8 AND grouped int4): c0 softmax KL vs
    bf16 and greedy frame-token agreement."""
    from csm_tpu.models.csm import backbone_forward
    from csm_tpu.models.generation import generate_audio_tokens
    from csm_tpu.utils.quantize import (quantize_csm_params,
                                        quantize_csm_params_int4)

    tokens, mask = _prompt(args)
    S = tokens.shape[1]
    bf16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if hasattr(x, "astype") else x, params
    )
    q8 = jax.jit(quantize_csm_params)(bf16)
    q4 = jax.jit(quantize_csm_params_int4)(bf16)
    # mixed precision: decoder-only int8 (csm-generate --int8-decoder).
    # Its c0 KL is 0 by construction (backbone + c0 head untouched);
    # the quantization exposure is the acoustic codebooks, measured by
    # the greedy frame-token match below.
    qd = jax.jit(
        lambda p: quantize_csm_params(p, components=("decoder",))
    )(bf16)

    def c0_probs(p, dt):
        h = jax.jit(
            lambda p, t, m: backbone_forward(p, args, t, m, compute_dtype=dt)
        )(p, jnp.asarray(tokens.astype(np.int32)), jnp.asarray(mask))
        head = p["codebook0_head"]
        if isinstance(head, dict):
            logits = (h[:, -1].astype(jnp.float32) @ head["w8"].astype(jnp.float32)
                      ) * head["scale"].astype(jnp.float32)
        else:
            logits = h[:, -1].astype(jnp.float32) @ head.astype(jnp.float32)
        return np.asarray(jax.nn.softmax(logits, axis=-1))[0].astype(np.float64)

    p_bf16 = c0_probs(bf16, jnp.bfloat16)

    def kl_vs_bf16(qp):
        p_q = c0_probs(qp, jnp.bfloat16)
        nz = (p_bf16 > 1e-12) & (p_q > 1e-12)
        return float(np.sum(p_bf16[nz] * np.log(p_bf16[nz] / p_q[nz])))

    kl = kl_vs_bf16(q8)
    kl4 = kl_vs_bf16(q4)

    def frames(p):
        res = jax.jit(
            lambda p, k: generate_audio_tokens(
                p, args, k, jnp.asarray(tokens.astype(np.int32)),
                jnp.asarray(mask), jnp.full((1,), S, jnp.int32), max_frames=3,
                temperature=1.0, topk=1, compute_dtype=jnp.bfloat16,
            )
        )(p, jax.random.key(0))
        return np.asarray(res.frames)[0]

    f_bf16, f_int8, f_int4 = frames(bf16), frames(q8), frames(q4)
    f_intd = frames(qd)
    greedy_match = float(np.mean(f_bf16 == f_int8))
    greedy_match4 = float(np.mean(f_bf16 == f_int4))
    greedy_matchd = float(np.mean(f_bf16 == f_intd))
    # decoder-only: the c0 column must agree exactly (same backbone)
    c0_exact_decoder_only = bool(np.array_equal(f_bf16[:1, 0], f_intd[:1, 0]))
    return {
        # quantization is lossy by design: the bar is a small KL and
        # mostly-agreeing greedy tokens, not exactness.  int4's grouped
        # scales bound its KL higher than int8's — the PROMOTION RULE for
        # either mode (csm_tpu/serving.py header) stays: KL < 0.01 nats
        # AND greedy match >= 0.95 measured on the REAL checkpoint.
        # int8-decoder's rule needs only the greedy half (its c0 KL is
        # structurally 0 until acoustic feedback diverges a trajectory).
        "pass": kl < 0.1 and c0_exact_decoder_only,
        "c0_softmax_kl_bf16_vs_int8": kl,
        "greedy_token_match": greedy_match,
        "c0_softmax_kl_bf16_vs_int4": kl4,
        "greedy_token_match_int4": greedy_match4,
        "greedy_token_match_int8_decoder": greedy_matchd,
        "c0_frame0_exact_int8_decoder": c0_exact_decoder_only,
    }


def check_mimi(mimi_path, synthetic: bool) -> dict:
    """Encode/decode parity vs transformers.MimiModel on the same weights."""
    import torch
    import transformers as tx

    from csm_tpu.codec import mimi as jmimi
    from csm_tpu.codec.convert import convert_mimi_state_dict
    from csm_tpu.codec.transformer import MimiTransformerConfig

    if synthetic:
        torch.manual_seed(0)
        cfg_t = tx.MimiConfig(num_hidden_layers=2)
        tm = tx.MimiModel(cfg_t).eval()
        state = tm.state_dict()
        n_layers = 2
        cfg_j = jmimi.MimiConfig(transformer=MimiTransformerConfig(num_layers=2))
    else:
        cfg_t = tx.MimiConfig()
        tm = tx.MimiModel(cfg_t).eval()
        if mimi_path.endswith(".safetensors"):
            from safetensors.torch import load_file

            state = load_file(mimi_path)
        else:
            state = torch.load(mimi_path, map_location="cpu", weights_only=True)
        tm.load_state_dict(state)
        n_layers = cfg_t.num_hidden_layers
        cfg_j = jmimi.MimiConfig()

    params = jax.tree.map(
        jnp.asarray, convert_mimi_state_dict({k: v for k, v in state.items()},
                                             num_layers=n_layers)
    )
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((1, 48000)) * 0.1).astype(np.float32)
    with torch.no_grad():
        codes_t = tm.encode(torch.from_numpy(audio)[:, None, :]).audio_codes.numpy()
    codes_j = np.asarray(
        jax.jit(jmimi.mimi_encode, static_argnames=("cfg",))(
            params, jnp.asarray(audio), cfg_j
        )
    )
    enc_match = float((codes_j == codes_t).mean())

    codes = rng.integers(0, cfg_j.codebook_size, (1, 32, 25)).astype(np.int64)
    with torch.no_grad():
        audio_t = tm.decode(torch.from_numpy(codes)).audio_values.numpy()[0, 0]
    audio_j = np.asarray(
        jax.jit(jmimi.mimi_decode, static_argnames=("cfg",))(
            params, jnp.asarray(codes), cfg_j
        )
    )[0]
    scale = max(float(np.max(np.abs(audio_t))), 1e-9)
    dec_diff = float(np.max(np.abs(audio_j - audio_t))) / scale
    return {
        "pass": enc_match > 0.99 and dec_diff < 5e-3,
        "encode_code_match_rate": enc_match,
        "decode_rel_max_diff": dec_diff,
    }


def check_watermark(ckpt_dir) -> dict:
    """Real weights: full encode → phase-shift decode → verify roundtrip.

    Synthetic: random-init CNNs are untrained, so the roundtrip cannot
    succeed by construction — instead validate (a) the encode path's SDR
    contract and (b) the full decode PROTOCOL (tiling, phase-shift grid,
    mode voting, bit reassembly) with the CNN bypassed, exactly like
    tests/test_watermarking.py does."""
    from csm_tpu.watermarking import (
        CSM_1B_GH_WATERMARK,
        load_watermarker,
        verify,
        watermark,
    )

    w = load_watermarker(ckpt_dir)
    rng = np.random.default_rng(0)
    sr = 24_000
    t = np.arange(2 * sr) / sr
    audio = (
        0.3 * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.standard_normal(2 * sr)
    ).astype(np.float32)
    out, out_sr = watermark(w, audio, sr)
    # achieved SDR of the perturbation
    from csm_tpu.data.audio import resample

    ref = resample(audio, sr, out_sr) if out_sr != sr else audio
    n = min(len(ref), len(out))
    noise = out[:n] - ref[:n]
    sdr = 10 * math.log10(
        float(np.mean(ref[:n] ** 2)) / max(float(np.mean(noise**2)), 1e-12)
    )
    res: dict = {"achieved_sdr_db": sdr, "key": CSM_1B_GH_WATERMARK}

    if ckpt_dir is not None:
        ok = verify(w, out, out_sr)
        clean = verify(w, audio, sr)
        # robustness under the distortions real audio picks up
        # (reference decodes with a phase-shift search for exactly this):
        resampled = resample(resample(out, out_sr, 16_000), 16_000, out_sr)
        cropped = out[int(0.37 * out_sr) :]
        scaled = (out * 0.7).astype(np.float32)
        res.update(
            {
                "pass": ok and not clean and 25.0 < sdr < 45.0,
                "verify_watermarked": bool(ok),
                "verify_clean_audio": bool(clean),
                "verify_after_resample_16k": bool(verify(w, resampled, out_sr)),
                "verify_after_crop_0.37s": bool(verify(w, cropped, out_sr)),
                "verify_after_gain_0.7": bool(verify(w, scaled, out_sr)),
            }
        )
        return res

    # synthetic: protocol-level decode check with the CNN bypassed
    from csm_tpu.watermarking.watermarker import bytes_to_symbols, tile_message
    import jax.numpy as jnp_

    sym = bytes_to_symbols(CSM_1B_GH_WATERMARK)

    def fake_decode(params, y_shifts):
        S = y_shifts.shape[0]
        tiled = tile_message(sym, w.message_dim, 4096)
        return jnp_.asarray(np.repeat(tiled[None], S, axis=0))

    w._decode_frames = fake_decode
    proto_ok = verify(w, out, out_sr)
    res.update(
        {
            "pass": proto_ok and 25.0 < sdr < 45.0,
            "decode_protocol_ok": bool(proto_ok),
            "note": "random-init CNNs are untrained; full encode->decode "
            "roundtrip requires the sony/silentcipher checkpoints "
            "(--silentcipher-dir)",
        }
    )
    return res


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Validate real CSM/Mimi/SilentCipher checkpoints against "
        "torch oracles in one shot"
    )
    p.add_argument("--csm-ckpt", default=None, help="sesame/csm-1b ckpt.pt")
    p.add_argument("--mimi-ckpt", default=None,
                   help="kyutai/mimi model.safetensors (or torch .bin)")
    p.add_argument("--silentcipher-dir", default=None,
                   help="dir with enc_c.ckpt/dec_c.ckpt/dec_m_0.ckpt")
    p.add_argument("--tokenizer", default="meta-llama/Llama-3.2-1B")
    p.add_argument("--flavor", choices=("tiny", "1b"), default=None,
                   help="model shape; default tiny for synthetic, 1b for a "
                        "real --csm-ckpt")
    p.add_argument("--report", default=None, help="write JSON report here")
    p.add_argument("--skip", nargs="*", default=[],
                   choices=["tokenizer", "csm", "sampling", "int8", "mimi",
                            "watermark"])
    args_ns = p.parse_args(argv)

    import torch

    from torch_oracle import make_random_state_dict

    from csm_tpu.models.config import csm_1b_args, tiny_test_args
    from csm_tpu.utils.checkpoint_compat import convert_torch_state_dict

    flavor = args_ns.flavor or ("1b" if args_ns.csm_ckpt else "tiny")
    margs = csm_1b_args() if flavor == "1b" else tiny_test_args()

    report: dict = {"flavor": flavor, "synthetic": {}}
    t0 = time.time()

    def run(name, fn, *a, **kw):
        # "--skip csm" covers every csm_* stage (csm_layerwise, csm_frames)
        if name in args_ns.skip or name.split("_")[0] in args_ns.skip:
            report[name] = {"pass": None, "skipped": True}
            log(f"[skip] {name}")
            return None
        t = time.time()
        try:
            r = fn(*a, **kw)
        except Exception as e:  # a failed check must not kill the report
            import traceback

            r = {"pass": False, "error": f"{type(e).__name__}: {e}",
                 "traceback": traceback.format_exc(limit=4)}
        r["seconds"] = round(time.time() - t, 2)
        printable = {k: v for k, v in r.items()
                     if not isinstance(v, np.ndarray) and k != "traceback"}
        status = {True: "PASS", False: "FAIL", None: "WARN"}[r.get("pass")]
        log(f"[{status}] {name}: {json.dumps(printable, default=str)}")
        report[name] = r
        return r

    run("tokenizer", check_tokenizer, args_ns.tokenizer)

    need_csm_params = not {"csm", "sampling", "int8"} <= set(args_ns.skip)
    if need_csm_params:
        if args_ns.csm_ckpt:
            state = torch.load(args_ns.csm_ckpt, map_location="cpu",
                               weights_only=True)
            state = {k: v.float() for k, v in state.items()}
            report["synthetic"]["csm"] = False
        else:
            state = make_random_state_dict(margs, seed=0)
            report["synthetic"]["csm"] = True
        params = jax.tree.map(
            jnp.asarray, convert_torch_state_dict(state, margs)
        )

        lw = run("csm_layerwise", check_csm_layerwise, state, params, margs)
        run("csm_frames", check_csm_frames, state, params, margs)
        if lw is not None and "c0_logits" in lw:
            run("sampling", check_sampling, lw.pop("c0_logits"))
        run("int8", check_int8, params, margs)

    report["synthetic"]["mimi"] = args_ns.mimi_ckpt is None
    run("mimi", check_mimi, args_ns.mimi_ckpt, args_ns.mimi_ckpt is None)
    report["synthetic"]["watermark"] = args_ns.silentcipher_dir is None
    run("watermark", check_watermark, args_ns.silentcipher_dir)

    report["total_seconds"] = round(time.time() - t0, 2)
    checks = [v for k, v in report.items()
              if isinstance(v, dict) and "pass" in v]
    n_pass = sum(1 for c in checks if c["pass"])
    n_run = sum(1 for c in checks if c["pass"] is not None)
    report["summary"] = f"{n_pass}/{n_run} checks passed"
    log(f"\n=== {report['summary']} in {report['total_seconds']}s "
        f"(flavor={flavor}, synthetic={report['synthetic']}) ===")

    if args_ns.report:
        def clean(o):
            if isinstance(o, dict):
                return {k: clean(v) for k, v in o.items()
                        if not isinstance(v, np.ndarray)}
            if isinstance(o, (np.floating, np.integer)):
                return o.item()
            return o

        with open(args_ns.report, "w") as f:
            json.dump(clean(report), f, indent=2, default=str)
        log(f"report written to {args_ns.report}")

    return 0 if n_pass == n_run else 1


if __name__ == "__main__":
    sys.exit(main())
