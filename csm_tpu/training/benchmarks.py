"""Benchmark harnesses: LoRA config sweep + TPU stack benchmark.

Capability equivalent of the reference benchmark suites:
  * ``run_lora_benchmark`` — rank × module-set × batch × seq grid with
    step-time / parameter-efficiency results and a markdown report with
    top-N tables (src/csm/training/benchmark_lora.py:27-599,
    run_lora_benchmark.py:204-524);
  * ``run_stack_benchmark`` — model init, optimizer prep, forward, train
    step, tokens/s, generation frames/s + RTF, checkpoint I/O timing
    (src/csm/training/run_mlx_benchmark.py:313-498).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from csm_tpu.models.config import ModelArgs, tiny_test_args
from csm_tpu.models.csm import init_csm_params
from csm_tpu.training import lora as lora_mod
from csm_tpu.training.losses import Batch
from csm_tpu.training.optimizer import init_train_state, make_lora_optimizer, make_optimizer
from csm_tpu.training.train_step import make_lora_train_step, make_train_step
from csm_tpu.utils.observability import hbm_stats


@dataclasses.dataclass
class BenchmarkConfig:
    """One LoRA sweep point (reference: benchmark_lora.py:27-78)."""

    lora_r: int = 8
    target_modules: tuple = ("q_proj", "v_proj")
    batch_size: int = 2
    seq_len: int = 64
    steps: int = 5

    @property
    def name(self) -> str:
        mods = "+".join(m.replace("_proj", "") for m in self.target_modules)
        return f"r{self.lora_r}_{mods}_b{self.batch_size}_s{self.seq_len}"


def make_mock_batch(args: ModelArgs, B: int, T: int, seed: int = 0) -> Batch:
    """Synthetic batch (reference: run_lora_benchmark.py:175)."""
    rng = np.random.default_rng(seed)
    K = args.audio_num_codebooks
    tokens = np.zeros((B, T, K + 1), np.int32)
    mask = np.zeros((B, T, K + 1), bool)
    targets = np.zeros((B, T, K), np.int32)
    tmask = np.zeros((B, T), bool)
    t0 = T // 4
    tokens[:, :t0, -1] = rng.integers(1, args.text_vocab_size, (B, t0))
    mask[:, :t0, -1] = True
    audio = rng.integers(0, args.audio_vocab_size, (B, T - t0, K))
    tokens[:, t0:, :K] = audio
    mask[:, t0:, :K] = True
    targets[:, t0 - 1 : T - 1] = audio
    tmask[:, t0 - 1 : T - 1] = True
    return Batch(jnp.asarray(tokens), jnp.asarray(mask), jnp.asarray(targets),
                 jnp.asarray(tmask))


def peak_tflops_per_device(dtype="bf16") -> float:
    """Advertised peak matmul TFLOP/s of the attached device (the MFU
    denominator).  Unknown kinds fall back to v5e's 197 bf16 TFLOP/s."""
    kind = jax.devices()[0].device_kind.lower()
    bf16 = 197.0  # v5e default
    table = {
        "v5 lite": 197.0, "v5lite": 197.0, "v5e": 197.0,
        "v4": 275.0,
        "v5p": 459.0, "v5": 459.0,
        "v6 lite": 918.0, "v6e": 918.0,
    }
    for k, v in table.items():
        if k in kind:
            bf16 = v
            break
    return bf16 * (2.0 if dtype == "int8" else 1.0)


def train_flops_per_step(
    args: ModelArgs,
    batch_size: int,
    seq_len: int,
    lora: bool = False,
    amortization_ratio: int = 16,
) -> float:
    """Analytic MODEL FLOPs of one training step (the MFU numerator).

    Counts matmul FLOPs only (2*M*N*K per matmul; elementwise/gather work
    is bandwidth, not MXU flops), fwd + backward:

      * full fine-tune: backward = dX + dW = 2x forward -> 3x fwd total
        (the standard 6N-per-token accounting);
      * LoRA: frozen base skips dW -> 2x fwd total on base matmuls
        (adapter matmuls are negligible at r<=64).

    Model FLOPs deliberately EXCLUDE remat recompute — MFU measures
    useful work, so remat shows up as lower MFU, matching the standard
    definition (PaLM appendix B).  Causal attention is counted at T/2.
    """
    B, T, K = batch_size, seq_len, args.audio_num_codebooks

    def layer_matmul(cfg):
        E, I = cfg.embed_dim, cfg.intermediate_dim
        qd = cfg.num_heads * cfg.head_dim
        kvd = cfg.num_kv_heads * cfg.head_dim
        return E * qd + 2 * E * kvd + qd * E + 3 * E * I

    bb, dec = args.backbone, args.decoder
    bwd_mult = 2.0 if lora else 3.0

    # backbone: matmuls per token + causal attention (scores + AV)
    fwd = B * T * bb.num_layers * layer_matmul(bb)
    attn = B * bb.num_layers * (T * (T / 2) * bb.num_heads * bb.head_dim * 2)
    # c0 head over every position
    fwd += B * T * bb.embed_dim * args.audio_vocab_size
    total = 2.0 * (fwd + attn) * bwd_mult

    # amortized acoustic decoder: n_sub frames x K positions
    n_sub = max(1, (B * T) // amortization_ratio)
    dfwd = n_sub * K * dec.num_layers * layer_matmul(dec)
    dfwd += n_sub * K * bb.embed_dim * dec.embed_dim  # projection
    dfwd += n_sub * (K - 1) * dec.embed_dim * args.audio_vocab_size  # heads
    dattn = n_sub * dec.num_layers * K * (K / 2) * dec.num_heads * dec.head_dim * 2
    total += 2.0 * (dfwd + dattn) * bwd_mult
    return total


def _timed_steps(step_fn, state, extra, batch, n_steps: int):
    # warmup/compile
    state, m = step_fn(state, *extra, jax.random.key(0), batch)
    jax.block_until_ready(m["loss"])
    t0 = time.time()
    for i in range(n_steps):
        state, m = step_fn(state, *extra, jax.random.key(i + 1), batch)
    # scalar fetch, not block_until_ready: under the axon tunnel the
    # latter can return before chained dispatches finish (see
    # scripts/bench_train_flash.py) — a host fetch always forces
    # completion of the full state chain
    float(m["loss"])
    return (time.time() - t0) / n_steps, state


def run_lora_benchmark(
    args: Optional[ModelArgs] = None,
    ranks: Sequence[int] = (4, 8, 16),
    module_sets: Sequence[tuple] = (("q_proj", "v_proj"), ("q_proj", "k_proj", "v_proj", "o_proj")),
    batch_sizes: Sequence[int] = (2,),
    seq_lens: Sequence[int] = (64,),
    steps: int = 5,
    compute_dtype=jnp.bfloat16,
    int8_base: bool = False,
) -> List[dict]:
    """Sweep LoRA configs; returns result dicts
    (step time, tokens/s, trainable params, efficiency).

    ``int8_base`` benchmarks the QLoRA-style mode (frozen base stored
    int8, csm_tpu/utils/quantize.py) — the single-chip 8B config."""
    args = args or tiny_test_args()
    params = jax.jit(lambda: init_csm_params(jax.random.key(0), args, jnp.float32))()
    base_count = lora_mod.count_params(params)
    if int8_base:
        from csm_tpu.utils.quantize import quantize_csm_params

        params = jax.jit(quantize_csm_params)(params)

    results = []
    for r in ranks:
        for mods in module_sets:
            for B in batch_sizes:
                for T in seq_lens:
                    cfg = BenchmarkConfig(r, tuple(mods), B, T, steps)
                    lcfg = lora_mod.LoRAConfig(r=r, target_modules=tuple(mods))
                    lora = lora_mod.init_lora_params(jax.random.key(1), args, lcfg)
                    tx = make_lora_optimizer(1e-4)
                    state = init_train_state(lora, tx)
                    step = make_lora_train_step(
                        args, tx, lcfg.scaling, compute_dtype=compute_dtype
                    )
                    dt, _ = _timed_steps(
                        step, state, (params,), make_mock_batch(args, B, T), steps
                    )
                    n_lora = lora_mod.count_params(lora)
                    mem = hbm_stats()
                    flops = train_flops_per_step(args, B, T, lora=True)
                    results.append({
                        "name": cfg.name,
                        "lora_r": r,
                        "target_modules": list(mods),
                        "batch_size": B,
                        "seq_len": T,
                        "step_time_s": round(dt, 5),
                        "tokens_per_s": round(B * T / dt, 1),
                        "mfu_pct": round(
                            100 * flops / dt / (peak_tflops_per_device() * 1e12), 2
                        ),
                        "trainable_params": n_lora,
                        "param_efficiency_pct": round(100 * n_lora / base_count, 4),
                        **mem,
                    })
    return results


def generate_lora_report(results: List[dict], path: Optional[str] = None) -> str:
    """Markdown report with top-5 tables
    (reference: benchmark_lora.py:203-402)."""
    by_speed = sorted(results, key=lambda r: r["step_time_s"])[:5]
    by_eff = sorted(results, key=lambda r: r["param_efficiency_pct"])[:5]

    def table(rows):
        head = ("| config | step time (s) | tokens/s | trainable params | % of base |\n"
                "|---|---|---|---|---|\n")
        return head + "".join(
            f"| {r['name']} | {r['step_time_s']} | {r['tokens_per_s']} "
            f"| {r['trainable_params']:,} | {r['param_efficiency_pct']} |\n"
            for r in rows
        )

    md = (
        "# LoRA Benchmark Report\n\n"
        f"device: {jax.devices()[0]}\n\n"
        "## Top 5 by step time\n\n" + table(by_speed) +
        "\n## Top 5 by parameter efficiency\n\n" + table(by_eff) +
        "\n## All results\n\n" + table(sorted(results, key=lambda r: r["name"]))
    )
    if path:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            f.write(md)
        with open(os.path.splitext(path)[0] + ".json", "w") as f:
            json.dump(results, f, indent=2)
    return md


def run_stack_benchmark(
    args: Optional[ModelArgs] = None,
    batch_size: int = 2,
    seq_len: int = 64,
    gen_frames: int = 25,
    steps: int = 5,
    compute_dtype=jnp.bfloat16,
    param_dtype=jnp.float32,
    ckpt_io: bool = True,
) -> dict:
    """Timing of every stage of the stack
    (reference: run_mlx_benchmark.py:313-498).

    The train-step stage auto-selects full-parameter AdamW when the train
    state fits the chip, else the LoRA step: at f32 CSM-1B full fine-tune
    needs ~17.6 GB (params + Adam moments + transient grads) — more than
    one 16 GB v5e; that case is what ``--fsdp`` / ``--pipeline-parallel``
    exist for (docs/architecture.md).

    ``param_dtype`` — master-weight dtype.  f32 matches random init; bf16
    matches fine-tuning FROM the released bf16 checkpoint (the trainer
    keeps the loaded dtype), where full-parameter AdamW fits one chip."""
    from csm_tpu.models.generation import generate_audio_tokens

    args = args or tiny_test_args()
    out = {
        "device": str(jax.devices()[0]),
        "param_dtype": str(jnp.dtype(param_dtype)),
    }

    t0 = time.time()
    params = jax.jit(lambda: init_csm_params(jax.random.key(0), args, param_dtype))()
    jax.block_until_ready(params["audio_head"])
    out["model_init_s"] = round(time.time() - t0, 3)

    batch = make_mock_batch(args, batch_size, seq_len)

    # forward (loss only; batch passed as an argument so it is NOT baked
    # into the executable as a constant)
    from csm_tpu.training.losses import compute_loss

    fwd = jax.jit(lambda p, k, b: compute_loss(p, args, k, b,
                                               compute_dtype=compute_dtype)[0])
    fwd(params, jax.random.key(0), batch).block_until_ready()
    t0 = time.time()
    for i in range(steps):
        v = fwd(params, jax.random.key(i), batch)
    v.block_until_ready()
    out["forward_s"] = round((time.time() - t0) / steps, 5)

    # train step: full-FT if params + 2 Adam moments + transient grads
    # fit the device, else adapter-only (the single-chip training config)
    params_bytes = sum(x.nbytes for x in jax.tree.leaves(params))
    try:
        limit = jax.local_devices()[0].memory_stats()["bytes_limit"]
    except Exception:
        limit = 16 * 1024**3
    full_fits = 4.3 * params_bytes < limit  # params + m + v + grads + slack
    if full_fits:
        out["train_mode"] = "full"
        t0 = time.time()
        tx = make_optimizer(params, learning_rate=1e-4)
        state = init_train_state(jax.tree.map(jnp.array, params), tx)
        out["optimizer_prep_s"] = round(time.time() - t0, 3)
        step = make_train_step(args, tx, compute_dtype=compute_dtype,
                               remat=seq_len > 256)
        dt, state = _timed_steps(step, state, (), batch, steps)
    else:
        out["train_mode"] = (
            "lora (full-FT state exceeds single-chip HBM; use "
            "--fsdp/--pipeline-parallel for full fine-tune)"
        )
        lcfg = lora_mod.LoRAConfig()
        lora = lora_mod.init_lora_params(jax.random.key(1), args, lcfg)
        t0 = time.time()
        tx = make_lora_optimizer(1e-4)
        state = init_train_state(lora, tx)
        out["optimizer_prep_s"] = round(time.time() - t0, 3)
        step = make_lora_train_step(
            args, tx, lcfg.scaling, compute_dtype=compute_dtype,
            remat=seq_len > 256,
        )
        dt, state = _timed_steps(step, state, (params,), batch, steps)
    out["train_step_s"] = round(dt, 5)
    out["train_tokens_per_s"] = round(batch_size * seq_len / dt, 1)
    # MFU: analytic model FLOPs (train_flops_per_step; excludes remat
    # recompute) over the device's advertised bf16 peak
    flops = train_flops_per_step(
        args, batch_size, seq_len, lora=not full_fits
    )
    peak = peak_tflops_per_device()
    out["train_model_tflops_per_s"] = round(flops / dt / 1e12, 1)
    out["train_mfu_pct"] = round(100 * flops / dt / (peak * 1e12), 2)
    out["peak_tflops_assumed"] = peak
    out.update(hbm_stats())

    # generation
    K = args.audio_num_codebooks
    toks = jnp.zeros((1, 16, K + 1), jnp.int32).at[:, :, -1].set(3)
    msk = jnp.zeros((1, 16, K + 1), bool).at[:, :, -1].set(True)
    gen = jax.jit(lambda p, k: generate_audio_tokens(
        p, args, k, toks, msk, jnp.full((1,), 16, jnp.int32),
        max_frames=gen_frames, temperature=0.9, topk=50,
        compute_dtype=compute_dtype,
    ))
    jax.block_until_ready(gen(params, jax.random.key(0)).frames)
    t0 = time.time()
    res = gen(params, jax.random.key(1))
    jax.block_until_ready(res.frames)
    gen_dt = time.time() - t0
    out["gen_frames_per_s"] = round(gen_frames / gen_dt, 1)
    out["gen_rtf"] = round(gen_frames / 12.5 / gen_dt, 2)

    # checkpoint I/O (model params, comparable across train modes) —
    # skippable: on a tunnel-attached host the full-size device↔host
    # round-trip dominates the whole benchmark's wall time
    if ckpt_io:
        import tempfile

        from csm_tpu.training import checkpoint as ckpt
        from csm_tpu.training.optimizer import TrainState

        ck_state = TrainState(params=params, opt_state=None, step=jnp.int32(0))
        with tempfile.TemporaryDirectory() as d:
            t0 = time.time()
            ckpt.save_checkpoint(d, "bench", ck_state, args)
            out["ckpt_save_s"] = round(time.time() - t0, 3)
            t0 = time.time()
            ckpt.load_checkpoint(os.path.join(d, "bench"))
            out["ckpt_load_s"] = round(time.time() - t0, 3)

    return out
