"""CSM-1B LoRA train step at S=2048: Pallas flash backward vs fallbacks.

Three configurations of the SAME jitted step (bf16 base, LoRA r=8 q+v):
  * pallas   — flash forward + Pallas dq/dkv backward kernels (default)
  * xla-bwd  — flash forward, backward recomputes through XLA reference
               attention (CSM_TPU_FLASH_XLA_BWD=1)
  * no-flash — XLA attention both ways (CSM_TPU_NO_FLASH=1)

Reports per mode: step time, tokens/s, and the compiled program's
temp-buffer footprint from XLA's memory_analysis (the activation HBM the
backward needs — memory_stats() is unavailable under the axon tunnel).
See BENCHMARKS.md "Flash attention".

Usage: python scripts/bench_train_flash.py [--batch-sizes 2 4] [--seq-len 2048]
"""
import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

from csm_tpu.models.config import csm_1b_args, tiny_test_args
from csm_tpu.models.csm import init_csm_params
from csm_tpu.training import lora as lora_mod
from csm_tpu.training.benchmarks import make_mock_batch
from csm_tpu.training.optimizer import init_train_state, make_lora_optimizer
from csm_tpu.training.train_step import make_lora_train_step

MODES = {
    "pallas": {},
    "xla-bwd": {"CSM_TPU_FLASH_XLA_BWD": "1"},
    "no-flash": {"CSM_TPU_NO_FLASH": "1"},
}
_MODE_VARS = ("CSM_TPU_FLASH_XLA_BWD", "CSM_TPU_NO_FLASH")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_mode(mode, args, base, lora0, tx, lcfg, B, T, steps, remat=False):
    for v in _MODE_VARS:
        os.environ.pop(v, None)
    os.environ.update(MODES[mode])
    # fresh closure per mode: the env gates are read at trace time
    step = make_lora_train_step(
        args, tx, lcfg.scaling, compute_dtype=jnp.bfloat16, remat=remat
    )
    state = init_train_state(jax.tree.map(jnp.array, lora0), tx)
    batch = make_mock_batch(args, B, T)
    key = jax.random.key(0)

    lowered = step.lower(state, base, key, batch)
    compiled = lowered.compile()
    mem = compiled.memory_analysis()
    rec = {"mode": mode, "batch": B, "seq_len": T, "remat": remat}
    if mem is not None:
        rec["temp_mib"] = round(mem.temp_size_in_bytes / 2**20, 1)
        rec["args_mib"] = round(mem.argument_size_in_bytes / 2**20, 1)

    state, m = compiled(state, base, key, batch)
    float(m["loss"])  # force completion to host
    # Time each step with a scalar host fetch: under the axon tunnel
    # block_until_ready on a chain of AOT dispatches returns before the
    # work finishes (measured ~1 ms/step for a 1B model — impossible);
    # fetching the loss scalar forces real completion.  The fetch adds
    # ~ms per step, so the reported time errs slightly conservative.
    best = 1e30
    for i in range(steps):
        t0 = time.time()
        state, m = compiled(state, base, jax.random.key(i + 1), batch)
        float(m["loss"])
        best = min(best, time.time() - t0)
    rec["step_time_s"] = round(best, 4)
    rec["tokens_per_s"] = round(B * T / best, 1)
    return rec


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tiny-test", action="store_true", help="tiny model, S=256")
    ap.add_argument("--seq-len", type=int, default=2048)
    ap.add_argument("--batch-sizes", type=int, nargs="+", default=[2])
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--modes", nargs="+", default=list(MODES), choices=list(MODES))
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize layers on the backward (bigger batch)")
    a = ap.parse_args()

    if a.tiny_test:
        import dataclasses

        base_args = tiny_test_args()
        args = dataclasses.replace(
            base_args,
            backbone_config=dataclasses.replace(base_args.backbone_config, max_seq_len=512),
            decoder_config=dataclasses.replace(base_args.decoder_config, max_seq_len=512),
        )
        T, batches = 256, [1]
    else:
        args, T, batches = csm_1b_args(), a.seq_len, a.batch_sizes

    base = jax.jit(lambda k: init_csm_params(k, args, jnp.bfloat16))(jax.random.key(0))
    jax.block_until_ready(base["audio_head"])
    lcfg = lora_mod.LoRAConfig(r=8, target_modules=("q_proj", "v_proj"))
    lora0 = lora_mod.init_lora_params(jax.random.key(1), args, lcfg)
    tx = make_lora_optimizer(1e-4)

    for B in batches:
        for mode in a.modes:
            try:
                rec = bench_mode(mode, args, base, lora0, tx, lcfg, B, T,
                                 a.steps, remat=a.remat)
            except Exception as e:  # OOM at this batch: report and continue
                msg = str(e)
                kind = "oom" if ("memory" in msg.lower() or "exhausted" in msg.lower()) else "error"
                rec = {"mode": mode, "batch": B, "seq_len": T, "error": kind,
                       "exc": type(e).__name__, "detail": msg[-400:]}
            print(json.dumps(rec), flush=True)
            log(rec)
    for v in _MODE_VARS:
        os.environ.pop(v, None)


if __name__ == "__main__":
    main()
