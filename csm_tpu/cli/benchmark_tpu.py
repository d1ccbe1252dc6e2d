"""``csm-benchmark-tpu`` — full-stack timing CLI
(capability equivalent of csm-benchmark-mlx,
src/csm/training/run_mlx_benchmark.py: model load, optimizer prep,
forward, train step, tokens/s, generation RTF, checkpoint I/O)."""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    from csm_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser(description="Benchmark the CSM TPU stack")
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--seq-len", type=int, default=64)
    p.add_argument("--gen-frames", type=int, default=25)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--full-size", action="store_true",
                   help="Benchmark CSM-1B instead of the tiny fixture")
    p.add_argument("--param-dtype", choices=["f32", "bf16"], default="f32",
                   help="Master-weight dtype: f32 (random init) or bf16 "
                        "(fine-tuning from the released bf16 checkpoint — "
                        "full-parameter AdamW then fits one chip)")
    p.add_argument("--no-ckpt", action="store_true",
                   help="skip the checkpoint save/load stage (dominates "
                        "wall time on tunnel-attached hosts)")
    p.add_argument("--output", type=str, default=None, help="JSON output path")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from csm_tpu.models.config import csm_1b_args, tiny_test_args
    from csm_tpu.training.benchmarks import run_stack_benchmark

    results = run_stack_benchmark(
        args=csm_1b_args() if args.full_size else tiny_test_args(),
        batch_size=args.batch_size,
        seq_len=args.seq_len,
        gen_frames=args.gen_frames,
        steps=args.steps,
        param_dtype=jnp.bfloat16 if args.param_dtype == "bf16" else jnp.float32,
        ckpt_io=not args.no_ckpt,
    )
    print(json.dumps(results, indent=2))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(results, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
