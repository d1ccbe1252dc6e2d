"""``csm-benchmark-lora`` — LoRA configuration sweep CLI
(capability equivalent of src/csm/cli: csm-benchmark-lora,
src/csm/training/run_lora_benchmark.py)."""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    from csm_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser(description="Benchmark LoRA configs on TPU")
    p.add_argument("--ranks", type=int, nargs="*", default=[4, 8, 16])
    p.add_argument(
        "--module-sets", type=str, nargs="*",
        default=["q_proj,v_proj", "q_proj,k_proj,v_proj,o_proj"],
        help="Comma-separated module lists",
    )
    p.add_argument("--batch-sizes", type=int, nargs="*", default=[2])
    p.add_argument("--seq-lens", type=int, nargs="*", default=[64])
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--full-size", action="store_true",
                   help="Benchmark CSM-1B instead of the tiny fixture")
    p.add_argument("--output", type=str, default="lora_benchmark.md")
    p.add_argument("--int8-base", action="store_true",
                   help="frozen base stored int8 (QLoRA-style; the "
                        "single-chip 8B fine-tune config)")
    args = p.parse_args(argv)

    from csm_tpu.models.config import csm_1b_args, tiny_test_args
    from csm_tpu.training.benchmarks import generate_lora_report, run_lora_benchmark

    results = run_lora_benchmark(
        args=csm_1b_args() if args.full_size else tiny_test_args(),
        ranks=args.ranks,
        module_sets=[tuple(s.split(",")) for s in args.module_sets],
        batch_sizes=args.batch_sizes,
        seq_lens=args.seq_lens,
        steps=args.steps,
        int8_base=args.int8_base,
    )
    md = generate_lora_report(results, args.output)
    print(md)
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
