#!/usr/bin/env bash
# Benchmark the stack, sweep LoRA configs, pick the fastest config.
# Usage: bash examples/benchmark_and_optimize.sh [out_dir]
set -euo pipefail
OUT="${1:-./benchmarks}"
mkdir -p "$OUT"

# full-stack timing (model init, train step, generation RTF, ckpt I/O)
csm-benchmark-tpu --steps 5 --output "$OUT/stack.json"

# LoRA rank x module-set sweep with markdown report
csm-benchmark-lora \
  --ranks 4 8 16 \
  --module-sets q_proj,v_proj q_proj,k_proj,v_proj,o_proj \
  --output "$OUT/lora_benchmark.md"

echo "reports in $OUT"
