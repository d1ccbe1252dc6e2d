#!/usr/bin/env bash
# Minimal LoRA fine-tune: one speaker, default adapters (q_proj, v_proj).
# Usage: bash examples/basic_finetuning.sh <audio_dir> [out_dir]
# (reference workflow: examples/basic_finetuning.sh)
set -euo pipefail
AUDIO_DIR="${1:?usage: basic_finetuning.sh <audio_dir> [out_dir]}"
OUT="${2:-./lora_basic}"

csm-finetune-lora \
  --audio-dir "$AUDIO_DIR" \
  --output-dir "$OUT" \
  --speaker-id 0 \
  --lora-r 8 --lora-alpha 16 \
  --batch-size 2 --epochs 3 \
  --save-mode lora \
  --generate-samples --sample-prompt "Hello, this is my fine-tuned voice."
