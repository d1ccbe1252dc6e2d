#!/usr/bin/env bash
# Tiny-dataset recipe: rank 4, q_proj only, more context turns so every
# utterance is reused as context for its neighbors.
# Usage: bash examples/low_resource_finetuning.sh <audio_dir> [out_dir]
set -euo pipefail
AUDIO_DIR="${1:?usage: low_resource_finetuning.sh <audio_dir> [out_dir]}"
OUT="${2:-./lora_low_resource}"

csm-finetune-lora \
  --audio-dir "$AUDIO_DIR" \
  --output-dir "$OUT" \
  --lora-r 4 --lora-alpha 8 \
  --target-modules q_proj \
  --context-turns 3 \
  --learning-rate 2e-4 \
  --batch-size 1 --epochs 10 --val-split 0 \
  --save-mode lora
