#!/usr/bin/env bash
# Multi-speaker: one adapter per speaker from a speakers-config JSON.
# Usage: bash examples/multi_speaker_finetuning.sh [config] [out_dir]
set -euo pipefail
CONFIG="${1:-examples/speakers_config.json}"
OUT="${2:-./multi_speaker}"

csm-finetune-lora-multi \
  --speakers-config "$CONFIG" \
  --output-dir "$OUT" \
  --lora-r 8 --lora-alpha 16 \
  --batch-size 2 --epochs 3 \
  --save-mode lora \
  --generate-samples
