#!/usr/bin/env bash
# Train, interrupt, resume from the latest checkpoint.
# Usage: bash examples/resume_finetuning.sh <audio_dir> [out_dir]
set -euo pipefail
AUDIO_DIR="${1:?usage: resume_finetuning.sh <audio_dir> [out_dir]}"
OUT="${2:-./lora_resume}"

# phase 1: a short run that leaves checkpoints behind
csm-finetune-lora --audio-dir "$AUDIO_DIR" --output-dir "$OUT" \
  --epochs 1 --save-every 50 --save-mode lora

# phase 2: resume from the latest checkpoint and continue
csm-finetune-lora --audio-dir "$AUDIO_DIR" --output-dir "$OUT" \
  --epochs 3 --save-every 50 --save-mode lora \
  --resume-from latest
