#!/usr/bin/env bash
# Full LoRA surface: wider targets, layer subset, accumulation, both save
# modes, alignment-driven segmentation.
# Usage: bash examples/advanced_finetuning.sh <audio_dir> [out_dir] [align_dir]
set -euo pipefail
AUDIO_DIR="${1:?usage: advanced_finetuning.sh <audio_dir> [out_dir] [align_dir]}"
OUT="${2:-./lora_advanced}"
ALIGN="${3:-}"

csm-finetune-lora \
  --audio-dir "$AUDIO_DIR" \
  ${ALIGN:+--alignment-dir "$ALIGN"} \
  --output-dir "$OUT" \
  --speaker-id 0 \
  --lora-r 16 --lora-alpha 32 \
  --target-modules q_proj k_proj v_proj o_proj \
  --target-layers 8 9 10 11 12 13 14 15 \
  --learning-rate 5e-5 \
  --accumulation-steps 4 --max-grad-norm 1.0 \
  --batch-size 2 --epochs 5 --val-every 50 --save-every 200 \
  --save-mode both \
  --generate-samples
