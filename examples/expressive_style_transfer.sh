#!/usr/bin/env bash
# Style transfer: capture an expressive style with a higher-rank adapter
# over every attention projection (style lives mostly in attention).
# Usage: bash examples/expressive_style_transfer.sh <style_audio_dir> [out_dir]
set -euo pipefail
AUDIO_DIR="${1:?usage: expressive_style_transfer.sh <style_audio_dir> [out_dir]}"
OUT="${2:-./lora_style}"

csm-finetune-lora \
  --audio-dir "$AUDIO_DIR" \
  --output-dir "$OUT" \
  --lora-r 32 --lora-alpha 64 \
  --target-modules q_proj k_proj v_proj o_proj \
  --learning-rate 8e-5 \
  --batch-size 2 --epochs 8 \
  --save-mode both \
  --generate-samples --sample-prompt "Let me tell you a story, in style!"
