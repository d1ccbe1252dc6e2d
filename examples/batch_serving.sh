#!/usr/bin/env bash
# Batch serving through the continuous-batching server (csm_tpu/serving.py).
#
# Every request shares ONE compiled decode: slots admit new work the moment
# a stream finishes (frame-level continuous batching), weights stream from
# HBM once per frame for the whole batch. Measured on one v5e chip:
# 537 frames/s aggregate bf16 / 638 frames/s int8 at 32-64 slots
# (BENCHMARKS.md "Batched serving").
#
# --tiny-test serves random tiny weights offline; swap in --model-path /
# --mimi-path for real checkpoints.
set -euo pipefail

OUT=${1:-served_out}

cat > /tmp/requests.jsonl <<'EOF'
{"id": "greeting", "text": "Hello there, welcome aboard.", "speaker": 0, "max_audio_length_ms": 4000}
{"id": "followup", "text": "Let me show you around the cabin.", "speaker": 1, "max_audio_length_ms": 5000}
{"id": "closing",  "text": "Enjoy the flight.", "speaker": 0, "max_audio_length_ms": 3000}
EOF

# weight-dtype auto: int8 weight-only quantization under the measured
# crossover (faster at every slot count we benchmarked), bf16 otherwise.
csm-serve \
    --requests /tmp/requests.jsonl \
    --output-dir "$OUT" \
    --n-slots 2 \
    --weight-dtype auto \
    --no-watermark \
    --tiny-test

echo "wavs in $OUT/"

# Streaming mode: per-request audio decodes incrementally while the batch
# is still being served (carried-state Mimi decode), each wav is written
# the moment its request finishes, and per-request first-audio latency is
# reported.
csm-serve \
    --requests /tmp/requests.jsonl \
    --output-dir "$OUT-streamed" \
    --n-slots 2 \
    --stream \
    --no-watermark \
    --tiny-test

echo "streamed wavs in $OUT-streamed/"
