#!/usr/bin/env bash
# Production serving: shared voice presets + per-speaker adapters + HTTP.
#
# The deployment shape for real TTS traffic:
#   * a PREFIX per voice preset — the preset's context audio is
#     Mimi-encoded and backbone-prefilled ONCE at startup; every request
#     naming it seeds its slot from the cached KV (measured 2.22x
#     aggregate throughput under churn, BENCHMARKS.md);
#   * a LoRA ADAPTER per fine-tuned speaker, all served from one batched
#     program (multi-LoRA bank; requests pick by "adapter");
#   * --warmup compiles every serving program before traffic;
#   * the HTTP daemon exposes GET /health + Prometheus GET /metrics and
#     drains on SIGTERM.
#
# --tiny-test serves random tiny weights offline; swap in --model-path /
# --mimi-path (+ real adapter dirs from csm-finetune-lora-multi) for
# real checkpoints.
set -euo pipefail

OUT=${1:-preset_out}
mkdir -p "$OUT"

# a voice preset: context audio + transcript (here a synthetic tone)
python - <<'PY'
import json, numpy as np, sys
sys.path.insert(0, ".")
from csm_tpu.data.audio import save_wav
t = np.arange(24_000) / 24_000
save_wav("/tmp/preset_ctx.wav",
         (0.1 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), 24_000)
# short preset text keeps the demo inside --tiny-test's 128-token window;
# real presets can be minutes of audio (buckets up to max_seq_len)
json.dump({"context": [
    {"audio": "/tmp/preset_ctx.wav", "text": "hi", "speaker": 1},
]}, open("/tmp/preset_warm.json", "w"))
PY

cat > /tmp/preset_requests.jsonl <<'EOF'
{"id": "a", "text": "First line, warm preset.", "speaker": 1, "max_audio_length_ms": 2000, "prefix": "warm"}
{"id": "b", "text": "Second line, same context.", "speaker": 1, "max_audio_length_ms": 2000, "prefix": "warm"}
{"id": "c", "text": "Plain request, no preset.", "speaker": 0, "max_audio_length_ms": 2000}
EOF

csm-serve \
    --requests /tmp/preset_requests.jsonl \
    --output-dir "$OUT" \
    --prefix warm=/tmp/preset_warm.json \
    --warmup \
    --n-slots 2 \
    --no-watermark \
    --tiny-test

echo "wavs in $OUT/"

# The same flags compose with the HTTP daemon (requests carry
# "prefix"/"adapter" fields; /metrics is Prometheus text format):
#
#   csm-serve --http 8080 --n-slots 16 \
#       --prefix warm=/tmp/preset_warm.json --warmup \
#       --adapter alice=finetunes/alice --adapter bob=finetunes/bob &
#   curl -X POST localhost:8080/generate \
#        -d '{"text": "hi", "speaker": 1, "prefix": "warm", "adapter": "alice"}' \
#        -o hi.wav
#   curl localhost:8080/metrics
#   kill -TERM %1   # graceful drain
