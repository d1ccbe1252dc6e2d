#!/usr/bin/env bash
# Build the native audio-loader kernels -> libcsm_audio.so
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libcsm_audio.so audio_kernels.cpp
echo "built $(pwd)/libcsm_audio.so"
