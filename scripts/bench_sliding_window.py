"""Flat-RTF proof for sliding-window KV (round-4 verdict Missing #4).

A continuous single stream generates >= 10 minutes of audio (7500
frames) through a windowed server; per-segment decode rates show the
cost is FLAT — the KV stream is bounded by the window, not the session.
Without a window the same request is impossible (admission rejects
prompt + max_frames > max_seq_len) and decode slows as the cache grows
(83.5 -> 61.4 f/s from 2k -> 8k cache, BENCHMARKS.md §Long context).

Usage:
  python scripts/bench_sliding_window.py [minutes] [window]
  python scripts/bench_sliding_window.py 10 1024
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
from csm_tpu.models.config import csm_1b_args
from csm_tpu.serving import BatchedServer, StreamRequest
from csm_tpu.utils.transport import warm_transport


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    window = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    total_frames = int(minutes * 60 * 12.5)
    seg = 500  # frames per reported segment

    warm_transport(verbose=True)
    args = csm_1b_args()
    from csm_tpu.models.csm import init_csm_params

    params = jax.jit(
        lambda k: init_csm_params(k, args, jnp.bfloat16))(jax.random.key(0))
    jax.block_until_ready(params["audio_head"])
    K = args.audio_num_codebooks

    server = BatchedServer(
        params, args, n_slots=1, max_seq_len=2048, temperature=0.9,
        topk=50, chunk_size=16, weight_dtype="int8", kv_dtype="int8",
        pipelined=True, window=window,
    )
    rng = np.random.default_rng(0)
    T = 48
    tokens = np.zeros((T, K + 1), np.int32)
    mask = np.zeros((T, K + 1), bool)
    tokens[:, -1] = rng.integers(1, args.text_vocab_size, T)
    mask[:, -1] = True

    marks = []  # (frame_count, wall_time) at each delivery

    def on_frames(_rid, new, done):
        n = new.shape[0]
        if n:
            prev = marks[-1][0] if marks else 0
            marks.append((prev + n, time.time()))

    # warm the compiled programs with a short run first
    server.run([StreamRequest(tokens, mask, max_frames=40, request_id=0)])
    server.reset()
    marks.clear()

    log(f"continuous stream: {total_frames} frames "
        f"(~{total_frames / 12.5 / 60:.1f} min audio), window {window}")
    t0 = time.time()
    server.run(
        [StreamRequest(tokens, mask, max_frames=total_frames,
                       request_id=1, on_frames=on_frames)],
        max_steps=total_frames,  # chunk 16: plenty
    )
    wall = time.time() - t0

    # per-segment decode rate from delivery marks
    rates = []
    seg_start_f, seg_start_t = 0, t0
    for f, t in marks:
        if f - seg_start_f >= seg:
            rates.append((f - seg_start_f) / (t - seg_start_t))
            seg_start_f, seg_start_t = f, t
    med = float(np.median(rates))
    drift = (rates[-1] - rates[0]) / rates[0] * 100 if len(rates) > 1 else 0.0
    out = {
        "mode": "sliding_window_flat_rtf",
        "window": window,
        "frames": marks[-1][0] if marks else 0,
        "audio_minutes": round((marks[-1][0] if marks else 0) / 12.5 / 60, 2),
        "wall_s": round(wall, 1),
        "frames_per_s_median": round(med, 1),
        "rtf": round((marks[-1][0] / 12.5) / wall, 2) if marks else 0,
        "per_segment_frames_per_s": [round(r, 1) for r in rates],
        "first_to_last_segment_drift_pct": round(drift, 1),
        "reanchors_expected": max(
            0, (marks[-1][0] if marks else 0) // max(1, server._horizon - window)
        ),
    }
    log(f"median {med:.1f} f/s, drift first->last segment {drift:+.1f}%")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
