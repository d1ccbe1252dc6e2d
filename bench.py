"""Headline benchmark: CSM-1B generation RTF on one TPU chip.

Reference baseline: ~2-3 frames/s => RTF ~0.2 on Apple Silicon MLX
(reference README.md:275; see BASELINE.md).  North star: RTF >= 3 on one
v5e chip.

Measures the full decode path — bucketed prefill + compiled while_loop
frame generation (backbone step + 31 decoder steps + 32 samples per
80 ms frame) + Mimi SEANet decode to 24 kHz waveform — with random
weights (identical compute to trained weights).

Timing hygiene for tunneled rigs (see csm_tpu/utils/transport.py):
  * one big transport-warmup round-trip is started FIRST on a background
    thread and joined before any timed fetch — param init and the AOT
    compiles overlap the relay stall (which is pure blocked IO), so no
    timed region pays the first-fetch relay stall and the wall-clock
    cost of a degraded relay is its stall MINUS the compile time;
  * device arrays are jit ARGUMENTS, never closures (a closed-over
    device array becomes an MLIR constant fetched device->host at trace
    time);
  * every timed run ends with a host fetch of the result, so the timing
    can't be fooled by an async queue that under-reports readiness.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

REFERENCE_RTF = 0.2  # Apple Silicon MLX baseline (BASELINE.md)
FRAME_RATE = 12.5  # Mimi frames/s (reference src/csm/generator.py:173)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    # Persistent compile cache: the big while_loop program compiles once
    # per machine, not once per bench run.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import threading

    from csm_tpu.codec.mimi import CSM_MIMI_CONFIG, mimi_decode, mimi_init
    from csm_tpu.models import csm
    from csm_tpu.models.config import csm_1b_args
    from csm_tpu.models.generation import generate_audio_tokens
    from csm_tpu.utils.transport import warm_transport

    log(f"devices: {jax.devices()}")
    # The warmup round-trip can stall minutes when the relay is degraded
    # (BENCH_r03: 871 s) — it is pure blocked IO, so overlap it with
    # param init + compile on a background thread and join before the
    # first timed fetch.
    t_warm0 = time.time()
    warm_thread = threading.Thread(
        target=warm_transport, kwargs={"verbose": True}, daemon=True
    )
    warm_thread.start()

    args = csm_1b_args()
    dtype = jnp.bfloat16
    K = args.audio_num_codebooks

    t0 = time.time()
    # fused qkv / gate-up decode layout — what Generator/BatchedServer use
    # on a single device (csm_tpu/models/csm.fuse_csm_params)
    params = jax.jit(
        lambda k: csm.fuse_csm_params(csm.init_csm_params(k, args, dtype))
    )(jax.random.key(0))
    jax.block_until_ready(params["audio_head"])
    log(f"params init: {time.time() - t0:.1f}s")

    mimi_params = jax.jit(lambda k: mimi_init(k, CSM_MIMI_CONFIG, jnp.float32))(
        jax.random.key(1)
    )
    jax.block_until_ready(mimi_params["quantizer"].semantic.embed_sum)

    # 10 s utterance: 125 frames after a 64-token text prompt (BASELINE.json
    # config 1: CSM-1B, single utterance, 10s max audio, temp 0.9, batch 1).
    B, S, max_frames = 1, 64, 125
    tokens = jnp.zeros((B, S, K + 1), jnp.int32).at[:, :, -1].set(5)
    mask = jnp.zeros((B, S, K + 1), bool).at[:, :, -1].set(True)
    lens = jnp.full((B,), S, jnp.int32)

    gen = jax.jit(
        lambda p, k, tokens, mask, lens: generate_audio_tokens(
            p, args, k, tokens, mask, lens,
            max_frames=max_frames, temperature=0.9, topk=50,
            compute_dtype=dtype,
        )
    )
    # CSM's audio vocab is 2051 (2048 codes + specials); clamp to the Mimi
    # codebook range for decode.
    dec = jax.jit(
        lambda mp, codes: mimi_decode(
            mp, jnp.minimum(codes, CSM_MIMI_CONFIG.codebook_size - 1),
            CSM_MIMI_CONFIG,
        )
    )

    t0 = time.time()
    res = gen(params, jax.random.key(2), tokens, mask, lens)
    audio_dev = dec(mimi_params, res.frames.transpose(0, 2, 1))
    jax.block_until_ready(audio_dev)  # compiled + executed, nothing fetched yet
    log(f"compile+first run: {time.time() - t0:.1f}s")
    warm_thread.join()  # the first FETCH below must ride the warm path
    log(f"transport warm after {time.time() - t_warm0:.1f}s wall "
        f"(overlapped with init+compile)")
    np.asarray(audio_dev)  # fetch = proof of completion

    # Timed runs (fetch the waveform each run so timing includes real
    # completion, not just queue acceptance).
    n_runs, best = 3, float("inf")
    for i in range(n_runs):
        t0 = time.time()
        res = gen(params, jax.random.key(3 + i), tokens, mask, lens)
        audio = dec(mimi_params, res.frames.transpose(0, 2, 1))
        chk = float(np.asarray(jnp.sum(jnp.abs(audio))))  # device-reduced
        dt = time.time() - t0
        assert np.isfinite(chk) and chk > 0.0, chk
        best = min(best, dt)
        log(f"run {i}: {dt:.3f}s ({max_frames / dt:.1f} frames/s)")

    audio_seconds = max_frames / FRAME_RATE
    rtf = audio_seconds / best

    # Secondary (driver-visible) metric: the measured-best int8
    # weight-only mode.  The HEADLINE stays bf16 until int8 quality is
    # validated on real checkpoints (promotion rule in serving.py), but
    # the faster mode's number rides along in the same JSON line.
    int8_rtf = None
    try:
        from csm_tpu.utils.quantize import quantize_csm_params

        qparams = jax.jit(quantize_csm_params)(params)
        jax.block_until_ready(qparams["backbone"]["wqkv"]["w8"])
        res = gen(qparams, jax.random.key(2), tokens, mask, lens)
        np.asarray(dec(mimi_params, res.frames.transpose(0, 2, 1)))  # compile
        best8 = float("inf")
        for i in range(2):
            t0 = time.time()
            res = gen(qparams, jax.random.key(7 + i), tokens, mask, lens)
            audio = dec(mimi_params, res.frames.transpose(0, 2, 1))
            chk = float(np.asarray(jnp.sum(jnp.abs(audio))))
            dt = time.time() - t0
            assert np.isfinite(chk) and chk > 0.0, chk
            best8 = min(best8, dt)
            log(f"int8 run {i}: {dt:.3f}s ({max_frames / dt:.1f} frames/s)")
        int8_rtf = round(audio_seconds / best8, 3)
    except Exception as e:  # the headline must survive a secondary failure
        log(f"int8 secondary skipped: {e!r}")

    out = {
        "metric": "csm1b_generate_rtf",
        "value": round(rtf, 3),
        "unit": "audio_sec/wall_sec",
        "vs_baseline": round(rtf / REFERENCE_RTF, 2),
    }
    if int8_rtf is not None:
        out["secondary"] = {
            "csm1b_generate_rtf_int8": int8_rtf,
            "note": "int8 weight-only; headline stays bf16 pending "
                    "real-checkpoint quality validation",
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
