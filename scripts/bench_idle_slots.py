"""Idle-slot compaction win: per-request decode rate of ONE live stream
on a big continuous-batching server (the mostly-idle case), vs the same
server with compaction disabled.  See BENCHMARKS.md §serving."""
import gc
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
from csm_tpu.models.config import csm_1b_args
from csm_tpu.models.csm import init_csm_params
from csm_tpu.serving import BatchedServer, StreamRequest


def log(*a):
    print(*a, file=sys.stderr, flush=True)


args = csm_1b_args()
params = jax.jit(lambda k: init_csm_params(k, args, jnp.bfloat16))(jax.random.key(0))
jax.block_until_ready(params["audio_head"])
K = args.audio_num_codebooks
rng = np.random.default_rng(0)


def req(rid, T=48, max_frames=125):
    tokens = np.zeros((T, K + 1), np.int32)
    mask = np.zeros((T, K + 1), bool)
    tokens[:, -1] = rng.integers(1, args.text_vocab_size, T)
    mask[:, -1] = True
    return StreamRequest(tokens, mask, max_frames=max_frames, request_id=rid)


for n_slots in (16, 32, 64):
    for live in (1, 2, 4):
        server = BatchedServer(
            params, args, n_slots=n_slots, max_seq_len=1024,
            temperature=0.9, topk=50, chunk_size=8, weight_dtype="bf16",
        )
        # warm BOTH programs (compacted and full-batch) so neither timed
        # run pays first-compile
        _ = server.run([req(999, max_frames=3) for _ in range(live)])
        server.reset()
        cap0 = server._decode_capacity
        server._decode_capacity = lambda n: server.n_slots
        _ = server.run([req(998, max_frames=3) for _ in range(live)])
        server._decode_capacity = cap0
        server.reset()
        reqs = [req(i) for i in range(live)]
        t0 = time.time()
        results, stats = server.run(reqs)
        wall = time.time() - t0
        # compaction off: force the full-batch program
        server.reset()
        cap = server._decode_capacity
        server._decode_capacity = lambda n: server.n_slots
        t0 = time.time()
        results2, stats2 = server.run([req(i) for i in range(live)])
        wall2 = time.time() - t0
        server._decode_capacity = cap
        per = stats["total_frames"] / live / wall
        per2 = stats2["total_frames"] / live / wall2
        log(f"slots={n_slots} live={live}: per-request {per:.1f} f/s "
            f"compacted vs {per2:.1f} f/s full-batch ({per / per2:.1f}x)")
        del server
        gc.collect()
