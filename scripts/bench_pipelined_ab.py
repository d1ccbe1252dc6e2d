"""Interleaved A/B: synchronous vs pipelined (chunk-in-flight) serving.

Both modes share one process, one set of device params and one compile
cache, and alternate measurement rounds (A B A B ...) so slow drift on a
tunneled rig cancels out.  The pipelined server dispatches chunk N+1
before fetching chunk N, hiding the host round-trip behind device
compute (csm_tpu/serving.py BatchedServer(pipelined=True)).

Usage: python scripts/bench_pipelined_ab.py [n_slots ...] [--int8]
       [--rounds N] [--chunk C]
"""
import os, sys, time, gc
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
from csm_tpu.models.config import csm_1b_args
from csm_tpu.models.csm import init_csm_params
from csm_tpu.serving import BatchedServer, StreamRequest
from csm_tpu.utils.transport import warm_transport

def log(*a): print(*a, file=sys.stderr, flush=True)

args = csm_1b_args()
params = jax.jit(lambda k: init_csm_params(k, args, jnp.bfloat16))(jax.random.key(0))
jax.block_until_ready(params["audio_head"])
warm_transport()
K = args.audio_num_codebooks
rng = np.random.default_rng(0)

def req(rid, T=48, max_frames=63):
    tokens = np.zeros((T, K + 1), np.int32); mask = np.zeros((T, K + 1), bool)
    tokens[:, -1] = rng.integers(1, args.text_vocab_size, T); mask[:, -1] = True
    return StreamRequest(tokens, mask, max_frames=max_frames, request_id=rid)

argv = sys.argv[1:]
wdtype = "int8" if "--int8" in argv else "bf16"
kvdtype = "int8" if "--kv-int8" in argv else "bf16"
rounds = int(argv[argv.index("--rounds") + 1]) if "--rounds" in argv else 3
chunk = int(argv[argv.index("--chunk") + 1]) if "--chunk" in argv else 8
slot_args = [int(a) for i, a in enumerate(argv)
             if not a.startswith("--")
             and (i == 0 or argv[i - 1] not in ("--rounds", "--chunk"))]

for n_slots in slot_args or (8, 32):
    servers = {}
    for mode in ("sync", "pipe"):
        s = BatchedServer(params, args, n_slots=n_slots, max_seq_len=1024,
                          temperature=0.9, topk=50, chunk_size=chunk,
                          weight_dtype=wdtype, kv_dtype=kvdtype,
                          pipelined=(mode == "pipe"))
        s.run([req(999, max_frames=3)])  # compile warm-up
        s.reset()
        servers[mode] = s
    fps = {"sync": [], "pipe": []}
    for r in range(rounds):
        for mode in ("sync", "pipe"):
            server = servers[mode]
            reqs = [req(1000 * r + i) for i in range(n_slots * 2)]
            results, stats = server.run(reqs)
            server.reset()
            fps[mode].append(stats["frames_per_s"])
    log(f"slots={n_slots} chunk={chunk} {wdtype}: "
        f"sync {np.median(fps['sync']):.1f} f/s {[f'{x:.1f}' for x in fps['sync']]}  "
        f"pipe {np.median(fps['pipe']):.1f} f/s {[f'{x:.1f}' for x in fps['pipe']]}  "
        f"({np.median(fps['pipe']) / np.median(fps['sync']) - 1:+.1%})")
    del servers; gc.collect()
