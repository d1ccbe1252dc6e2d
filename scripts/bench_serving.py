import os, time, sys, gc
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
from csm_tpu.models.config import csm_1b_args
from csm_tpu.models.csm import init_csm_params
from csm_tpu.serving import BatchedServer, StreamRequest

def log(*a): print(*a, file=sys.stderr, flush=True)
args = csm_1b_args()
params = jax.jit(lambda k: init_csm_params(k, args, jnp.bfloat16))(jax.random.key(0))
jax.block_until_ready(params["audio_head"])
K = args.audio_num_codebooks
rng = np.random.default_rng(0)

def req(rid, T=48, max_frames=63):
    tokens = np.zeros((T, K+1), np.int32); mask = np.zeros((T, K+1), bool)
    tokens[:, -1] = rng.integers(1, args.text_vocab_size, T); mask[:, -1] = True
    return StreamRequest(tokens, mask, max_frames=max_frames, request_id=rid)

argv = sys.argv[1:]
wdtype = "int8" if "--int8" in argv else "bf16"
kvdtype = "int8" if "--kv-int8" in argv else "bf16"
pipelined = "--pipelined" in argv
slot_args = [int(a) for a in argv if not a.startswith("--")]
for n_slots in slot_args or (1, 8, 16, 32, 64):
    server = BatchedServer(params, args, n_slots=n_slots, max_seq_len=1024,
                           temperature=0.9, topk=50, chunk_size=8,
                           weight_dtype=wdtype, kv_dtype=kvdtype,
                           pipelined=pipelined)
    _ = server.run([req(999, max_frames=3)])  # warm the compile cache
    server.reset()
    reqs = [req(i) for i in range(n_slots * 2)]
    results, stats = server.run(reqs)
    log(f"slots={n_slots}: {len(results)} done, {stats['total_frames']} frames, "
        f"{stats['frames_per_s']:.1f} frames/s, aggregate RTF {stats['aggregate_rtf']:.2f}")
    del server; gc.collect()
