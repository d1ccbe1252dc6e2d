"""Long-context SERVING: 4k window, kilotoken prompts, continuous
batching (beyond-reference; the reference caps context at 2048 and
batch at 1)."""
import time, sys, statistics
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
from csm_tpu.models.config import csm_1b_args
from csm_tpu.models.csm import init_csm_params
from csm_tpu.serving import BatchedServer, StreamRequest
from csm_tpu.utils.transport import warm_transport
warm_transport(verbose=True)
args = csm_1b_args(max_seq_len=4096)
params = jax.jit(lambda k: init_csm_params(k, args, jnp.bfloat16))(jax.random.key(0))
jax.block_until_ready(params["audio_head"])
K = args.audio_num_codebooks
rng = np.random.default_rng(0)
def req(rid, T=1000, max_frames=63):
    tokens = np.zeros((T, K+1), np.int32); mask = np.zeros((T, K+1), bool)
    tokens[:, -1] = rng.integers(1, args.text_vocab_size, T); mask[:, -1] = True
    return StreamRequest(tokens, mask, max_frames=max_frames, request_id=rid)
for n_slots in (8, 16):
    srv = BatchedServer(params, args, n_slots=n_slots, max_seq_len=4096,
                        temperature=0.9, topk=50, chunk_size=8,
                        weight_dtype="int8", kv_dtype="int8", pipelined=True)
    srv.warmup()
    rates = []
    for r in range(3):
        srv.reset()
        res, stats = srv.run([req(i) for i in range(n_slots*2)])
        assert len(res) == n_slots*2
        rates.append(stats["frames_per_s"])
    med = statistics.median(rates)
    print(f"4k-window serving, 1000-tok prompts, {n_slots} slots (int8+int8KV, "
          f"pipelined): median {med:.1f} f/s (runs {[round(x,1) for x in rates]})")
    del srv
