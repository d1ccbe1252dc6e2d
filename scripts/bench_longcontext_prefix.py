"""Prefix-cached long-context serving A/B (companion to
bench_longcontext_serving.py): measures how much of the kilotoken-
prompt cost is admission prefill (cacheable) vs KV-heavy decode."""
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
def frames(T):
    tokens = np.zeros((T, K+1), np.int32); mask = np.zeros((T, K+1), bool)
    tokens[:, -1] = rng.integers(1, args.text_vocab_size, T); mask[:, -1] = True
    return tokens, mask
n_slots = 8
srv = BatchedServer(params, args, n_slots=n_slots, max_seq_len=4096,
                    temperature=0.9, topk=50, chunk_size=8,
                    weight_dtype="int8", kv_dtype="int8", pipelined=True)
pt, pm = frames(960)  # the shared 960-token context
srv.register_prefix("ctx", pt, pm)
srv.warmup()
rates = []
for r in range(3):
    srv.reset()
    reqs = []
    for i in range(n_slots*2):
        tt, tm = frames(40)  # request carries only its own 40-token text
        reqs.append(StreamRequest(tt, tm, max_frames=63, request_id=i, prefix="ctx"))
    res, stats = srv.run(reqs)
    assert len(res) == n_slots*2
    rates.append(stats["frames_per_s"])
print(f"4k-window serving, 960-tok PREFIX-CACHED context + 40-tok requests, "
      f"{n_slots} slots: median {statistics.median(rates):.1f} f/s "
      f"(runs {[round(x,1) for x in rates]})")
