"""Per-frame decode component timing (backbone step vs decoder scan). See BENCHMARKS.md."""
"""Where do the 12 ms/frame go? Time backbone step vs decoder scan vs sampling."""
import time, sys, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
from csm_tpu.models.config import csm_1b_args
from csm_tpu.models import csm
from csm_tpu.models.llama import transformer_apply
from csm_tpu.ops.attention import causal_mask_from_positions
from csm_tpu.ops.kvcache import init_kv_cache

def log(*a): print(*a, file=sys.stderr, flush=True)
args = csm_1b_args()
params = jax.jit(lambda k: csm.init_csm_params(k, args, jnp.bfloat16))(jax.random.key(0))
jax.block_until_ready(params["audio_head"])
B, K = 1, args.audio_num_codebooks
dt = jnp.bfloat16

# full frame step
state = csm.init_frame_state(args, B, dt, max_seq_len=256)
toks = jnp.zeros((B,1,K+1), jnp.int32); msk = jnp.zeros((B,1,K+1), bool).at[:,:, :K].set(True)
pos = jnp.full((B,1), 100, jnp.int32)
full = jax.jit(lambda p, s, k: csm.generate_frame(p, args, k, toks, msk, pos, s, 0.9, 50, dt))
f, s2 = full(params, state, jax.random.key(0)); jax.block_until_ready(f)

# backbone-only incremental step
def bb_only(p, s, k):
    h = csm.masked_embed_sum(p, args, toks, msk).astype(dt)
    kvp = s.kv_pos.at[:, 100].set(100)
    m = causal_mask_from_positions(pos, kvp)
    h, c = transformer_apply(p["backbone"], args.backbone, h, pos, m, s.cache, s.offset)
    return h
bb = jax.jit(bb_only)
o = bb(params, state, jax.random.key(0)); jax.block_until_ready(o)

def timeit(f, *a, n=50):
    t0 = time.time()
    for _ in range(n): out = f(*a)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    return (time.time()-t0)/n*1000

t_full = timeit(full, params, state, jax.random.key(1))
t_bb = timeit(bb, params, state, jax.random.key(1))
log(f"full frame: {t_full:.2f} ms | backbone step: {t_bb:.2f} ms | decoder+sampling: {t_full-t_bb:.2f} ms")
log(f"per-codebook decoder step: {(t_full-t_bb)/31:.3f} ms")
