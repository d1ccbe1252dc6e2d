"""int8/int4 vs bf16 single-stream CSM-1B generation. See BENCHMARKS.md."""
import os, time, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
from csm_tpu.models.config import csm_1b_args
from csm_tpu.models.csm import fuse_csm_params, init_csm_params
from csm_tpu.models.generation import generate_audio_tokens
from csm_tpu.utils.quantize import quantize_csm_params, quantize_csm_params_int4
from csm_tpu.utils.transport import warm_transport
def log(*a): print(*a, file=sys.stderr, flush=True)

warm_transport(verbose=True)
args = csm_1b_args()
K = args.audio_num_codebooks
# fused decode layout = what Generator/BatchedServer run on one device
# (quantize operates on the separate layout, so quantize THEN fuse)
def _init(k):
    p = init_csm_params(k, args, jnp.bfloat16)
    return (fuse_csm_params(p), fuse_csm_params(quantize_csm_params(p)),
            fuse_csm_params(quantize_csm_params(p, components=("decoder",))),
            fuse_csm_params(quantize_csm_params_int4(p)))
params, qparams, qdparams, q4params = jax.jit(_init)(jax.random.key(0))
jax.block_until_ready(params["audio_head"])
jax.block_until_ready(qparams["backbone"]["wqkv"]["w8"])
jax.block_until_ready(qdparams["decoder"]["wqkv"]["w8"])
jax.block_until_ready(q4params["backbone"]["wqkv"]["w4p"])
B, S, max_frames = 1, 64, 125
toks = jnp.zeros((B,S,K+1), jnp.int32).at[:,:,-1].set(5)
msk = jnp.zeros((B,S,K+1), bool).at[:,:,-1].set(True)
lens = jnp.full((B,), S, jnp.int32)
def gen(p, k):
    return generate_audio_tokens(p, args, k, toks, msk, lens, max_frames=max_frames,
                                 temperature=0.9, topk=50, compute_dtype=jnp.bfloat16)
g = jax.jit(gen)
for name, p in (("bf16", params), ("int8", qparams),
                ("int8-decoder", qdparams), ("int4", q4params)):
    r = g(p, jax.random.key(1)); jax.block_until_ready(r.frames)
    best = 1e9
    for i in range(3):
        t0 = time.time()
        r = g(p, jax.random.key(2+i)); jax.block_until_ready(r.frames)
        best = min(best, time.time()-t0)
    log(f"{name}: {best:.3f}s ({max_frames/best:.1f} frames/s, RTF {max_frames/12.5/best:.2f})")
