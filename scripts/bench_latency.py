"""First-audio latency: prompt -> first streamed chunk (CSM-1B).

Numbers recorded in BENCHMARKS.md.
"""
import time, sys, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
from csm_tpu.models.config import csm_1b_args
from csm_tpu.models.csm import init_csm_params
from csm_tpu.generator import Generator
from csm_tpu.data.tokenizers import ByteTokenizer, MimiAudioTokenizer
from csm_tpu.codec.mimi import CSM_MIMI_CONFIG, mimi_init
from csm_tpu.utils.quantize import quantize_csm_params
def log(*a): print(*a, file=sys.stderr, flush=True)

args = csm_1b_args()
params = jax.jit(lambda k: init_csm_params(k, args, jnp.bfloat16))(jax.random.key(0))
jax.block_until_ready(params["audio_head"])
mimi = MimiAudioTokenizer(mimi_init(jax.random.key(1), CSM_MIMI_CONFIG))

for name, p in (("bf16", params), ("int8", jax.jit(quantize_csm_params)(params))):
    jax.block_until_ready(jax.tree.leaves(p)[0])
    g = Generator(p, args, mimi=mimi, text_tokenizer=ByteTokenizer())
    for chunk_frames in (3, 6):
        # warmup (compile)
        for c, d in g.generate_streaming("warm", max_audio_length_ms=800,
                                         chunk_frames=chunk_frames, topk=50):
            break
        lat = []
        for trial in range(3):
            t0 = time.time()
            it = g.generate_streaming("hello first audio latency", speaker=2,
                                      max_audio_length_ms=2000,
                                      chunk_frames=chunk_frames, topk=50, seed=trial)
            chunk, _ = next(it)
            lat.append((time.time() - t0) * 1000)
            for _ in it: pass  # drain
        log(f"{name} chunk={chunk_frames} ({chunk_frames*80} ms audio): "
            f"first-audio latency {min(lat):.0f} ms")
