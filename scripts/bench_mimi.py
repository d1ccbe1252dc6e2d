"""Mimi codec speed on the chip (reference claims 20-50x real-time
decode on CPU, docs/reference/sesame_csm/inference.md:135)."""
import time, sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
from csm_tpu.codec.mimi import CSM_MIMI_CONFIG, mimi_decode, mimi_encode, mimi_init
from csm_tpu.utils.transport import warm_transport
warm_transport(verbose=True)
cfg = CSM_MIMI_CONFIG
params = jax.jit(lambda k: mimi_init(k, cfg, jnp.float32))(jax.random.key(1))
jax.block_until_ready(params["quantizer"].semantic.embed_sum)
F = 750  # 60 s of audio at 12.5 Hz
codes = jnp.asarray(np.random.default_rng(0).integers(0, cfg.codebook_size, (1, cfg.num_quantizers, F)), jnp.int32)
dec = jax.jit(lambda p, c: mimi_decode(p, c, cfg))
audio = dec(params, codes); jax.block_until_ready(audio)
t0=time.time(); audio = dec(params, codes); chk=float(np.asarray(jnp.sum(jnp.abs(audio)))); dt=time.time()-t0
assert np.isfinite(chk) and chk > 0
secs = F/12.5
print(f"mimi decode: {secs:.0f}s audio in {dt*1000:.1f} ms -> {secs/dt:.0f}x real-time")
enc = jax.jit(lambda p, a: mimi_encode(p, a, cfg))
wav = jnp.asarray(np.random.default_rng(1).standard_normal((1, int(secs*24000))), jnp.float32) * 0.1
c = enc(params, wav); jax.block_until_ready(c)
t0=time.time(); c = enc(params, wav); chk=int(np.asarray(jnp.sum(c))); dt=time.time()-t0
print(f"mimi encode: {secs:.0f}s audio in {dt*1000:.1f} ms -> {secs/dt:.0f}x real-time")
