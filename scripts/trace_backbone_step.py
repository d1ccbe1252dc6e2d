"""Capture a jax.profiler trace of the incremental backbone step (and the
full frame step) to find non-bandwidth overhead.  Writes /tmp/csm_trace."""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
from csm_tpu.models import csm
from csm_tpu.models.config import csm_1b_args


def log(*a):
    print(*a, file=sys.stderr, flush=True)


args = csm_1b_args()
params = jax.jit(lambda k: csm.init_csm_params(k, args, jnp.bfloat16))(jax.random.key(0))
jax.block_until_ready(params["audio_head"])
B, K = 1, args.audio_num_codebooks
dt = jnp.bfloat16

state = csm.init_frame_state(args, B, dt, max_seq_len=2048)
toks = jnp.zeros((B, 1, K + 1), jnp.int32)
msk = jnp.zeros((B, 1, K + 1), bool).at[:, :, :K].set(True)
pos = jnp.full((B, 1), 100, jnp.int32)
full = jax.jit(
    lambda p, s, k: csm.generate_frame(p, args, k, toks, msk, pos, s, 0.9, 50, dt)
)
f, s2 = full(params, state, jax.random.key(0))
jax.block_until_ready(f)

t0 = time.time()
for i in range(20):
    f, _ = full(params, state, jax.random.key(i))
jax.block_until_ready(f)
log(f"frame step: {(time.time()-t0)/20*1000:.2f} ms")

with jax.profiler.trace("/tmp/csm_trace"):
    for i in range(10):
        f, _ = full(params, state, jax.random.key(i))
    jax.block_until_ready(f)
log("trace written to /tmp/csm_trace")
