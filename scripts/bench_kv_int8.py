"""int8 KV cache benchmark (VERDICT round-2 item #4): single-stream RTF
and serving throughput/capacity for the bf16 / int8-weights /
int8-weights+int8-KV ladder.  See BENCHMARKS.md."""
import gc
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

from csm_tpu.models.config import csm_1b_args  # noqa: E402
from csm_tpu.models.csm import init_csm_params  # noqa: E402
from csm_tpu.models.generation import generate_audio_tokens  # noqa: E402
from csm_tpu.serving import BatchedServer, StreamRequest  # noqa: E402
from csm_tpu.utils.quantize import quantize_csm_params  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


args = csm_1b_args()
K = args.audio_num_codebooks
params = jax.jit(lambda k: init_csm_params(k, args, jnp.bfloat16))(jax.random.key(0))
jax.block_until_ready(params["audio_head"])
qparams = jax.jit(quantize_csm_params)(params)
jax.block_until_ready(qparams["backbone"]["wq"]["w8"])

argv = sys.argv[1:]
single = "--serving" not in argv

if single:
    B, S, max_frames = 1, 64, 125
    toks = jnp.zeros((B, S, K + 1), jnp.int32).at[:, :, -1].set(5)
    msk = jnp.zeros((B, S, K + 1), bool).at[:, :, -1].set(True)
    lens = jnp.full((B,), S, jnp.int32)

    for name, p, kv in (
        ("bf16 w / bf16 kv", params, None),
        ("int8 w / bf16 kv", qparams, None),
        ("bf16 w / int8 kv", params, jnp.int8),
        ("int8 w / int8 kv", qparams, jnp.int8),
    ):
        g = jax.jit(lambda pp, k, kv=kv: generate_audio_tokens(
            pp, args, k, toks, msk, lens, max_frames=max_frames,
            temperature=0.9, topk=50, compute_dtype=jnp.bfloat16, kv_dtype=kv,
        ))
        r = g(p, jax.random.key(1))
        int(jnp.sum(r.frames))  # host fetch = proof of completion
        best = 1e9
        for i in range(3):
            t0 = time.time()
            r = g(p, jax.random.key(2 + i))
            int(jnp.sum(r.frames))
            best = min(best, time.time() - t0)
        log(f"{name}: {best:.3f}s ({max_frames / best:.1f} frames/s, "
            f"RTF {max_frames / 12.5 / best:.2f})")
else:
    rng = np.random.default_rng(0)

    def req(rid, T=48, max_frames=63):
        tokens = np.zeros((T, K + 1), np.int32)
        mask = np.zeros((T, K + 1), bool)
        tokens[:, -1] = rng.integers(1, args.text_vocab_size, T)
        mask[:, -1] = True
        return StreamRequest(tokens, mask, max_frames=max_frames, request_id=rid)

    slot_args = [int(a) for a in argv if a.isdigit()]
    for n_slots in slot_args or (8, 32, 64):
        for kv in ("bf16", "int8"):
            server = BatchedServer(
                params, args, n_slots=n_slots, max_seq_len=1024,
                temperature=0.9, topk=50, chunk_size=8,
                weight_dtype="int8", kv_dtype=kv,
            )
            _ = server.run([req(999, max_frames=3)])  # warm compiles
            server.reset()
            results, stats = server.run([req(i) for i in range(n_slots * 2)])
            from csm_tpu.utils.observability import hbm_stats

            mem = hbm_stats()
            log(f"slots={n_slots} kv={kv}: {stats['total_frames']} frames, "
                f"{stats['frames_per_s']:.1f} f/s, aggregate RTF "
                f"{stats['aggregate_rtf']:.2f}, hbm {mem}")
            del server
            gc.collect()
