"""Shared-prefix serving benchmark (real chip).

Measures what prefix caching buys when every request shares a voice
preset (the production TTS pattern the reference can't batch at all):

  * admission latency: submit() wall time, inline context vs prefix=
    (the inline path re-prefills the whole preset per request; the
    prefix path seeds cached KV rows and prefills only the text);
  * aggregate throughput under churn: short utterances with a large
    shared context admit constantly, so per-admission cost shows up in
    frames/s.

Usage: python scripts/bench_prefix.py [--ctx 480] [--slots 16]
"""

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

from csm_tpu.models.config import csm_1b_args
from csm_tpu.models.csm import init_csm_params
from csm_tpu.serving import BatchedServer, StreamRequest


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def arg(name, default):
    argv = sys.argv[1:]
    return int(argv[argv.index(name) + 1]) if name in argv else default


CTX = arg("--ctx", 480)  # shared-context tokens (≈ preset audio+text)
TXT = arg("--txt", 40)  # per-request own tokens
SLOTS = arg("--slots", 16)
FRAMES = arg("--frames", 38)  # ≈3 s utterances: constant admission churn

args = csm_1b_args()
params = jax.jit(lambda k: init_csm_params(k, args, jnp.bfloat16))(
    jax.random.key(0))
jax.block_until_ready(params["audio_head"])
K = args.audio_num_codebooks
rng = np.random.default_rng(0)

ctx_t = np.zeros((CTX, K + 1), np.int32)
ctx_m = np.zeros((CTX, K + 1), bool)
n_audio = int(CTX * 0.8)
ctx_t[:n_audio, :K] = rng.integers(1, args.audio_vocab_size, (n_audio, K))
ctx_m[:n_audio, :K] = True
ctx_t[n_audio:, -1] = rng.integers(1, args.text_vocab_size, CTX - n_audio)
ctx_m[n_audio:, -1] = True


def req(rid, prefix=None):
    t = np.zeros((TXT, K + 1), np.int32)
    m = np.zeros((TXT, K + 1), bool)
    t[:, -1] = rng.integers(1, args.text_vocab_size, TXT)
    m[:, -1] = True
    if prefix is None:
        t, m = np.concatenate([ctx_t, t]), np.concatenate([ctx_m, m])
    return StreamRequest(t, m, max_frames=FRAMES, request_id=rid,
                         prefix=prefix)


def time_admissions(server, prefix, n=8):
    """Mean submit() wall time (prefill dispatch + frame0 fetch is inside
    submit via the admit/frame0 path; bound it with an explicit fetch)."""
    ts = []
    for i in range(n):
        server.reset()
        r = req(1000 + i, prefix=prefix)
        t0 = time.time()
        server.submit(r)
        # bound the timing with a host fetch (tunnel-safe)
        float(jnp.sum(server.slots.pos))
        ts.append(time.time() - t0)
    server.reset()
    return float(np.median(ts))


def throughput(server, prefix, n_req):
    server.reset()
    reqs = [req(i, prefix=prefix) for i in range(n_req)]
    t0 = time.time()
    results, stats = server.run(reqs)
    assert len(results) == n_req
    return stats["total_frames"] / (time.time() - t0)


max_seq = 2048
server = BatchedServer(params, args, n_slots=SLOTS, max_seq_len=max_seq,
                       temperature=0.9, topk=50, chunk_size=8)
server.register_prefix("voice", ctx_t, ctx_m)

# warm every program (inline-bucket prefill, prefix prefill, decode)
server.run([req(9001), req(9002, prefix="voice")])
server.reset()

t_reg0 = time.time()
server.register_prefix("voice2", ctx_t, ctx_m)
t_reg = time.time() - t_reg0

adm_inline = time_admissions(server, None)
adm_prefix = time_admissions(server, "voice")
log(f"ctx={CTX} txt={TXT} slots={SLOTS} frames/req={FRAMES}")
log(f"register_prefix (warm): {t_reg * 1e3:.1f} ms")
log(f"admission latency: inline {adm_inline * 1e3:.1f} ms, "
    f"prefix {adm_prefix * 1e3:.1f} ms "
    f"({adm_inline / adm_prefix:.2f}x)")

n_req = SLOTS * 4
fps_inline = throughput(server, None, n_req)
fps_prefix = throughput(server, "voice", n_req)
log(f"throughput under churn ({n_req} reqs x {FRAMES} frames): "
    f"inline {fps_inline:.1f} f/s, prefix {fps_prefix:.1f} f/s "
    f"({fps_prefix / fps_inline:.2f}x)")

gc.collect()
print(
    '{"metric": "prefix_admission_speedup", '
    f'"value": {adm_inline / adm_prefix:.3f}, "unit": "x", '
    f'"inline_ms": {adm_inline * 1e3:.1f}, '
    f'"prefix_ms": {adm_prefix * 1e3:.1f}, '
    f'"fps_inline": {fps_inline:.1f}, "fps_prefix": {fps_prefix:.1f}'
    "}"
)
