"""Serving time-to-first-audio (TTFA) benchmark: ramp_chunk A/B (real chip).

Measures the streaming latency from submit() to the FIRST on_frames
callback for a request admitted into an already-busy server, with and
without the post-admission ramp chunk.  Without a ramp, the first
gather lands after a full chunk_size frames; with ramp_chunk=R it lands
after R — the difference is (chunk_size − R) frame times at the
server's current occupancy.

Usage: python scripts/bench_ttfa.py [--slots 8] [--chunk 8] [--ramp 2]
"""

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


SLOTS = arg("--slots", 8)
CHUNK = arg("--chunk", 8)
RAMP = arg("--ramp", 2)
TXT = 48
BG_FRAMES = 1900  # background streams effectively never finish
                  # (prompt bucket 64 + 1900 < max_seq_len 2048)
N_PROBE = 8

args = csm_1b_args()
params = jax.jit(lambda k: init_csm_params(k, args, jnp.bfloat16))(
    jax.random.key(0))
jax.block_until_ready(params["audio_head"])
K = args.audio_num_codebooks
rng = np.random.default_rng(0)


def req(rid, max_frames, on_frames=None):
    t = np.zeros((TXT, K + 1), np.int32)
    m = np.zeros((TXT, K + 1), bool)
    t[:, -1] = rng.integers(1, args.text_vocab_size, TXT)
    m[:, -1] = True
    r = StreamRequest(t, m, max_frames=max_frames, request_id=rid)
    r.on_frames = on_frames
    return r


def measure(ramp):
    server = BatchedServer(params, args, n_slots=SLOTS, max_seq_len=2048,
                           temperature=0.9, topk=50, chunk_size=CHUNK,
                           ramp_chunk=ramp)
    server.warmup()
    # fill all but one slot with long-running background streams
    for i in range(SLOTS - 1):
        server.submit(req(i, BG_FRAMES))
    for _ in range(3):  # settle into steady-state decode
        server.step()

    lat = []
    for p in range(N_PROBE):
        first = {}

        def on_frames(rid, new, done, first=first):
            if new.shape[0] and rid not in first:
                first[rid] = time.time()

        t0 = time.time()
        server.submit(req(1000 + p, 64, on_frames))
        while (1000 + p) not in first:
            server.step()
        lat.append(first[1000 + p] - t0)
        # drain until the probe stream finishes and its slot frees
        while any(r is not None and r.request_id == 1000 + p
                  for r in server.slot_request):
            server.step()
    return float(np.median(lat)), float(np.min(lat))


med_off, min_off = measure(None)
log(f"no ramp   (chunk {CHUNK}):      TTFA median {med_off * 1e3:.1f} ms "
    f"(min {min_off * 1e3:.1f})")
med_on, min_on = measure(RAMP)
log(f"ramp_chunk={RAMP} (chunk {CHUNK}): TTFA median {med_on * 1e3:.1f} ms "
    f"(min {min_on * 1e3:.1f})")

print(
    '{"metric": "serving_ttfa_ramp_speedup", '
    f'"value": {med_off / med_on:.3f}, "unit": "x", '
    f'"slots": {SLOTS}, "chunk": {CHUNK}, "ramp": {RAMP}, '
    f'"ttfa_ms_no_ramp": {med_off * 1e3:.1f}, '
    f'"ttfa_ms_ramp": {med_on * 1e3:.1f}'
    "}"
)
