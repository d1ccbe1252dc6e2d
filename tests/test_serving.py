"""Batched-serving tests: continuous batching correctness.

Key invariant: a stream served in a shared multi-slot server produces
exactly the tokens it would produce generated alone (argmax decoding) —
slot sharing, per-slot prefill merging, and stale-cache masking must be
invisible to each stream."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csm_tpu.models.config import tiny_test_args
from csm_tpu.models.csm import init_csm_params
from csm_tpu.models.generation import generate_audio_tokens
from csm_tpu.serving import BatchedServer, StreamRequest


@pytest.fixture(scope="module")
def tiny():
    args = tiny_test_args()
    params = init_csm_params(jax.random.key(0), args, jnp.float32)
    return args, params


def make_request(args, T, rid, seed, max_frames=4):
    rng = np.random.default_rng(seed)
    K = args.audio_num_codebooks
    tokens = np.zeros((T, K + 1), np.int32)
    mask = np.zeros((T, K + 1), bool)
    tokens[:, -1] = rng.integers(1, args.text_vocab_size, T)
    mask[:, -1] = True
    return StreamRequest(tokens, mask, max_frames=max_frames, request_id=rid)


def solo_frames(args, params, req):
    K = args.audio_num_codebooks
    T = req.tokens.shape[0]
    S_pad = 64
    toks = np.zeros((1, S_pad, K + 1), np.int32)
    msk = np.zeros((1, S_pad, K + 1), bool)
    toks[0, :T] = req.tokens
    msk[0, :T] = req.mask
    res = jax.jit(
        lambda p, k: generate_audio_tokens(
            p, args, k, jnp.asarray(toks), jnp.asarray(msk),
            jnp.full((1,), T, jnp.int32), max_frames=req.max_frames,
            temperature=1.0, topk=1, compute_dtype=jnp.float32,
        )
    )(params, jax.random.key(0))
    n = int(res.num_frames[0])
    return np.asarray(res.frames)[0, :n]


def test_server_matches_single_stream(tiny):
    args, params = tiny
    server = BatchedServer(
        params, args, n_slots=2, max_seq_len=128,
        temperature=1.0, topk=1, compute_dtype=jnp.float32,
    )
    reqs = [
        make_request(args, 6, rid=0, seed=1),
        make_request(args, 9, rid=1, seed=2),
    ]
    results, stats = server.run(list(reqs))
    assert {r.request_id for r in results} == {0, 1}
    by_id = {r.request_id: r for r in results}
    for req in reqs:
        want = solo_frames(args, params, req)
        got = by_id[req.request_id].frames
        assert got.shape[0] <= req.max_frames
        np.testing.assert_array_equal(got[: want.shape[0]], want[: got.shape[0]])
    assert stats["total_frames"] == sum(r.n_steps for r in results)


def test_continuous_admission(tiny):
    """3 requests over 2 slots: the third admits once a slot frees."""
    args, params = tiny
    server = BatchedServer(
        params, args, n_slots=2, max_seq_len=256,
        temperature=1.0, topk=1, compute_dtype=jnp.float32,
    )
    reqs = [make_request(args, 5 + i, rid=i, seed=10 + i, max_frames=3) for i in range(3)]
    results, stats = server.run(list(reqs))
    assert {r.request_id for r in results} == {0, 1, 2}
    # each request matches its solo generation
    for req in reqs:
        want = solo_frames(args, params, req)
        got = next(r for r in results if r.request_id == req.request_id).frames
        np.testing.assert_array_equal(got[: want.shape[0]], want[: got.shape[0]])


def test_budget_validation(tiny):
    """A request whose prompt bucket + frame budget exceeds max_seq_len is
    rejected at submit (per-slot offsets make admitted requests safe)."""
    args, params = tiny
    server = BatchedServer(
        params, args, n_slots=1, max_seq_len=80,
        temperature=1.0, topk=1, compute_dtype=jnp.float32,
    )
    req = make_request(args, 6, rid=0, seed=3, max_frames=50)
    with pytest.raises(ValueError, match="exceeds max_seq_len"):
        server.submit(req)


def test_slot_reuse_many_requests(tiny):
    """Per-slot offsets reset on admission: serving many sequential
    requests through one slot never exhausts the cache (total frames far
    beyond max_seq_len)."""
    args, params = tiny
    server = BatchedServer(
        params, args, n_slots=1, max_seq_len=96,
        temperature=1.0, topk=1, compute_dtype=jnp.float32, chunk_size=2,
    )
    reqs = [make_request(args, 6, rid=i, seed=1, max_frames=20) for i in range(8)]
    results, stats = server.run(list(reqs))
    assert len(results) == 8
    want = solo_frames(args, params, reqs[0])
    for r in results:  # identical prompts => identical argmax streams
        np.testing.assert_array_equal(r.frames[: want.shape[0]], want[: r.frames.shape[0]])


def test_chunked_decode_matches_single_stream(tiny):
    """chunk_size>1 (multi-frame decode per dispatch) must not change
    outputs: streams still equal their solo argmax generation."""
    args, params = tiny
    server = BatchedServer(
        params, args, n_slots=2, max_seq_len=256,
        temperature=1.0, topk=1, compute_dtype=jnp.float32, chunk_size=4,
    )
    reqs = [
        make_request(args, 6, rid=0, seed=1, max_frames=6),
        make_request(args, 9, rid=1, seed=2, max_frames=6),
    ]
    results, stats = server.run(list(reqs))
    assert {r.request_id for r in results} == {0, 1}
    for req in reqs:
        want = solo_frames(args, params, req)
        got = next(r for r in results if r.request_id == req.request_id).frames
        np.testing.assert_array_equal(got[: want.shape[0]], want[: got.shape[0]])


def test_server_with_quantized_params(tiny):
    """int8 weight-only params flow through serving unchanged (the layer
    forward dequantizes transparently); streams match the quantized solo
    generation."""
    from csm_tpu.utils.quantize import quantize_csm_params

    args, params = tiny
    qparams = quantize_csm_params(params)
    server = BatchedServer(
        qparams, args, n_slots=2, max_seq_len=128,
        temperature=1.0, topk=1, compute_dtype=jnp.float32, chunk_size=2,
    )
    req = make_request(args, 6, rid=0, seed=1, max_frames=4)
    results, _ = server.run([req])
    want = solo_frames(args, qparams, req)
    got = results[0].frames
    np.testing.assert_array_equal(got[: want.shape[0]], want[: got.shape[0]])


def test_weight_dtype_policy(tiny):
    """weight_dtype="auto" picks int8 at EVERY slot count (measured faster
    at all 1..64, and the gap only narrows as weight reads amortize —
    serving.py policy comment); "int8" quantizes internally and must match
    a server handed pre-quantized params."""
    from csm_tpu.utils.quantize import is_quantized, quantize_csm_params

    args, params = tiny
    kw = dict(max_seq_len=96, temperature=1.0, topk=1,
              compute_dtype=jnp.float32, chunk_size=2)
    lo = BatchedServer(params, args, n_slots=1, weight_dtype="auto", **kw)
    assert lo.weight_dtype == "int8"
    # single-device servers run the fused decode layout (wqkv)
    assert is_quantized(lo.params["backbone"]["wqkv"])
    hi = BatchedServer(params, args, n_slots=128, weight_dtype="auto", **kw)
    assert hi.weight_dtype == "int8"
    assert is_quantized(hi.params["backbone"]["wqkv"])

    req = make_request(args, 6, rid=0, seed=1, max_frames=4)
    r_auto, _ = lo.run([req])
    pre = BatchedServer(quantize_csm_params(params), args, n_slots=1, **kw)
    r_pre, _ = pre.run([make_request(args, 6, rid=0, seed=1, max_frames=4)])
    np.testing.assert_array_equal(r_auto[0].frames, r_pre[0].frames)

    with pytest.raises(ValueError):
        BatchedServer(params, args, n_slots=1, weight_dtype="fp8", **kw)


def test_submit_time_finish_is_returned(tiny):
    """A request with max_frames=1 finishes at submit; its result must
    still come back from run()."""
    args, params = tiny
    server = BatchedServer(
        params, args, n_slots=1, max_seq_len=96,
        temperature=1.0, topk=1, compute_dtype=jnp.float32,
    )
    reqs = [make_request(args, 6, rid=0, seed=1, max_frames=1),
            make_request(args, 6, rid=1, seed=2, max_frames=3)]
    results, _ = server.run(list(reqs))
    assert {r.request_id for r in results} == {0, 1}
    assert next(r for r in results if r.request_id == 0).frames.shape[0] <= 1


def test_streaming_callbacks(tiny):
    """Per-request ``on_frames`` streaming under continuous batching:
    streamed chunks concatenate to exactly the final result frames, and
    done=True fires exactly once per request."""
    args, params = tiny
    server = BatchedServer(
        params, args, n_slots=2, max_seq_len=256,
        temperature=1.0, topk=1, compute_dtype=jnp.float32, chunk_size=2,
    )
    streamed = {}
    done_count = {}

    def on_frames(rid, new, done):
        assert new.ndim == 2 and new.shape[1] == args.audio_num_codebooks
        streamed.setdefault(rid, []).append(new)
        if done:
            done_count[rid] = done_count.get(rid, 0) + 1

    reqs = []
    for i in range(3):  # 3 requests over 2 slots: one admits mid-run
        r = make_request(args, 5 + i, rid=i, seed=20 + i, max_frames=5)
        r.on_frames = on_frames
        reqs.append(r)
    results, _ = server.run(list(reqs))

    assert done_count == {0: 1, 1: 1, 2: 1}
    by_id = {r.request_id: r.frames for r in results}
    for rid, chunks in streamed.items():
        got = (np.concatenate([c for c in chunks if c.shape[0]])
               if any(c.shape[0] for c in chunks)
               else np.zeros((0, args.audio_num_codebooks), np.int32))
        np.testing.assert_array_equal(got, by_id[rid])


def test_streaming_callback_immediate_budget(tiny):
    """done fires once even for a request finished at submit (budget 1)."""
    args, params = tiny
    server = BatchedServer(
        params, args, n_slots=1, max_seq_len=128,
        temperature=1.0, topk=1, compute_dtype=jnp.float32,
    )
    calls = []
    r = make_request(args, 6, rid=7, seed=3, max_frames=1)
    r.on_frames = lambda rid, new, done: calls.append((rid, new.shape[0], done))
    results, _ = server.run([r])
    assert [c for c in calls if c[2]] == [(7, 1, True)]
    assert results[0].frames.shape[0] == 1


def test_decode_capacity_selector(tiny):
    """Compaction picks the smallest power-of-two batch that at least
    halves the server; meshes disable it (slots are pinned to devices)."""
    args, params = tiny
    server = BatchedServer(
        params, args, n_slots=8, max_seq_len=128,
        temperature=1.0, topk=1, compute_dtype=jnp.float32,
    )
    assert server._decode_capacity(1) == 1
    assert server._decode_capacity(2) == 2
    assert server._decode_capacity(3) == 4
    assert server._decode_capacity(4) == 4
    assert server._decode_capacity(5) == 8  # can't halve -> full program
    assert server._decode_capacity(8) == 8


def test_compacted_serving_matches_dedicated_server(tiny):
    """A mostly-idle 8-slot server must produce BIT-IDENTICAL frames to a
    right-sized server: with k live slots it runs the same k-batch decode
    program with the same keys, so sampled (not just argmax) outputs
    match.  Guards the gather/decode/scatter round-trip (idle-slot
    compaction)."""
    args, params = tiny

    def serve(n_slots, reqs):
        server = BatchedServer(
            params, args, n_slots=n_slots, max_seq_len=128,
            temperature=1.0, topk=8, compute_dtype=jnp.float32,
        )
        results, _ = server.run(list(reqs))
        return {r.request_id: r.frames for r in results}

    # one live request: 8-slot (compacts to 1) == dedicated 1-slot
    req = [make_request(args, 6, rid=0, seed=5, max_frames=6)]
    np.testing.assert_array_equal(serve(8, req)[0], serve(1, req)[0])

    # two live requests: 8-slot (compacts to 2) == dedicated 2-slot
    reqs = [
        make_request(args, 6, rid=0, seed=6, max_frames=5),
        make_request(args, 9, rid=1, seed=7, max_frames=5),
    ]
    a, b = serve(8, reqs), serve(2, reqs)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_server_int8_kv_matches_solo_int8_kv(tiny):
    """Continuous batching must stay invisible under an int8 KV cache:
    a stream served with kv_dtype="int8" produces exactly the tokens of a
    solo int8-KV generation (same quantize-at-write math in both paths),
    including through slot compaction and per-row cache offsets."""
    from csm_tpu.models.generation import generate_audio_tokens_jit
    from csm_tpu.ops.kvcache import QuantKV

    args, params = tiny
    server = BatchedServer(
        params, args, n_slots=2, max_seq_len=128,
        temperature=1.0, topk=1, compute_dtype=jnp.float32,
        kv_dtype="int8",
    )
    assert isinstance(server.state.cache.k, QuantKV)
    reqs = [
        make_request(args, 6, rid=0, seed=1),
        make_request(args, 9, rid=1, seed=2),
    ]
    results, _ = server.run(list(reqs))
    by_id = {r.request_id: r for r in results}
    K = args.audio_num_codebooks
    for req in reqs:
        T = req.tokens.shape[0]
        toks = np.zeros((1, 64, K + 1), np.int32)
        msk = np.zeros((1, 64, K + 1), bool)
        toks[0, :T] = req.tokens
        msk[0, :T] = req.mask
        res = generate_audio_tokens_jit(
            params, args, jax.random.key(0), jnp.asarray(toks),
            jnp.asarray(msk), jnp.full((1,), T, jnp.int32),
            max_frames=req.max_frames, temperature=1.0, topk=1,
            compute_dtype=jnp.float32, kv_dtype=jnp.int8,
        )
        n = int(res.num_frames[0])
        want = np.asarray(res.frames)[0, :n]
        got = by_id[req.request_id].frames
        np.testing.assert_array_equal(got[: want.shape[0]], want[: got.shape[0]])


def test_warmup_compiles_then_serves(tiny):
    """warmup() precompiles every serving program and leaves the server
    clean; a real request afterwards is served correctly."""
    args, params = tiny
    server = BatchedServer(params, args, n_slots=2, max_seq_len=128,
                           temperature=1.0, topk=1,
                           compute_dtype=jnp.float32)
    dt = server.warmup()
    assert dt > 0 and not server.active.any()
    # prefill programs for every fitting bucket exist
    assert set(server._prefills) == {64}  # 128-bucket + 3 frames > 128
    req = make_request(args, 6, rid=0, seed=1)
    want = solo_frames(args, params, req)
    results, _ = server.run([make_request(args, 6, rid=0, seed=1)])
    got = results[0].frames
    np.testing.assert_array_equal(got[: want.shape[0]], want[: got.shape[0]])


def test_cancel_frees_slot_and_leaves_others_exact(tiny):
    """cancel(): the slot dies on device and admits a new request at
    once; the survivor's tokens are untouched; on_frames fires done=True
    exactly once for the cancelled stream."""
    args, params = tiny
    server = BatchedServer(params, args, n_slots=2, max_seq_len=128,
                           temperature=1.0, topk=1,
                           compute_dtype=jnp.float32, chunk_size=2)
    r0 = make_request(args, 6, rid=0, seed=1, max_frames=20)
    events = []
    r0.on_frames = lambda rid, new, done: events.append(
        (rid, new.shape[0], done))
    r1 = make_request(args, 6, rid=1, seed=2, max_frames=8)
    server.submit(r0)
    server.submit(r1)
    server.step()

    assert server.cancel(99) is None  # unknown id: no-op
    res = server.cancel(0)
    assert res is not None and res.cancelled and res.request_id == 0
    assert res.frames.shape[0] == res.n_steps
    assert [e for e in events if e[2]] == [(0, 0, True)]  # one done=True
    assert server.cancel(0) is None  # idempotent: already gone

    r2 = make_request(args, 6, rid=2, seed=3, max_frames=4)
    assert server.submit(r2) is not None  # freed slot admits immediately
    results, _ = server.run([])
    by_id = {r.request_id: r for r in results}
    assert set(by_id) == {1, 2} and not any(r.cancelled for r in results)

    # the survivor decoded exactly what it would have alone
    np.testing.assert_array_equal(by_id[1].frames, solo_frames(args, params, r1))


def test_ramp_chunk_parity_and_first_gather(tiny):
    """ramp_chunk: argmax tokens identical to an un-ramped server; the
    step right after an admission gathers after <= ramp_chunk decoded
    frames (+ the deferred prefill frame), the next step runs the full
    chunk; warmup() compiles both program families."""
    args, params = tiny
    kw = dict(n_slots=2, max_seq_len=128, temperature=1.0, topk=1,
              compute_dtype=jnp.float32, chunk_size=6)
    base = BatchedServer(params, args, **kw)
    ramp = BatchedServer(params, args, ramp_chunk=2, **kw)
    mk = lambda: [make_request(args, 6, rid=i, seed=i + 1, max_frames=9)
                  for i in range(2)]
    rb, _ = base.run(mk())
    rr, _ = ramp.run(mk())
    for a, b in zip(sorted(rb, key=lambda r: r.request_id),
                    sorted(rr, key=lambda r: r.request_id)):
        np.testing.assert_array_equal(a.frames, b.frames)

    ramp.reset()
    ramp.submit(make_request(args, 6, rid=9, seed=3, max_frames=12))
    slot_frames_before = len(ramp.slot_frames[0])
    assert slot_frames_before == 0  # frame0 deferred on device
    ramp.step()
    n1 = len(ramp.slot_frames[0])
    assert 1 <= n1 <= 3  # f0 + at most ramp_chunk decoded frames
    ramp.step()
    assert len(ramp.slot_frames[0]) > n1  # steady-state chunk resumed
    ramp.reset()

    dt = ramp.warmup()
    assert dt > 0 and not ramp.active.any()
    chunks = {c for (_, c) in ramp._decodes}
    assert chunks == {2, 6}  # both ramp and steady-state programs built

    with pytest.raises(ValueError):
        BatchedServer(params, args, ramp_chunk=6, **kw)


def test_pipelined_matches_unpipelined_argmax(tiny):
    """pipelined=True under churn (re-admission, mixed lengths/budgets):
    every request decodes exactly the tokens the synchronous server
    produces (argmax — the chunk-in-flight bookkeeping must be invisible
    to each stream)."""
    args, params = tiny
    kw = dict(n_slots=2, max_seq_len=128, temperature=1.0, topk=1,
              compute_dtype=jnp.float32, chunk_size=3)
    mk = lambda: [
        make_request(args, 5 + (i % 3), rid=i, seed=i + 1,
                     max_frames=3 + (i % 4))
        for i in range(6)  # 6 requests over 2 slots: forced re-admission
    ]
    sync = BatchedServer(params, args, **kw)
    pipe = BatchedServer(params, args, pipelined=True, **kw)
    rs, _ = sync.run(mk())
    rp, _ = pipe.run(mk())
    assert {r.request_id for r in rp} == {r.request_id for r in rs}
    # invariant: once drained, nothing is left in flight
    assert pipe._inflight is None and not pipe.active.any()
    bs = {r.request_id: r for r in rs}
    for r in rp:
        np.testing.assert_array_equal(r.frames, bs[r.request_id].frames)


def test_pipelined_bitexact_when_no_churn(tiny):
    """With equal budgets (no mid-run capacity change) the pipelined
    server's sampled tokens are BIT-equal at temperature>0: the key
    schedule (step_count, row) is identical to the synchronous server."""
    args, params = tiny
    kw = dict(n_slots=2, max_seq_len=128, temperature=0.8, topk=5,
              compute_dtype=jnp.float32, chunk_size=4)
    mk = lambda: [make_request(args, 6, rid=i, seed=i + 1, max_frames=8)
                  for i in range(2)]
    rs, _ = BatchedServer(params, args, **kw).run(mk())
    rp, _ = BatchedServer(params, args, pipelined=True, **kw).run(mk())
    bs = {r.request_id: r for r in rs}
    for r in rp:
        np.testing.assert_array_equal(r.frames, bs[r.request_id].frames)


def test_pipelined_streaming_and_cancel(tiny):
    """Streaming callbacks under pipelining: done=True exactly once per
    request; cancel() drains the in-flight chunk, kills the slot, and
    the survivor still matches its solo decode."""
    args, params = tiny
    server = BatchedServer(params, args, n_slots=2, max_seq_len=128,
                           temperature=1.0, topk=1,
                           compute_dtype=jnp.float32, chunk_size=2,
                           pipelined=True)
    events = []
    r0 = make_request(args, 6, rid=0, seed=1, max_frames=20)
    r0.on_frames = lambda rid, new, done: events.append((rid, done))
    r1 = make_request(args, 6, rid=1, seed=2, max_frames=8)
    server.submit(r0)
    server.submit(r1)
    server.step()  # chunk 1 in flight
    server.step()  # chunk 2 in flight, chunk 1 collected
    res = server.cancel(0)
    assert res is not None and res.cancelled
    assert server._inflight is None  # drained at cancel
    assert [e for e in events if e[1]] == [(0, True)]
    results, _ = server.run([])
    by_id = {r.request_id: r for r in results}
    assert set(by_id) == {1}
    np.testing.assert_array_equal(by_id[1].frames, solo_frames(args, params, r1))


def test_pipelined_ramp_chunk_keeps_first_gather(tiny):
    """pipelined + ramp_chunk: the admission step goes synchronous, so
    first frames still land after <= ramp_chunk decoded frames."""
    args, params = tiny
    server = BatchedServer(params, args, n_slots=2, max_seq_len=128,
                           temperature=1.0, topk=1,
                           compute_dtype=jnp.float32, chunk_size=6,
                           ramp_chunk=2, pipelined=True)
    server.submit(make_request(args, 6, rid=0, seed=3, max_frames=12))
    server.step()
    n1 = len(server.slot_frames[0])
    assert 1 <= n1 <= 3  # f0 + at most ramp_chunk frames, fetched NOW
    server.run([])
    assert server.warmup() > 0  # warmup drops in-flight chunks safely


def test_warmup_compiles_every_compaction_size(tiny):
    """warmup() must build EVERY decode program a draining server can
    hit: each power-of-two compaction size <= n_slots/2 plus the
    full-batch program — a 'warmed' daemon otherwise pays one compile
    per size as its first batch drains (found by the one-window serving
    protocol: the first oversubscribed run landed 2-4x slow on exactly
    these)."""
    args, params = tiny
    srv = BatchedServer(params, args, n_slots=8, max_seq_len=128,
                        temperature=1.0, topk=1,
                        compute_dtype=jnp.float32, chunk_size=2)
    srv.warmup()
    sizes = {b for (b, c) in srv._decodes if c == srv.chunk_size}
    assert {1, 2, 4, 8} <= sizes, sizes
    assert not srv.active.any()
