"""Shared-prefix serving: cached context KV must be invisible.

A request served with ``prefix=`` (context KV seeded from
``register_prefix``) must produce exactly the tokens the same request
produces with the context frames inlined in its prompt — the reference
re-runs the context through the backbone on every call
(src/csm/generator.py:174-185); here that work happens once per preset.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csm_tpu.models.config import tiny_test_args
from csm_tpu.models.csm import init_csm_params
from csm_tpu.serving import BatchedServer, StreamRequest


@pytest.fixture(scope="module")
def tiny():
    args = tiny_test_args()
    params = init_csm_params(jax.random.key(0), args, jnp.float32)
    return args, params


def make_frames(args, T, seed, audio_rows=0):
    """(T, K+1) frames: optional leading audio-context rows + text rows."""
    rng = np.random.default_rng(seed)
    K = args.audio_num_codebooks
    tokens = np.zeros((T, K + 1), np.int32)
    mask = np.zeros((T, K + 1), bool)
    tokens[:audio_rows, :K] = rng.integers(1, args.audio_vocab_size,
                                           (audio_rows, K))
    mask[:audio_rows, :K] = True
    tokens[audio_rows:, -1] = rng.integers(1, args.text_vocab_size,
                                           T - audio_rows)
    mask[audio_rows:, -1] = True
    return tokens, mask


def _serve(server, reqs):
    results, _ = server.run(list(reqs))
    return {r.request_id: r.frames for r in results}


def test_prefix_matches_inline(tiny):
    """Same key, argmax decoding: prefix-cached == inlined context."""
    args, params = tiny
    ctx_t, ctx_m = make_frames(args, 40, seed=7, audio_rows=36)
    kw = dict(n_slots=2, max_seq_len=256, temperature=1.0, topk=1,
              compute_dtype=jnp.float32)

    inline = BatchedServer(params, args, **kw)
    reqs = []
    for rid, seed in ((0, 1), (1, 2)):
        txt_t, txt_m = make_frames(args, 9 + rid, seed=seed)
        reqs.append(StreamRequest(
            np.concatenate([ctx_t, txt_t]), np.concatenate([ctx_m, txt_m]),
            max_frames=5, request_id=rid,
        ))
    want = _serve(inline, reqs)

    pref = BatchedServer(params, args, **kw)
    pref.register_prefix("voice", ctx_t, ctx_m)
    preqs = []
    for rid, seed in ((0, 1), (1, 2)):
        txt_t, txt_m = make_frames(args, 9 + rid, seed=seed)
        preqs.append(StreamRequest(
            txt_t, txt_m, max_frames=5, request_id=rid, prefix="voice",
        ))
    got = _serve(pref, preqs)

    assert set(got) == set(want)
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid])


def test_prefix_and_plain_share_a_server(tiny):
    """Prefix-cached and plain requests interleave in one server; each
    matches its solo-inline oracle."""
    args, params = tiny
    ctx_t, ctx_m = make_frames(args, 20, seed=3, audio_rows=16)
    kw = dict(n_slots=2, max_seq_len=256, temperature=1.0, topk=1,
              compute_dtype=jnp.float32)

    txt_t, txt_m = make_frames(args, 7, seed=4)
    plain_t, plain_m = make_frames(args, 11, seed=5)

    inline = BatchedServer(params, args, **kw)
    want = _serve(inline, [
        StreamRequest(np.concatenate([ctx_t, txt_t]),
                      np.concatenate([ctx_m, txt_m]),
                      max_frames=4, request_id=0),
        StreamRequest(plain_t, plain_m, max_frames=4, request_id=1),
    ])

    mixed = BatchedServer(params, args, **kw)
    mixed.register_prefix("voice", ctx_t, ctx_m)
    got = _serve(mixed, [
        StreamRequest(txt_t, txt_m, max_frames=4, request_id=0,
                      prefix="voice"),
        StreamRequest(plain_t, plain_m, max_frames=4, request_id=1),
    ])
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid])


def test_prefix_int8_kv(tiny):
    """Prefix caching under the int8 KV cache (quantize-at-register ==
    quantize-at-prefill)."""
    args, params = tiny
    ctx_t, ctx_m = make_frames(args, 30, seed=11, audio_rows=24)
    txt_t, txt_m = make_frames(args, 8, seed=12)
    kw = dict(n_slots=1, max_seq_len=256, temperature=1.0, topk=1,
              compute_dtype=jnp.float32, kv_dtype="int8")

    inline = BatchedServer(params, args, **kw)
    want = _serve(inline, [StreamRequest(
        np.concatenate([ctx_t, txt_t]), np.concatenate([ctx_m, txt_m]),
        max_frames=4, request_id=0,
    )])
    pref = BatchedServer(params, args, **kw)
    pref.register_prefix("voice", ctx_t, ctx_m)
    got = _serve(pref, [StreamRequest(
        txt_t, txt_m, max_frames=4, request_id=0, prefix="voice",
    )])
    np.testing.assert_array_equal(got[0], want[0])


def test_slot_reuse_after_prefix_request(tiny):
    """A slot that served a prefix request admits a longer plain request
    next — stale prefix KV beyond the new offset must never be attended."""
    args, params = tiny
    ctx_t, ctx_m = make_frames(args, 40, seed=21, audio_rows=36)
    kw = dict(n_slots=1, max_seq_len=256, temperature=1.0, topk=1,
              compute_dtype=jnp.float32)
    plain_t, plain_m = make_frames(args, 6, seed=22)

    solo = BatchedServer(params, args, **kw)
    want = _serve(solo, [StreamRequest(plain_t, plain_m, max_frames=5,
                                       request_id=1)])

    server = BatchedServer(params, args, **kw)
    server.register_prefix("voice", ctx_t, ctx_m)
    txt_t, txt_m = make_frames(args, 8, seed=23)
    _serve(server, [StreamRequest(txt_t, txt_m, max_frames=5, request_id=0,
                                  prefix="voice")])
    got = _serve(server, [StreamRequest(plain_t, plain_m, max_frames=5,
                                        request_id=1)])
    np.testing.assert_array_equal(got[1], want[1])


def test_prefix_errors(tiny):
    args, params = tiny
    ctx_t, ctx_m = make_frames(args, 20, seed=31, audio_rows=16)
    txt_t, txt_m = make_frames(args, 6, seed=32)
    server = BatchedServer(params, args, n_slots=1, max_seq_len=128,
                           temperature=1.0, topk=1,
                           compute_dtype=jnp.float32)
    server.register_prefix("voice", ctx_t, ctx_m)

    with pytest.raises(ValueError, match="unknown prefix"):
        server.submit(StreamRequest(txt_t, txt_m, max_frames=2,
                                    request_id=0, prefix="nope"))
    # prefix bucket 32 + suffix bucket 64 + frames > 128
    with pytest.raises(ValueError, match="prefix bucket"):
        server.submit(StreamRequest(txt_t, txt_m, max_frames=40,
                                    request_id=1, prefix="voice"))
    with pytest.raises(ValueError, match="unknown adapter"):
        server.register_prefix("x", ctx_t, ctx_m, adapter="missing")
    # adapter mismatch: prefix computed under base, request names adapter
    srv2 = BatchedServer(params, args, n_slots=1, max_seq_len=256,
                         temperature=1.0, topk=1,
                         compute_dtype=jnp.float32)
    srv2.register_prefix("voice", ctx_t, ctx_m)
    srv2._adapter_id["spk"] = 1  # as if an adapter bank were loaded
    with pytest.raises(ValueError, match="computed under adapter"):
        srv2.submit(StreamRequest(txt_t, txt_m, max_frames=2,
                                  request_id=2, prefix="voice",
                                  adapter="spk"))


def test_unregister_and_hot_swap_prefix(tiny):
    """unregister_prefix frees the name for future admissions only, and
    re-registering under the same name swaps the preset: subsequent
    requests decode exactly as under a fresh server with the new context."""
    args, params = tiny
    kw = dict(n_slots=1, max_seq_len=256, temperature=1.0, topk=1,
              compute_dtype=jnp.float32)
    ctx_a = make_frames(args, 20, seed=61, audio_rows=16)
    ctx_b = make_frames(args, 24, seed=62, audio_rows=20)
    txt_t, txt_m = make_frames(args, 6, seed=63)
    req = lambda rid: StreamRequest(txt_t, txt_m, max_frames=3,
                                    request_id=rid, prefix="voice")

    # oracles: each context registered on its own fresh server
    want = {}
    for key, (ct, cm) in (("a", ctx_a), ("b", ctx_b)):
        srv = BatchedServer(params, args, **kw)
        srv.register_prefix("voice", ct, cm)
        want[key] = _serve(srv, [req(0)])[0]

    server = BatchedServer(params, args, **kw)
    server.register_prefix("voice", *ctx_a)
    np.testing.assert_array_equal(_serve(server, [req(0)])[0], want["a"])
    server.unregister_prefix("voice")
    with pytest.raises(ValueError, match="unknown prefix"):
        server.submit(req(1))
    with pytest.raises(ValueError, match="unknown prefix"):
        server.unregister_prefix("voice")
    server.register_prefix("voice", *ctx_b)  # hot swap
    np.testing.assert_array_equal(_serve(server, [req(2)])[2], want["b"])


def test_prefix_too_long_rejected(tiny):
    args, params = tiny
    server = BatchedServer(params, args, n_slots=1, max_seq_len=64,
                           temperature=1.0, topk=1,
                           compute_dtype=jnp.float32)
    ctx_t, ctx_m = make_frames(args, 60, seed=41, audio_rows=50)
    with pytest.raises(ValueError, match="leaves no room"):
        server.register_prefix("big", ctx_t, ctx_m)


def test_warmup_covers_prefix_programs(tiny):
    """warmup() also compiles the (prefix, suffix) admission programs."""
    args, params = tiny
    ctx_t, ctx_m = make_frames(args, 20, seed=51, audio_rows=16)
    server = BatchedServer(params, args, n_slots=1, max_seq_len=256,
                           temperature=1.0, topk=1,
                           compute_dtype=jnp.float32)
    server.register_prefix("voice", ctx_t, ctx_m)
    server.warmup()
    assert (32, 64) in server._prefix_prefills  # ctx 20 -> bucket 32
    txt_t, txt_m = make_frames(args, 6, seed=52)
    results, _ = server.run([StreamRequest(
        txt_t, txt_m, max_frames=3, request_id=0, prefix="voice")])
    assert results and results[0].frames.shape[0] <= 3
