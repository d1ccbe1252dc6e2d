"""Sliding-window KV serving (round-4 verdict Missing #4): unbounded
sessions with a never-evicted prompt anchor and ring-written decode
frames, plus the rare RoPE re-anchor that keeps positions below the
horizon forever.

The reference lists sliding-window context management as its deployment
future-work item (docs/reference/sesame_csm/inference.md:148-152) and
hard-stops at 2048 (src/csm/generator.py:192-194).

Mechanism facts these tests pin down:
  * inside the window, windowed == plain serving bit-for-bit;
  * beyond it, the ring state equals an explicit-eviction oracle
    (full cache with evicted entries' kv_pos forced to PAD_POS);
  * the re-anchor rotation preserves greedy decode exactly;
  * a session longer than max_seq_len runs to completion at a flat
    per-chunk cost (the capability itself).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csm_tpu.models import csm
from csm_tpu.models.config import tiny_test_args, with_horizon
from csm_tpu.models.csm import init_csm_params
from csm_tpu.serving import BatchedServer, StreamRequest

ARGS = tiny_test_args()
K = ARGS.audio_num_codebooks


@pytest.fixture(scope="module")
def params():
    return init_csm_params(jax.random.key(0), ARGS, jnp.float32)


def _req(rid=0, T=20, max_frames=24, seed=3):
    rng = np.random.default_rng(seed)
    tokens = np.zeros((T, K + 1), np.int32)
    mask = np.zeros((T, K + 1), bool)
    tokens[:, -1] = rng.integers(1, ARGS.text_vocab_size, T)
    mask[:, -1] = True
    return StreamRequest(tokens, mask, max_frames=max_frames, request_id=rid)


def _serve(params, window, req, **kw):
    srv = BatchedServer(
        params, ARGS, n_slots=2, max_seq_len=128, temperature=1.0,
        topk=1, compute_dtype=jnp.float32, chunk_size=4, window=window,
        **kw,
    )
    results, _ = srv.run([req])
    return results[0]


def test_windowed_matches_plain_inside_window(params):
    """No eviction happened (prompt + frames fit the window) → identical
    frames to the unwindowed server, same seed."""
    req = _req(max_frames=20)
    plain = _serve(params, None, _req(max_frames=20))
    windowed = _serve(params, 96, req)  # anchor 64-bucket + ring 32 > 20
    np.testing.assert_array_equal(plain.frames, windowed.frames)


def test_ring_eviction_matches_explicit_eviction_oracle(params):
    """Beyond the window the ring overwrites the oldest decode column.
    Drive generate_frame directly: ring writes into a W-column cache must
    produce the same greedy tokens as a BIG cache where evicted entries'
    kv_pos are forced to PAD_POS (explicit eviction)."""
    anchor, ring = 8, 6
    W = anchor + ring
    steps = 16  # > ring: several wraps
    args = ARGS
    rng = np.random.default_rng(0)
    prompt = np.zeros((1, anchor, K + 1), np.int32)
    pmask = np.zeros((1, anchor, K + 1), bool)
    prompt[0, :, -1] = rng.integers(1, args.text_vocab_size, anchor)
    pmask[0, :, -1] = True

    @jax.jit
    def prefill(state):
        pos = jnp.arange(anchor, dtype=jnp.int32)[None]
        return csm.generate_frame(
            params, args, jax.random.key(1), jnp.asarray(prompt),
            jnp.asarray(pmask), pos, state, 1.0, 1, jnp.float32,
        )

    @jax.jit
    def step(key, frame, pos, state):
        tokens = jnp.zeros((1, 1, K + 1), jnp.int32).at[:, 0, :K].set(frame)
        mask = jnp.zeros((1, 1, K + 1), bool).at[:, 0, :K].set(True)
        return csm.generate_frame(
            params, args, key, tokens, mask,
            jnp.full((1, 1), pos, jnp.int32), state, 1.0, 1, jnp.float32,
        )

    # ring run: W-column cache, decode writes wrap over [anchor, W)
    st_ring = csm.init_frame_state(args, 1, jnp.float32, max_seq_len=W)
    f_ring, st_ring = prefill(st_ring)
    # oracle run: big cache, then evict by PAD_POS-ing old decode entries
    st_big = csm.init_frame_state(args, 1, jnp.float32, max_seq_len=128)
    f_big, st_big = prefill(st_big)
    np.testing.assert_array_equal(np.asarray(f_ring), np.asarray(f_big))

    frame_r, frame_b = f_ring, f_big  # (1, K)
    for t in range(steps):
        pos = anchor + t
        # wrap the ring write column
        off = anchor + (int(st_ring.offset) - anchor) % ring
        st_ring = st_ring._replace(offset=jnp.int32(off))
        frame_r, st_ring = step(jax.random.key(10 + t), frame_r, pos, st_ring)
        # oracle: evict decode entries older than the ring capacity
        # (positions in [anchor, pos - ring]), keep the anchor
        kv = np.array(st_big.kv_pos)  # writable copy
        evict = (kv >= anchor) & (kv <= pos - ring)
        kv[evict] = csm.PAD_POS
        st_big = st_big._replace(kv_pos=jnp.asarray(kv))
        frame_b, st_big = step(jax.random.key(10 + t), frame_b, pos, st_big)
        np.testing.assert_array_equal(
            np.asarray(frame_r), np.asarray(frame_b),
            err_msg=f"step {t} (pos {pos})",
        )


def test_unbounded_session_runs_past_max_seq_len(params):
    """A stream longer than the cache would ever hold finishes (the
    reference hard-stops at prompt+frames > 2048)."""
    res = _serve(params, 96, _req(max_frames=220))
    assert res.n_steps == 220  # never EOSed (random weights), full budget


def test_reanchor_preserves_greedy_decode(params):
    """Forcing frequent re-anchors (tiny headroom) must not change the
    greedy token stream: RoPE rotation by -delta composes exactly."""
    req = _req(max_frames=160, T=12)
    # big headroom: no re-anchor ever fires below pos ~2048
    base = _serve(params, 96, _req(max_frames=160, T=12))
    # tiny headroom: re-anchor fires every ~30 frames
    often = _serve(params, 96, req, reanchor_headroom=30)
    np.testing.assert_array_equal(base.frames, often.frames)


def test_reanchor_preserves_greedy_decode_int8_kv(params):
    """Same with the int8 KV cache: the re-anchor dequantizes, rotates,
    and requantizes only the ring region (anchors keep exact codes)."""
    base = _serve(params, 96, _req(max_frames=160, T=12), kv_dtype="int8")
    often = _serve(params, 96, _req(max_frames=160, T=12), kv_dtype="int8",
                   reanchor_headroom=30)
    # requantization after rotation injects one extra int8 rounding on
    # ring rows; greedy tokens still match on the tiny model
    np.testing.assert_array_equal(base.frames, often.frames)


def test_windowed_rejects_promptonly_window(params):
    srv = BatchedServer(
        params, ARGS, n_slots=1, max_seq_len=128, temperature=1.0,
        topk=1, compute_dtype=jnp.float32, chunk_size=4, window=66,
    )
    with pytest.raises(ValueError, match="ring"):
        srv.submit(_req(T=20, max_frames=10))  # bucket 64 + 10 > 66


def test_with_horizon_extends_rope_only():
    a = with_horizon(ARGS, 4096)
    assert a.backbone.max_seq_len == 4096
    assert a.decoder.max_seq_len == ARGS.decoder.max_seq_len
    assert a.audio_vocab_size == ARGS.audio_vocab_size
    assert with_horizon(ARGS, 16) is ARGS  # never shrinks


def test_windowed_pipelined_matches_sync(params):
    """window + pipelined: same greedy frames as the synchronous server."""
    sync = _serve(params, 96, _req(max_frames=100, T=12))
    pipe = _serve(params, 96, _req(max_frames=100, T=12), pipelined=True)
    np.testing.assert_array_equal(sync.frames, pipe.frames)
