"""Batched serving: continuous frame-level batching of generation streams.

The stretch-goal capability from BASELINE.json (config 5: "batched
serving, 64 concurrent streams, continuous frame-level batching").  The
reference cannot serve more than one stream — its cache setup is
hardwired to batch 1 (src/csm/generator.py:62).

Design (TPU-first):
  * ONE resident FrameState sized (n_slots, max_seq): all active streams
    decode together in a single jitted ``decode_step`` per 80 ms frame —
    the backbone/decoder weight reads (the single-stream bottleneck,
    docs/architecture.md) amortize across slots;
  * admission is per-slot PREFILL into the shared cache: a new request's
    prompt runs through the backbone with its KV written at that slot's
    rows only (other slots' cache entries are untouched — functional
    update at batch index);
  * finished slots (EOS or frame budget) free immediately and can admit
    a new request at the next frame boundary — continuous batching;
  * every jitted program is shape-static: (n_slots, bucket) prefill and
    (n_slots, 1) decode, so steady-state serving never recompiles.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from csm_tpu.models import csm
from csm_tpu.models.config import ModelArgs
from csm_tpu.models.generation import PROMPT_BUCKETS, bucket_length
from csm_tpu.ops.kvcache import KVCache


@dataclasses.dataclass
class StreamRequest:
    """One TTS request (prompt already packed to (T, K+1) frames)."""

    tokens: np.ndarray  # (T, K+1) int32
    mask: np.ndarray  # (T, K+1) bool
    max_frames: int
    request_id: int = 0


@dataclasses.dataclass
class StreamResult:
    request_id: int
    frames: np.ndarray  # (n, K) int32 audio codes
    n_steps: int


class BatchedServer:
    """Continuous-batching decode server over ``n_slots`` streams."""

    def __init__(
        self,
        params: dict,
        args: ModelArgs,
        n_slots: int = 8,
        max_seq_len: int = 2048,
        temperature: float = 0.9,
        topk: int = 50,
        compute_dtype=jnp.bfloat16,
        chunk_size: int = 1,
    ):
        """``chunk_size`` — decode frames per host round-trip: EOS/admission
        latency granularity trades against per-dispatch overhead (a chunk
        runs as one ``lax.scan`` inside one jit; 8 ≈ 0.64 s of audio).

        ``temperature`` is a runtime argument of the compiled programs
        (mutate ``self.temperature`` freely); ``topk`` is compile-static."""
        self.params = params
        self.args = args
        self.n_slots = n_slots
        self.max_seq_len = max_seq_len
        self.temperature = temperature
        self.topk = topk
        self.compute_dtype = compute_dtype
        self.chunk_size = chunk_size
        K = args.audio_num_codebooks

        self.state = csm.init_frame_state(
            args, n_slots, compute_dtype, max_seq_len=max_seq_len
        )
        # per-row cache offsets: each slot's row fills independently and
        # resets on admission — a slot never exhausts the cache as long as
        # prompt_bucket + max_frames <= max_seq_len (enforced in submit)
        self.state = self.state._replace(
            offset=jnp.zeros(n_slots, jnp.int32)
        )
        # Per-slot host bookkeeping.
        self.slot_request: List[Optional[StreamRequest]] = [None] * n_slots
        self.slot_frames: List[List[np.ndarray]] = [[] for _ in range(n_slots)]
        self.slot_pos = np.zeros(n_slots, np.int64)  # next absolute position
        self.slot_budget = np.zeros(n_slots, np.int64)
        self.active = np.zeros(n_slots, bool)
        self.last_frame = jnp.zeros((n_slots, K), jnp.int32)
        self._step_count = 0
        self._key = jax.random.key(0)
        # streams that finish during submit() (immediate EOS / budget <= 1)
        # surface through the next step()/run() drain
        self._finished_at_submit: List[StreamResult] = []

        self._decode = self._build_decode()
        self._prefills: Dict[int, Callable] = {}

    def reset(self, seed: int = 0):
        """Clear all streams/state; compiled programs stay cached."""
        K = self.args.audio_num_codebooks
        self.state = csm.init_frame_state(
            self.args, self.n_slots, self.compute_dtype,
            max_seq_len=self.max_seq_len,
        )._replace(offset=jnp.zeros(self.n_slots, jnp.int32))
        self.slot_request = [None] * self.n_slots
        self.slot_frames = [[] for _ in range(self.n_slots)]
        self.slot_pos[:] = 0
        self.slot_budget[:] = 0
        self.active[:] = False
        self.last_frame = jnp.zeros((self.n_slots, K), jnp.int32)
        self._finished_at_submit = []
        self._key = jax.random.key(seed)

    # ---- compiled programs ----

    def _build_decode(self):
        args, K = self.args, self.args.audio_num_codebooks
        B = self.n_slots
        n_chunk = self.chunk_size
        step_mask_live = jnp.zeros((1, K + 1), bool).at[0, :K].set(True)

        @jax.jit
        def decode(params, key, state: csm.FrameState, last_frame, pos, active,
                   temperature):
            """``n_chunk`` decode steps in one compiled program (lax.scan):
            the per-dispatch host latency amortizes across the chunk.
            Rows that hit EOS mid-chunk go dead for the rest of the chunk.
            Inactive slots run dead tokens at PAD_POS — harmless rows.
            """

            def step(carry, key_i):
                state, frame, pos, live = carry
                tokens = (
                    jnp.zeros((B, 1, K + 1), jnp.int32).at[:, 0, :K].set(frame)
                )
                mask = jnp.broadcast_to(step_mask_live[None], (B, 1, K + 1)) & live[
                    :, None, None
                ]
                p = jnp.where(live, pos, csm.PAD_POS).astype(jnp.int32)[:, None]
                new_frame, state = csm.generate_frame(
                    params, args, key_i, tokens, mask, p, state,
                    temperature, self.topk, self.compute_dtype,
                )
                live = live & ~jnp.all(new_frame == 0, axis=1)
                new_frame = jnp.where(live[:, None], new_frame, 0)
                return (state, new_frame, pos + 1, live), new_frame

            keys = jax.random.split(key, n_chunk)
            (state, frame, _, _), frames = jax.lax.scan(
                step, (state, last_frame, pos, active), keys
            )
            # per-row offsets advance by n_chunk; idle rows write PAD_POS
            # entries (never attended) and reset at the next admission
            return frames, frame, state  # frames: (n_chunk, B, K)

        return decode

    def _prefill_fn(self, bucket: int):
        """Compiled per-slot prefill: run the prompt for ONE slot and merge
        its cache rows into the shared state."""
        if bucket in self._prefills:
            return self._prefills[bucket]
        args, K = self.args, self.args.audio_num_codebooks

        @jax.jit
        def prefill(params, key, state: csm.FrameState, slot, tokens, mask, length,
                    temperature):
            sub = csm.init_frame_state(
                args, 1, self.compute_dtype, max_seq_len=state.cache.max_seq_len
            )
            col = jnp.arange(tokens.shape[1], dtype=jnp.int32)
            pos = jnp.where(col[None, :] < length, col[None, :], csm.PAD_POS)
            frame, sub = csm.generate_frame(
                params, args, key, tokens, mask, pos, sub,
                temperature, self.topk, self.compute_dtype,
                last_idx=length[None] - 1,
            )
            # merge slot rows into the shared state
            k = jax.lax.dynamic_update_slice(
                state.cache.k, sub.cache.k[:, :1], (0, slot, 0, 0, 0)
            )
            v = jax.lax.dynamic_update_slice(
                state.cache.v, sub.cache.v[:, :1], (0, slot, 0, 0, 0)
            )
            kv_pos = jax.lax.dynamic_update_slice(
                state.kv_pos, sub.kv_pos[:1], (slot, 0)
            )
            offset = state.offset.at[slot].set(sub.offset)
            return frame[0], csm.FrameState(KVCache(k, v), offset, kv_pos)

        self._prefills[bucket] = prefill
        return prefill

    # ---- host-side orchestration ----

    def submit(self, req: StreamRequest) -> Optional[int]:
        """Admit a request into a free slot (prefill now); None if full."""
        free = np.nonzero(~self.active)[0]
        if len(free) == 0:
            return None
        slot = int(free[0])
        T = req.tokens.shape[0]
        bucket = bucket_length(
            T, tuple(b for b in PROMPT_BUCKETS if b <= self.max_seq_len)
        )
        if bucket + req.max_frames + self.chunk_size > self.max_seq_len:
            raise ValueError(
                f"request {req.request_id}: prompt bucket {bucket} + "
                f"max_frames {req.max_frames} (+chunk {self.chunk_size}) "
                f"exceeds max_seq_len {self.max_seq_len}"
            )
        K = self.args.audio_num_codebooks
        toks = np.zeros((1, bucket, K + 1), np.int32)
        msk = np.zeros((1, bucket, K + 1), bool)
        toks[0, :T] = req.tokens
        msk[0, :T] = req.mask

        self._key, sub = jax.random.split(self._key)
        prefill = self._prefill_fn(bucket)
        frame0, self.state = prefill(
            self.params, sub, self.state, jnp.int32(slot),
            jnp.asarray(toks), jnp.asarray(msk), jnp.asarray(T, jnp.int32),
            jnp.float32(self.temperature),
        )

        self.slot_request[slot] = req
        self.slot_frames[slot] = []
        self.slot_pos[slot] = T
        self.slot_budget[slot] = req.max_frames
        self.active[slot] = True
        f0 = np.asarray(frame0)
        if np.all(f0 == 0) or req.max_frames < 1:  # immediate EOS / no budget
            self._finished_at_submit.append(self._finish(slot))
        else:
            self.slot_frames[slot].append(f0)
            self.last_frame = self.last_frame.at[slot].set(frame0)
            if req.max_frames == 1:
                self._finished_at_submit.append(self._finish(slot))
        return slot

    def step(self) -> List[StreamResult]:
        """Advance every active stream by one chunk of frames; returns
        finished streams."""
        done: List[StreamResult] = self._finished_at_submit
        self._finished_at_submit = []
        if not self.active.any():
            return done
        self._key, sub = jax.random.split(self._key)
        # the fed token is frame #(n-1), at absolute position prompt_len+n-1
        pos = jnp.asarray(
            self.slot_pos + np.array([len(f) for f in self.slot_frames]) - 1,
            jnp.int32,
        )
        frames, last, self.state = self._decode(
            self.params, sub, self.state, self.last_frame, pos,
            jnp.asarray(self.active), jnp.float32(self.temperature),
        )
        self.last_frame = last
        self._step_count += self.chunk_size

        f_host = np.asarray(frames)  # (chunk, B, K)
        for slot in np.nonzero(self.active)[0]:
            s = int(slot)
            for t in range(f_host.shape[0]):
                f = f_host[t, s]
                if np.all(f == 0):  # EOS (device zeroes post-EOS frames)
                    done.append(self._finish(s))
                    break
                self.slot_frames[s].append(f)
                if len(self.slot_frames[s]) >= self.slot_budget[s]:
                    done.append(self._finish(s))
                    break
        return done

    def _finish(self, slot: int) -> StreamResult:
        req = self.slot_request[slot]
        frames = (
            np.stack(self.slot_frames[slot])
            if self.slot_frames[slot]
            else np.zeros((0, self.args.audio_num_codebooks), np.int32)
        )
        res = StreamResult(req.request_id, frames, len(self.slot_frames[slot]))
        self.active[slot] = False
        self.slot_request[slot] = None
        self.slot_frames[slot] = []
        return res

    def run(self, requests: List[StreamRequest], max_steps: int = 10_000):
        """Serve a request list to completion; returns (results, stats)."""
        pending = list(requests)
        results: List[StreamResult] = []
        t0 = time.time()
        steps = 0
        while (pending or self.active.any()) and steps < max_steps:
            while pending and self.submit(pending[0]) is not None:
                pending.pop(0)
            results.extend(self.step())
            steps += 1
        wall = time.time() - t0
        total_frames = sum(r.n_steps for r in results)
        stats = {
            "wall_s": wall,
            "decode_steps": steps,
            "total_frames": total_frames,
            "frames_per_s": total_frames / max(wall, 1e-9),
            "aggregate_rtf": total_frames / 12.5 / max(wall, 1e-9),
        }
        return results, stats
