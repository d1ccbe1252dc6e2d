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
    (n_slots, 1) decode, so steady-state serving never recompiles;
  * the control plane is ON DEVICE (round-2): per-slot positions, frame
    budgets, liveness and last-frame feedback live in a device-resident
    ``SlotState`` carried across chunks — a ``lax.while_loop`` emits up
    to ``chunk_size`` frames and exits early the moment no slot is live.
    Per chunk the host does ONE dispatch and ONE gather of
    (frames, counts, live); per admission, one prefill + one slot write
    and ZERO host fetches — the prefill frame stays on device (the
    control plane already decided EOS/liveness there) and rides the next
    chunk's gather.
    Cache and slot buffers are donated, so steady-state serving holds a
    single copy of the KV cache in HBM;
  * optional ``mesh``: slots shard over the ``data`` axis and weights/KV
    heads over ``model`` (csm_tpu/parallel/inference.py) — multi-chip
    serving (BASELINE config 5; the v5e-8 plan in docs/architecture.md
    is data=8, model=1).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from csm_tpu.models import csm
from csm_tpu.models.config import ModelArgs
from csm_tpu.models.generation import PROMPT_BUCKETS, bucket_length
from csm_tpu.ops.kvcache import KVCache, QuantKV

# weight_dtype="auto" policy, measured on v5e (scripts/bench_serving.py
# --int8 vs bf16; see BENCHMARKS.md).  With the on-device control plane,
# int8 wins at EVERY measured slot count (1..64, up to +41%) — round-1's
# "int8 loses at 64 slots" was host-dispatch overhead, not dequant cost —
# and the gap only narrows (never reverses) as weight reads amortize over
# more slots, so "auto" picks int8 at ANY slot count.  bf16 stays the
# explicit-opt-in DEFAULT until int8 quality is validated on real
# checkpoints.  PROMOTION RULE (what flips the default to "auto"): run
# scripts/validate_real_weights.py on real CSM-1B weights; int8 is
# promoted iff c0-logit KL(int8 || bf16) < 0.01 nats AND greedy (T=0)
# frame-token match rate >= 0.95 over the validation prompts.  On
# random-init weights the measured c0 KL is 0.0011 (BENCHMARKS.md).


@dataclasses.dataclass
class StreamRequest:
    """One TTS request (prompt already packed to (T, K+1) frames).

    ``on_frames`` — optional streaming callback
    ``(request_id, new_frames (n, K) int32, done: bool)`` invoked as
    decode chunks complete (per-request streaming under continuous
    batching; the single-stream analogue is
    ``Generator.generate_streaming``).  Called from the serving thread;
    ``done=True`` fires exactly once, possibly with n=0 frames.
    """

    tokens: np.ndarray  # (T, K+1) int32
    mask: np.ndarray  # (T, K+1) bool
    max_frames: int
    request_id: int = 0
    on_frames: Optional[Callable[[int, np.ndarray, bool], None]] = None
    adapter: Optional[str] = None  # LoRA adapter name (multi-LoRA serving)
    # name of a prefix registered via BatchedServer.register_prefix: the
    # slot's cache is seeded with the cached context KV and ``tokens``
    # holds ONLY the request's own frames (shared-prefix serving)
    prefix: Optional[str] = None


@dataclasses.dataclass
class StreamResult:
    request_id: int
    frames: np.ndarray  # (n, K) int32 audio codes
    n_steps: int
    cancelled: bool = False  # aborted via BatchedServer.cancel()


class CachedPrefix(NamedTuple):
    """A precomputed backbone-KV prefix (shared conversation context).

    Production TTS serving reuses the same voice-preset context (prompt
    audio + transcript segments) across many requests; the reference
    re-runs the whole context through the backbone — and re-encodes the
    context audio through Mimi — on EVERY call
    (src/csm/generator.py:174-185).  ``register_prefix`` runs that work
    ONCE; admission of a request naming the prefix seeds the slot's cache
    rows with these K/V blocks (a ~2 bytes/token/layer/head device copy)
    and prefills only the request's own text frames.

    Device-resident.  Memory per prefix: L·PB·Hkv·D·2(k,v)·2B — ~32 KB per
    token for CSM-1B bf16, halved under ``kv_dtype="int8"``.
    """

    k: object  # tree (L, 1, PB, Hkv, D): array, or QuantKV halves
    v: object
    kv_pos: jnp.ndarray  # (1, PB) int32 absolute positions (PAD_POS pad)
    length: int  # real token count (host int)
    bucket: int  # PB — cache columns the prefix occupies (host int)
    adapter: Optional[str]  # adapter the prefix was computed under


class SlotState(NamedTuple):
    """Device-resident per-slot control state (the serving control plane).

    Carried through every decode chunk; the host mirrors ``live`` lazily
    (refreshed from each chunk's results) and writes entries only at
    admission time.
    """

    last_frame: jnp.ndarray  # (B, K) int32 — fed back as the next token
    pos: jnp.ndarray  # (B,) int32 — absolute position of the fed token
    live: jnp.ndarray  # (B,) bool
    remaining: jnp.ndarray  # (B,) int32 — frames the slot may still emit
    # sliding-window serving: cache columns [0, anchor) hold the prompt /
    # prefix (never evicted); decode frames ring-write over
    # [anchor, cache_len).  0 (and unused) outside windowed mode.
    anchor: jnp.ndarray  # (B,) int32


class _InFlight(NamedTuple):
    """A dispatched-but-unfetched decode chunk (``pipelined=True``).

    Everything ``_collect`` needs to drain the chunk one step later:
    device handles for the chunk outputs plus the host-side slot↔row
    map frozen at dispatch time.  ``live`` is a ``jnp.copy`` of the
    chunk's liveness output — the original buffer gets DONATED by the
    next chunk's dispatch (full-batch path) or by a submit's admit
    before this chunk is fetched.  ``gens`` snapshots each slot's
    admission generation so frames/finish decisions only ever apply to
    the request that was resident at dispatch time (a slot that
    finished in this chunk and was re-admitted before the fetch must
    not have its NEW request touched by the stale rows).
    """

    frames: jnp.ndarray  # (chunk, B, K) device handle
    counts: jnp.ndarray  # (B,) device handle
    live: jnp.ndarray  # (B,) device handle (copied — donation-safe)
    pend: dict  # slot -> deferred prefill frame0 device handle
    live_idx: np.ndarray  # active slots at dispatch time
    row_of: dict  # slot -> row in the (possibly compacted) chunk
    gens: dict  # slot -> admission generation at dispatch time


def build_decode_fn(
    args: ModelArgs, B: int, chunk_size: int, topk: int, compute_dtype,
    windowed: bool = False,
):
    """The serving decode-chunk program (un-jitted) — the on-device
    control plane (VERDICT round-1 item #5):

      * per-slot ``remaining`` budgets decrement on device; a slot that
        exhausts its budget or hits EOS goes dead immediately (no
        overshoot frames to discard on host);
      * the ``lax.while_loop`` exits as soon as NO slot is live — a
        single stream that EOSes 2 frames into a 16-frame chunk pays for
        2 frames, not 16;
      * the host drains ``counts[s]`` valid frames per slot (live slots
        emit a prefix of the chunk — they never pause).

    Still-idle-but-allocated slots run dead tokens at PAD_POS (static
    shapes).  On a single device, ``step()`` compacts the LIVE slots
    into the smallest power-of-two decode variant before dispatch, so
    mostly-idle servers don't pay full-batch compute (``_compact_fns``).

    Module-level (not a method) so the 8B serving fit proof can AOT-
    compile the EXACT production program against a TPU topology
    (__graft_entry__._compile_8b_serving).
    """
    K = args.audio_num_codebooks
    n_chunk = chunk_size
    step_mask_live = jnp.zeros((1, K + 1), bool).at[0, :K].set(True)

    def decode(params, base_key, step_idx, state: csm.FrameState,
               slots: SlotState, temperature, bank=None, adapter_ids=None):
        # ``bank``/``adapter_ids`` — optional multi-LoRA adapter bank
        # (training/lora.fuse_lora_bank) + per-slot ids: every slot decodes
        # with ITS OWN fine-tune in the same batched program (id 0 = base)
        key = jax.random.fold_in(base_key, step_idx)
        frames_buf = jnp.zeros((n_chunk, B, K), jnp.int32)
        counts = jnp.zeros((B,), jnp.int32)

        def cond(c):
            t, _, slots = c[0], c[1], c[2]
            return (t < n_chunk) & jnp.any(slots.live)

        def body(c):
            t, state, slots, frames_buf, counts = c
            live = slots.live
            if windowed:
                # ring write: decode columns wrap over [anchor, C) while
                # positions stay absolute — the position-tagged cache
                # (kv_pos + causal_mask_from_positions) makes slot ORDER
                # irrelevant, so overwriting the oldest column IS the
                # sliding-window eviction (reference lists this as
                # deployment future work,
                # docs/reference/sesame_csm/inference.md:148-152)
                C = state.cache.max_seq_len
                ring = jnp.maximum(C - slots.anchor, 1)
                off = slots.anchor + jnp.remainder(
                    state.offset - slots.anchor, ring
                )
                state = state._replace(offset=off)
            tokens = (
                jnp.zeros((B, 1, K + 1), jnp.int32)
                .at[:, 0, :K].set(slots.last_frame)
            )
            mask = jnp.broadcast_to(
                step_mask_live[None], (B, 1, K + 1)
            ) & live[:, None, None]
            p = jnp.where(live, slots.pos, csm.PAD_POS).astype(jnp.int32)[
                :, None
            ]
            new_frame, state = csm.generate_frame(
                params, args, jax.random.fold_in(key, t), tokens, mask, p,
                state, temperature, topk, compute_dtype,
                lora=bank, lora_ids=adapter_ids,
            )
            emit = live & ~jnp.all(new_frame == 0, axis=1)  # EOS emits 0
            new_frame = jnp.where(emit[:, None], new_frame, 0)
            frames_buf = jax.lax.dynamic_update_slice(
                frames_buf, new_frame[None], (t, 0, 0)
            )
            counts = counts + emit.astype(jnp.int32)
            rem = slots.remaining - emit.astype(jnp.int32)
            slots = SlotState(
                last_frame=jnp.where(
                    emit[:, None], new_frame, slots.last_frame
                ),
                pos=slots.pos + 1,
                live=emit & (rem > 0),
                remaining=rem,
                anchor=slots.anchor,
            )
            return t + 1, state, slots, frames_buf, counts

        _, state, slots, frames_buf, counts = jax.lax.while_loop(
            cond, body, (jnp.int32(0), state, slots, frames_buf, counts)
        )
        return frames_buf, counts, slots, state

    return decode


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
        chunk_size: int = 8,
        ramp_chunk: Optional[int] = None,
        mesh=None,
        weight_dtype: str = "bf16",
        kv_dtype: str = "bf16",
        adapters: Optional[dict] = None,
        pipelined: bool = False,
        window: Optional[int] = None,
        reanchor_headroom: int = 1024,
    ):
        """``chunk_size`` — max decode frames per host round-trip: admission
        latency granularity trades against per-dispatch overhead (a chunk
        runs as one ``lax.while_loop`` inside one jit and EXITS EARLY when
        every slot is dead, so large chunks no longer overshoot EOS or
        budgets; 8 ≈ 0.64 s of audio).

        ``ramp_chunk`` — optional short chunk (< chunk_size) used for the
        one step right after an admission: the first gather (carrying the
        deferred prefill frame + the first decoded frames) lands after
        ``ramp_chunk`` frames instead of ``chunk_size``, cutting streaming
        time-to-first-audio by ~(chunk_size − ramp_chunk) frame times at
        the cost of one extra host round-trip per admission.  Chunking
        feeds the sampling key schedule, so tokens differ from an
        un-ramped server at temperature > 0 (equal at topk=1).

        ``temperature`` is a runtime argument of the compiled programs
        (mutate ``self.temperature`` freely); ``topk`` is compile-static.

        ``mesh`` — optional ``jax.sharding.Mesh`` with (data, model) axes:
        slots shard over data (n_slots must divide evenly), weights TP
        over model. None = single device.

        ``weight_dtype`` — "bf16" (keep params as passed), "int8"
        (quantize the transformer projections: csm_tpu/utils/quantize.py),
        or "auto" (= int8 at every slot count: measured faster at 1..64
        slots, up to +41%, and the trend only narrows with more slots —
        see the policy + promotion-rule comment at the top of this file).
        bf16 remains the conservative default until int8 quality is
        validated against real checkpoints
        (scripts/validate_real_weights.py does that when weights are
        supplied).

        ``kv_dtype`` — "bf16" or "int8": KV-cache storage.  int8
        quantizes K/V rows at write (per-position-per-head scales,
        csm_tpu/ops/kvcache.py) and dequantizes inside the attention
        load — halves the decode-time cache HBM stream AND doubles the
        slot capacity per GiB (the serving ceiling per BENCHMARKS.md).

        ``pipelined`` — keep ONE decode chunk in flight: ``step()``
        dispatches chunk N+1 before fetching chunk N's results, so the
        device never idles waiting for the host round-trip (the
        control plane is on device; chaining dispatches is exact).
        Throughput mode for daemons.  Trade-offs: a freed slot is
        visible for re-admission one chunk later; `cancel` first drains
        the in-flight chunk; and because the host's liveness view lags
        one chunk, compaction capacities — and with them the sampling
        key schedule — can differ from the unpipelined server during
        churn, so tokens are distribution-identical but not bit-equal
        at temperature > 0 (same caveat as ``ramp_chunk``; equal at
        topk=1).  With ``ramp_chunk`` set, admission steps drop to
        synchronous dispatch so time-to-first-audio keeps the ramp
        win."""
        # ``window`` — sliding-window KV for UNBOUNDED sessions: the cache
        # shrinks to ``window`` columns; each slot keeps its prompt/prefix
        # as a never-evicted anchor and ring-writes decode frames over the
        # rest, so a stream attends to [prompt] + [most recent frames] at
        # true relative distances and never hard-stops at max_seq_len.
        # Positions stay absolute; when a slot's position nears the RoPE
        # horizon, a rare compiled re-anchor shifts its ring positions
        # down and rotates the cached ring K by the same delta (RoPE is
        # relative: scores are exactly preserved), so session length is
        # unbounded.  max_frames is not admission-capped in this mode.
        self.window = window
        if window is not None:
            if window > max_seq_len:
                raise ValueError(
                    f"window {window} exceeds max_seq_len {max_seq_len}")
            if window < 2 * chunk_size + 2:
                raise ValueError(
                    f"window {window} is too small for chunk_size "
                    f"{chunk_size} (need >= {2 * chunk_size + 2})")
            from csm_tpu.models.config import with_horizon

            # position headroom between re-anchors: re-anchor roughly
            # every ``reanchor_headroom`` frames per slot — keep it rare
            # (the floor keeps _reanchor_at above _reanchor_target)
            if reanchor_headroom < 3 * chunk_size + 4:
                raise ValueError(
                    f"reanchor_headroom {reanchor_headroom} < "
                    f"{3 * chunk_size + 4} (3*chunk_size + 4)")
            self._horizon = max(
                args.backbone.max_seq_len,
                window + reanchor_headroom,
            )
            args = with_horizon(args, self._horizon)
            # host-tracked per-slot positions (exact for live slots: pos
            # advances once per emitted frame) drive re-anchor scheduling
            self._reanchor_at = self._horizon - 2 * chunk_size - 2
            self._reanchor_target = window + chunk_size
            self._reanchor = None  # compiled lazily
        self._cache_len = window if window is not None else max_seq_len
        if weight_dtype not in ("bf16", "int8", "int8-decoder", "int4",
                                "auto"):
            raise ValueError(
                f"weight_dtype must be bf16|int8|int8-decoder|int4|auto, "
                f"got {weight_dtype!r}")
        if weight_dtype == "auto":
            weight_dtype = "int8"
        self.weight_dtype = weight_dtype
        if kv_dtype not in ("bf16", "int8"):
            raise ValueError(f"kv_dtype must be bf16|int8, got {kv_dtype!r}")
        self.kv_dtype = kv_dtype
        self._kv_dtype_jnp = jnp.int8 if kv_dtype == "int8" else None
        if weight_dtype == "int4" and mesh is not None:
            raise ValueError("weight_dtype=int4 is single-device only (the "
                             "fused-dequant kernel is not sharded)")
        if weight_dtype in ("int8", "int8-decoder", "int4"):
            from csm_tpu.utils.quantize import (
                is_quantized, is_quantized_int4, quantize_csm_params,
                quantize_csm_params_int4)

            comp = "decoder" if weight_dtype == "int8-decoder" else "backbone"
            tp = params[comp]
            probe = tp["wqkv"] if "wqkv" in tp else tp["wq"]
            if weight_dtype == "int4":
                if not is_quantized_int4(probe):
                    params = jax.jit(quantize_csm_params_int4)(params)
            elif not is_quantized(probe):
                # int8-decoder: mixed precision — only the acoustic
                # decoder (re-streamed 31x per frame) quantizes; the
                # semantic backbone + c0 head stay bf16 (c0 logits
                # bit-identical to the unquantized model)
                comps = (("decoder",) if weight_dtype == "int8-decoder"
                         else ("backbone", "decoder"))
                params = jax.jit(
                    lambda p: quantize_csm_params(p, components=comps)
                )(params)
        if mesh is None and os.environ.get("CSM_TPU_NO_FUSE") != "1":
            # single-device decode: fused qkv / gate-up projection layout
            # (same math, fewer/larger HBM streams; meshes keep separate
            # projections — TP shards q/k/v head groups independently)
            from csm_tpu.models.csm import fuse_csm_params

            params = fuse_csm_params(params)
        self.params = params
        self.args = args
        self.mesh = mesh
        self.n_slots = n_slots
        self.max_seq_len = max_seq_len
        self.temperature = temperature
        self.topk = topk
        self.compute_dtype = compute_dtype
        self.chunk_size = chunk_size
        self.pipelined = pipelined
        if ramp_chunk is not None and not (1 <= ramp_chunk < chunk_size):
            raise ValueError(
                f"ramp_chunk must be in [1, chunk_size) = [1, {chunk_size}), "
                f"got {ramp_chunk}")
        self.ramp_chunk = ramp_chunk

        if mesh is not None:
            from csm_tpu.parallel.inference import shard_inference_params

            if n_slots % mesh.shape["data"] != 0:
                raise ValueError(
                    f"n_slots={n_slots} must divide over data axis "
                    f"{mesh.shape['data']}"
                )
            self.params = shard_inference_params(params, mesh)

        # multi-LoRA serving: load adapters into one fused-layout bank
        # (training/lora.fuse_lora_bank); requests pick by name, slots
        # carry ids, every decode chunk applies each slot's own adapter.
        # ``_loaded[id-1]`` keeps each adapter's host tree so the bank can
        # be REBUILT on hot add/remove (ids stay stable; freed positions
        # become zero rows).
        self._bank = None
        self._adapter_id: Dict[str, int] = {}
        self._loaded: List[Optional[tuple]] = []
        if adapters:
            for name, src_ in adapters.items():
                self._loaded.append(self._load_adapter(name, src_))
                self._adapter_id[name] = len(self._loaded)  # 0 = base
            self._rebuild_bank()

        # decode-chunk programs, keyed (batch, chunk): full batch / the
        # compacted power-of-two variants / the post-admission ramp chunk
        self._decodes: Dict[tuple, Callable] = {}
        self._admit = self._build_admit()
        self._kill = self._build_kill()
        self._prefills: Dict[int, Callable] = {}
        # shared-prefix serving: registered context KV blocks + compiled
        # programs (per prefix bucket / per (prefix, suffix) bucket pair)
        self._prefixes: Dict[str, CachedPrefix] = {}
        self._register_fns: Dict[int, Callable] = {}
        self._prefix_prefills: Dict[tuple, Callable] = {}
        # live-slot compaction (single-device): cache gather/scatter
        # programs per power-of-two capacity, built lazily
        self._compactors: Dict[int, tuple] = {}
        self.reset()

    def _init_device_state(self):
        K = self.args.audio_num_codebooks
        state = csm.init_frame_state(
            self.args, self.n_slots, self.compute_dtype,
            max_seq_len=self._cache_len, kv_dtype=self._kv_dtype_jnp,
        )
        # per-row cache offsets: each slot's row fills independently and
        # resets on admission — a slot never exhausts the cache as long as
        # prompt_bucket + max_frames <= max_seq_len (enforced in submit;
        # windowed mode instead ring-writes decode frames, no exhaustion)
        state = state._replace(offset=jnp.zeros(self.n_slots, jnp.int32))
        slots = SlotState(
            last_frame=jnp.zeros((self.n_slots, K), jnp.int32),
            pos=jnp.zeros(self.n_slots, jnp.int32),
            live=jnp.zeros(self.n_slots, bool),
            remaining=jnp.zeros(self.n_slots, jnp.int32),
            anchor=jnp.zeros(self.n_slots, jnp.int32),
        )
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from csm_tpu.parallel.inference import shard_frame_state

            state = shard_frame_state(state, self.mesh)
            d = lambda *s: NamedSharding(self.mesh, P(*s))
            slots = SlotState(
                last_frame=jax.device_put(slots.last_frame, d("data", None)),
                pos=jax.device_put(slots.pos, d("data")),
                live=jax.device_put(slots.live, d("data")),
                remaining=jax.device_put(slots.remaining, d("data")),
                anchor=jax.device_put(slots.anchor, d("data")),
            )
        return state, slots

    def reset(self, seed: int = 0):
        """Clear all streams/state; compiled programs stay cached."""
        self.state, self.slots = self._init_device_state()
        # Per-slot host bookkeeping (mirrors of the device control plane).
        self.slot_request: List[Optional[StreamRequest]] = [None] * self.n_slots
        self.slot_frames: List[List[np.ndarray]] = [[] for _ in range(self.n_slots)]
        self.slot_streamed = np.zeros(self.n_slots, np.int64)  # frames sent to on_frames
        # prefill frames not yet fetched: admission leaves frame0 ON
        # DEVICE (the control plane already handled EOS there) and the
        # next step() bundles it into the chunk gather — submit() costs
        # zero host round-trips, one fewer on the first-audio path
        self._pending_f0: Dict[int, jnp.ndarray] = {}
        self.active = np.zeros(self.n_slots, bool)
        # per-slot admission generation (bumped by submit): lets a stale
        # in-flight chunk be matched to the request that was resident at
        # its dispatch (pipelined mode)
        self.slot_gen = np.zeros(self.n_slots, np.int64)
        # the dispatched-but-unfetched chunk (pipelined mode); reset
        # drops it — its rows reference pre-reset slots
        self._inflight: Optional[_InFlight] = None
        self._adapter_ids = np.zeros(self.n_slots, np.int32)
        # host mirror of slots.pos (exact for live slots: +counts per
        # chunk) — schedules windowed re-anchors without extra fetches
        self._pos_host = np.zeros(self.n_slots, np.int64)
        self._step_count = 0
        self._base_key = jax.random.key(seed)
        self._key_epoch = 0
        # streams that finish during submit() (immediate EOS / budget <= 1)
        # surface through the next step()/run() drain
        self._finished_at_submit: List[StreamResult] = []

    # ---- compiled programs ----

    def _decode_fn(self, B: int, chunk: Optional[int] = None):
        key = (B, chunk or self.chunk_size)
        fn = self._decodes.get(key)
        if fn is None:
            fn = self._decodes[key] = jax.jit(
                build_decode_fn(
                    self.args, B, key[1], self.topk, self.compute_dtype,
                    windowed=self.window is not None,
                ),
                donate_argnums=(3, 4),
            )
        return fn

    def _build_admit(self):
        def admit(slots: SlotState, slot, frame0, pos0, budget, anchor):
            eos = jnp.all(frame0 == 0)
            return SlotState(
                last_frame=slots.last_frame.at[slot].set(frame0),
                pos=slots.pos.at[slot].set(pos0),
                live=slots.live.at[slot].set(~eos & (budget > 1)),
                remaining=slots.remaining.at[slot].set(budget - 1),
                anchor=slots.anchor.at[slot].set(anchor),
            )

        return jax.jit(admit, donate_argnums=(0,))

    def _build_kill(self):
        def kill(slots: SlotState, slot):
            return slots._replace(
                live=slots.live.at[slot].set(False),
                remaining=slots.remaining.at[slot].set(0),
            )

        return jax.jit(kill, donate_argnums=(0,))

    # ---- sliding-window re-anchor (unbounded sessions) ----

    def _build_reanchor(self):
        """Compiled position re-anchor for windowed serving.

        RoPE attention scores depend only on relative position:
        (R(p_q) q) · (R(p_k) k) = f(p_q − p_k).  Shifting a slot's query
        positions down by Δ therefore preserves EVERY score EXACTLY if
        every cached key is rotated by −Δ too (one extra rotation
        composes: R(p_k) k → R(p_k − Δ) k) — so the shifted stream's
        greedy decode is bit-equivalent to an infinite-horizon run
        (tests/test_sliding_window.py pins this).  Anchor kv_pos go
        negative after enough shifts; the mask (kv_pos ≤ q_pos) and the
        rotation are sign-agnostic, and the scale-factor-32 RoPE keeps
        anchor↔query distances in-distribution to ~262k positions
        (old_context_len × scale_factor ≈ 5.8 hours of audio).  Values
        are untouched; slot pos shifts down by Δ, reopening position
        headroom below the RoPE horizon.  Runs once per
        ~``reanchor_headroom`` frames per slot — one cache-bandwidth
        pass, amortized to noise.
        """
        from csm_tpu.ops.kvcache import quantize_kv_rows
        from csm_tpu.ops.rope import scaled_rope_freqs

        bb = self.args.backbone
        freqs32 = np.asarray(
            scaled_rope_freqs(
                bb.head_dim, bb.rope_base, bb.rope_scale_factor,
                bb.rope_low_freq_factor, bb.rope_high_freq_factor,
                bb.rope_old_context_len,
            ),
            np.float32,
        )
        def reanchor(state: csm.FrameState, slots: SlotState, delta):
            ang = (-delta.astype(jnp.float32)[:, None]
                   * jnp.asarray(freqs32)[None])
            cos, sin = jnp.cos(ang), jnp.sin(ang)  # (B, D/2)
            region = (
                (state.kv_pos != csm.PAD_POS) & (delta[:, None] > 0)
            )  # (B, C) — every written column, anchors included
            sel = region[None, :, :, None, None]

            def rot(x):  # (L, B, C, Hkv, D) → rotated f32
                half = x.shape[-1] // 2
                xf = x.astype(jnp.float32)
                x1, x2 = xf[..., :half], xf[..., half:]
                c = cos[None, :, None, None, :]
                s = sin[None, :, None, None, :]
                return jnp.concatenate(
                    [x1 * c - x2 * s, x2 * c + x1 * s], axis=-1
                )

            k = state.cache.k
            if isinstance(k, QuantKV):
                dense = k.q.astype(jnp.float32) * k.s
                rq = quantize_kv_rows(rot(dense))
                # select AFTER requantize: out-of-region rows keep their
                # original codes/scales (no round-trip error on anchors)
                k = QuantKV(
                    jnp.where(sel, rq.q, k.q),
                    jnp.where(region[None, :, :, None, None], rq.s, k.s),
                )
            else:
                k = jnp.where(sel, rot(k), k.astype(jnp.float32)).astype(
                    k.dtype
                )
            kv_pos = jnp.where(
                region, state.kv_pos - delta[:, None], state.kv_pos
            )
            return (
                state._replace(cache=KVCache(k, state.cache.v), kv_pos=kv_pos),
                slots._replace(pos=slots.pos - delta),
            )

        return jax.jit(reanchor, donate_argnums=(0, 1))

    def _maybe_reanchor(self) -> None:
        """Re-anchor any slot whose position nears the RoPE horizon."""
        if not (self.active & (self._pos_host >= self._reanchor_at)).any():
            return
        if self._inflight is not None:  # must not mutate under a chunk
            self._finished_at_submit.extend(self._collect(self._inflight))
            self._inflight = None
        need = self.active & (self._pos_host >= self._reanchor_at)
        if not need.any():
            return
        delta = np.where(
            need, self._pos_host - self._reanchor_target, 0
        ).astype(np.int32)
        if self._reanchor is None:
            self._reanchor = self._build_reanchor()
        self.state, self.slots = self._reanchor(
            self.state, self.slots, jnp.asarray(delta)
        )
        self._pos_host -= delta

    # ---- multi-LoRA adapter bank ----

    def _load_adapter(self, name: str, src_) -> tuple:
        if isinstance(src_, str):
            from csm_tpu.training.lora import load_lora

            lora, lcfg, largs = load_lora(src_)
        else:  # preloaded (lora_tree, LoRAConfig, ModelArgs)
            lora, lcfg, largs = src_
        if largs is not None and largs != self.args:
            raise ValueError(
                f"adapter {name!r} was trained for a different model shape")
        return (lora, lcfg)

    def _rebuild_bank(self) -> None:
        from csm_tpu.training.lora import LoRAConfig, fuse_lora_bank

        # freed positions contribute zero rows so surviving ids are stable
        loaded = [x if x is not None else ({}, LoRAConfig(r=1))
                  for x in self._loaded]
        # the bank must use the SAME projection names as the param tree or
        # the per-projection lookup in _layer_forward would silently skip
        # every adapter: mesh servers (and CSM_TPU_NO_FUSE=1) keep separate
        # wq/wk/wv, single-device servers run the fused wqkv/w13 layout
        layout = ("fused" if "wqkv" in self.params["backbone"]
                  else "separate")
        self._bank = jax.jit(
            lambda: fuse_lora_bank(
                loaded, self.args, dtype=self.compute_dtype, layout=layout)
        )()
        for comp in ("backbone", "decoder"):
            sub = self._bank.get(comp)
            extra = set(sub or ()) - set(self.params[comp])
            assert not extra, (
                f"adapter bank names {sorted(extra)} missing from the "
                f"{comp} param layout — adapters would be silently ignored")
        if self.mesh is not None:
            # the bank is tiny (rank-padded low-rank factors): REPLICATE
            # it across the mesh — each device gathers its own slots'
            # adapters locally, no collective needed
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(self.mesh, P())
            self._bank = jax.tree.map(
                lambda x: jax.device_put(x, rep), self._bank
            )

    def add_adapter(self, name: str, src) -> int:
        """Hot-load a LoRA fine-tune into the RUNNING server.

        ``src`` — an adapter directory (``load_lora`` format) or a
        preloaded ``(lora_tree, LoRAConfig, ModelArgs)``.  In-flight
        streams are untouched (their slots keep decoding with their own
        adapter ids); the next admission may name the new adapter.  If
        the rebuilt bank's shapes match the old one (same max rank, same
        touched projections) the swap is free; otherwise the next decode
        chunk retraces once — the bank is a jit ARGUMENT, never baked
        into the compiled programs.  Returns the adapter id.
        """
        if name in self._adapter_id:
            raise ValueError(f"adapter {name!r} already loaded")
        entry = self._load_adapter(name, src)
        free = [i for i, x in enumerate(self._loaded) if x is None]
        pos = free[0] if free else len(self._loaded)
        if free:
            self._loaded[pos] = entry
        else:
            self._loaded.append(entry)
        self._adapter_id[name] = pos + 1
        self._rebuild_bank()
        return pos + 1

    def remove_adapter(self, name: str) -> None:
        """Unload an adapter; its bank row zeroes and its id is reusable.

        Refuses while any ACTIVE slot decodes with it or any registered
        prefix was computed under it (drain or ``cancel`` those first).
        """
        aid = self._adapter_id.get(name)
        if aid is None:
            raise ValueError(
                f"unknown adapter {name!r} (loaded: "
                f"{sorted(self._adapter_id)})")
        if bool(np.any(self._adapter_ids[self.active] == aid)):
            raise ValueError(
                f"adapter {name!r} is in use by an active stream")
        stale = [p for p, pre in self._prefixes.items()
                 if (pre.adapter or None) == name]
        if stale:
            raise ValueError(
                f"adapter {name!r} is referenced by prefix(es) {stale}")
        del self._adapter_id[name]
        self._adapter_ids[self._adapter_ids == aid] = 0  # stale dead slots
        self._loaded[aid - 1] = None
        while self._loaded and self._loaded[-1] is None:
            self._loaded.pop()  # shrink the bank when the tail frees
        if self._loaded or self._adapter_id:
            self._rebuild_bank()
        else:
            self._bank = None

    def _prefill_fn(self, bucket: int):
        """Compiled per-slot prefill: run the prompt for ONE slot and merge
        its cache rows into the shared state."""
        if bucket in self._prefills:
            return self._prefills[bucket]
        args, K = self.args, self.args.audio_num_codebooks

        def prefill(params, key, state: csm.FrameState, slot, tokens, mask,
                    length, temperature, bank=None, aid=None):
            sub = csm.init_frame_state(
                args, 1, self.compute_dtype,
                max_seq_len=state.cache.max_seq_len,
                kv_dtype=self._kv_dtype_jnp,
            )
            col = jnp.arange(tokens.shape[1], dtype=jnp.int32)
            pos = jnp.where(col[None, :] < length, col[None, :], csm.PAD_POS)
            frame, sub = csm.generate_frame(
                params, args, key, tokens, mask, pos, sub,
                temperature, self.topk, self.compute_dtype,
                last_idx=length[None] - 1,
                lora=bank, lora_ids=aid,
            )
            # merge slot rows into the shared state (tree.map: quantized
            # caches carry {q, s} leaves, both 5-D, same slot axis)
            merge = lambda full, new: jax.lax.dynamic_update_slice(  # noqa: E731
                full, new[:, :1], (0, slot, 0, 0, 0)
            )
            k = jax.tree.map(merge, state.cache.k, sub.cache.k)
            v = jax.tree.map(merge, state.cache.v, sub.cache.v)
            kv_pos = jax.lax.dynamic_update_slice(
                state.kv_pos, sub.kv_pos[:1], (slot, 0)
            )
            offset = state.offset.at[slot].set(sub.offset)
            return frame[0], csm.FrameState(KVCache(k, v), offset, kv_pos)

        fn = jax.jit(prefill, donate_argnums=(2,))
        self._prefills[bucket] = fn
        return fn

    # ---- shared-prefix serving ----

    def _register_fn(self, bucket: int):
        """Compiled prefix encoder: run the backbone over a (1, bucket)
        context prompt and return its cache blocks (cache sized to the
        bucket, not max_seq_len — prefixes store compactly)."""
        if bucket in self._register_fns:
            return self._register_fns[bucket]
        args = self.args

        def reg(params, tokens, mask, length, bank=None, aid=None):
            sub = csm.init_frame_state(
                args, 1, self.compute_dtype, max_seq_len=bucket,
                kv_dtype=self._kv_dtype_jnp,
            )
            col = jnp.arange(bucket, dtype=jnp.int32)
            pos = jnp.where(col[None, :] < length, col[None, :], csm.PAD_POS)
            # generate_frame keeps registration on the exact production
            # prefill path (flash-vs-XLA choice, fused layouts); the
            # sampled frame is discarded — only the cache matters
            _, sub = csm.generate_frame(
                params, args, jax.random.key(0), tokens, mask, pos, sub,
                1.0, self.topk, self.compute_dtype,
                last_idx=length[None] - 1, lora=bank, lora_ids=aid,
            )
            return sub.cache.k, sub.cache.v, sub.kv_pos

        fn = jax.jit(reg)
        self._register_fns[bucket] = fn
        return fn

    def register_prefix(
        self,
        name: str,
        tokens: np.ndarray,
        mask: np.ndarray,
        adapter: Optional[str] = None,
    ) -> CachedPrefix:
        """Precompute and cache the backbone KV for a shared context.

        ``tokens``/``mask`` — the context frames only ((T, K+1), e.g.
        ``frames.concat_frames`` over the voice preset's segments).
        Requests opt in with ``StreamRequest(prefix=name, tokens=<own
        frames only>)``; their admission seeds the slot cache with these
        blocks instead of re-running the context.

        ``adapter`` — compute the prefix under a loaded LoRA adapter.
        Requests using the prefix must name the SAME adapter (the inline
        path would apply the slot's adapter to the context too; a
        base-model prefix under an adapter request would silently change
        the math, so it raises instead).
        """
        T = int(tokens.shape[0])
        # prefixes get a finer bucket list than requests (a 32 entry):
        # their programs are keyed separately, so this costs nothing
        # elsewhere and lets short presets leave more room for decode
        bucket = bucket_length(
            T, tuple(b for b in (32,) + PROMPT_BUCKETS
                     if b <= self._cache_len)
        )
        if bucket + 1 >= self._cache_len:
            raise ValueError(
                f"prefix {name!r}: bucket {bucket} leaves no room for a "
                f"request in the {self._cache_len}-column cache"
            )
        aid = 0
        if adapter is not None:
            if adapter not in self._adapter_id:
                raise ValueError(
                    f"prefix {name!r}: unknown adapter {adapter!r} "
                    f"(loaded: {sorted(self._adapter_id)})")
            aid = self._adapter_id[adapter]
        K = self.args.audio_num_codebooks
        toks = np.zeros((1, bucket, K + 1), np.int32)
        msk = np.zeros((1, bucket, K + 1), bool)
        toks[0, :T] = tokens
        msk[0, :T] = mask
        pkw = {}
        if self._bank is not None:
            pkw = dict(bank=self._bank, aid=jnp.full((1,), aid, jnp.int32))
        k, v, kv_pos = self._register_fn(bucket)(
            self.params, jnp.asarray(toks), jnp.asarray(msk),
            jnp.asarray(T, jnp.int32), **pkw,
        )
        pre = CachedPrefix(k, v, kv_pos, T, bucket, adapter)
        self._prefixes[name] = pre
        return pre

    def unregister_prefix(self, name: str) -> None:
        """Drop a cached prefix and release its KV blocks.

        Safe with active streams: admission COPIES the prefix blocks into
        the slot's cache, so removal only affects FUTURE requests naming
        the prefix (rejected at admission).  Re-``register_prefix`` under
        the same name likewise swaps it for new admissions only.
        """
        if name not in self._prefixes:
            raise ValueError(
                f"unknown prefix {name!r} (registered: "
                f"{sorted(self._prefixes)})")
        del self._prefixes[name]

    def _prefix_prefill_fn(self, pb: int, sb: int):
        """Compiled prefix admission: seed one slot's cache columns
        [0, pb) with a registered prefix, prefill the request's own
        (1, sb) frames at columns [pb, pb+sb) with absolute positions
        continuing the prefix, and merge into the shared state."""
        if (pb, sb) in self._prefix_prefills:
            return self._prefix_prefills[(pb, sb)]
        args, K = self.args, self.args.audio_num_codebooks

        def prefill(params, key, state: csm.FrameState, slot, pk, pv,
                    p_kv_pos, p_len, tokens, mask, length, temperature,
                    bank=None, aid=None):
            sub = csm.init_frame_state(
                args, 1, self.compute_dtype,
                max_seq_len=state.cache.max_seq_len,
                kv_dtype=self._kv_dtype_jnp,
            )
            place = lambda full, pre: jax.lax.dynamic_update_slice(  # noqa: E731
                full, pre, (0,) * full.ndim
            )
            k = jax.tree.map(place, sub.cache.k, pk)
            v = jax.tree.map(place, sub.cache.v, pv)
            kv_pos = jax.lax.dynamic_update_slice(sub.kv_pos, p_kv_pos, (0, 0))
            sub = csm.FrameState(KVCache(k, v), jnp.int32(pb), kv_pos)
            col = jnp.arange(sb, dtype=jnp.int32)
            pos = jnp.where(
                col[None, :] < length, p_len + col[None, :], csm.PAD_POS
            )
            frame, sub = csm.generate_frame(
                params, args, key, tokens, mask, pos, sub,
                temperature, self.topk, self.compute_dtype,
                last_idx=length[None] - 1, lora=bank, lora_ids=aid,
            )
            merge = lambda full, new: jax.lax.dynamic_update_slice(  # noqa: E731
                full, new[:, :1], (0, slot, 0, 0, 0)
            )
            k = jax.tree.map(merge, state.cache.k, sub.cache.k)
            v = jax.tree.map(merge, state.cache.v, sub.cache.v)
            kv_pos = jax.lax.dynamic_update_slice(
                state.kv_pos, sub.kv_pos[:1], (slot, 0)
            )
            offset = state.offset.at[slot].set(sub.offset)
            return frame[0], csm.FrameState(KVCache(k, v), offset, kv_pos)

        fn = jax.jit(prefill, donate_argnums=(2,))
        self._prefix_prefills[(pb, sb)] = fn
        return fn

    def warmup(self, verbose: bool = False) -> float:
        """Compile the serving programs BEFORE traffic.

        One dummy admission per prompt bucket (plus one per registered
        prefix), a compacted decode step, and a past-half-capacity fill
        for the full-batch decode program — then ``reset()`` (compiled
        programs survive).  A daemon that skips this pays each program's
        first compile on its first live request (minutes per program on
        a cold persistent cache); ``csm-serve --warmup`` runs it between
        model load and accepting traffic.  Returns wall seconds.
        """
        t0 = time.time()
        K = self.args.audio_num_codebooks

        def dummy(T, prefix=None, adapter=None):
            tokens = np.zeros((T, K + 1), np.int32)
            mask = np.zeros((T, K + 1), bool)
            mask[:, K] = True
            # with a ramp the budget must survive the ramp step so the
            # second warmup step reaches the steady-state chunk program
            return StreamRequest(tokens, mask,
                                 max_frames=3 + (self.ramp_chunk or 0),
                                 request_id=-1,
                                 prefix=prefix, adapter=adapter)

        if self.window is not None:
            fit = [b for b in PROMPT_BUCKETS
                   if b + 2 * self.chunk_size + 2 <= self.window]
        else:
            fit = [b for b in PROMPT_BUCKETS if b + 3 <= self.max_seq_len]
        for b in fit:
            self.submit(dummy(b))  # prefill(b)
            self.step()  # decode (compacted variant on a single device)
            if self.ramp_chunk:  # first step used the ramp program;
                self.step()  # compile the steady-state chunk too
            self.reset()
            if verbose:
                print(f"  warmup: bucket {b} ready "
                      f"(+{time.time() - t0:.1f}s)", flush=True)
        # full-batch decode: compaction turns off past half capacity
        for _ in range(min(self.n_slots // 2 + 1, self.n_slots)):
            self.submit(dummy(fit[0]))
        self.step()
        if self.ramp_chunk:
            self.step()
        self.reset()
        # every COMPACTION SIZE: a draining server passes through each
        # power-of-two compacted program (live <= n_slots/2) — without
        # this a "warmed" daemon still pays one compile per size as its
        # first batch drains (measured: the first oversubscribed run
        # after a 1-slot warmup lands 2-4x slow on exactly these)
        s = 2
        while s <= self.n_slots // 2:
            for _ in range(s):
                self.submit(dummy(fit[0]))
            self.step()
            if self.ramp_chunk:
                self.step()
            self.reset()
            if verbose:
                print(f"  warmup: compaction size {s} ready "
                      f"(+{time.time() - t0:.1f}s)", flush=True)
            s *= 2
        for name, pre in self._prefixes.items():
            if self.window is not None:
                sb = [b for b in PROMPT_BUCKETS if pre.bucket + b
                      + 2 * self.chunk_size + 2 <= self.window]
            else:
                sb = [b for b in PROMPT_BUCKETS
                      if pre.bucket + b + 3 <= self.max_seq_len]
            if sb:
                self.submit(dummy(sb[0], prefix=name, adapter=pre.adapter))
                self.step()
                self.reset()
                if verbose:
                    print(f"  warmup: prefix {name!r} ready "
                          f"(+{time.time() - t0:.1f}s)", flush=True)
        return time.time() - t0

    # ---- host-side orchestration ----

    def _next_key(self):
        # prefill keys live in the upper half of the fold_in domain so they
        # never collide with decode-chunk indices (step counts)
        self._key_epoch += 1
        return jax.random.fold_in(self._base_key, 2**31 + self._key_epoch)

    def submit(self, req: StreamRequest) -> Optional[int]:
        """Admit a request into a free slot (prefill now); None if full."""
        free = np.nonzero(~self.active)[0]
        if len(free) == 0:
            return None
        slot = int(free[0])
        T = req.tokens.shape[0]
        pre = None
        if req.prefix is not None:
            if req.prefix not in self._prefixes:
                raise ValueError(
                    f"request {req.request_id}: unknown prefix "
                    f"{req.prefix!r} (registered: "
                    f"{sorted(self._prefixes)})")
            pre = self._prefixes[req.prefix]
            if (pre.adapter or None) != (req.adapter or None):
                raise ValueError(
                    f"request {req.request_id}: prefix {req.prefix!r} was "
                    f"computed under adapter {pre.adapter!r} but the "
                    f"request uses {req.adapter!r} — register the prefix "
                    f"with adapter={req.adapter!r}")
        pb = pre.bucket if pre is not None else 0
        bucket = bucket_length(
            T, tuple(b for b in PROMPT_BUCKETS if b <= self._cache_len)
        )
        if self.window is not None:
            # sliding-window mode: the prompt is the never-evicted anchor;
            # decode frames ring over the remainder — max_frames is NOT
            # capped (unbounded sessions), the ring just needs to exist
            if pb + bucket + 2 * self.chunk_size + 2 > self.window:
                raise ValueError(
                    f"request {req.request_id}: "
                    + (f"prefix bucket {pb} + " if pb else "")
                    + f"prompt bucket {bucket} leaves no decode ring in "
                    f"window {self.window} (need >= {2 * self.chunk_size + 2} "
                    f"ring columns)"
                )
        elif pb + bucket + req.max_frames > self.max_seq_len:
            # device-side budgets stop decode exactly at max_frames, so no
            # chunk-size slack is needed
            raise ValueError(
                f"request {req.request_id}: "
                + (f"prefix bucket {pb} + " if pb else "")
                + f"prompt bucket {bucket} + "
                f"max_frames {req.max_frames} exceeds max_seq_len "
                f"{self.max_seq_len}"
            )
        K = self.args.audio_num_codebooks
        toks = np.zeros((1, bucket, K + 1), np.int32)
        msk = np.zeros((1, bucket, K + 1), bool)
        toks[0, :T] = req.tokens
        msk[0, :T] = req.mask

        aid = 0
        if req.adapter is not None:
            if req.adapter not in self._adapter_id:
                raise ValueError(
                    f"request {req.request_id}: unknown adapter "
                    f"{req.adapter!r} (loaded: {sorted(self._adapter_id)})")
            aid = self._adapter_id[req.adapter]
        pkw = {}
        if self._bank is not None:
            pkw = dict(bank=self._bank, aid=jnp.full((1,), aid, jnp.int32))
        if pre is not None:
            prefill = self._prefix_prefill_fn(pre.bucket, bucket)
            frame0, self.state = prefill(
                self.params, self._next_key(), self.state, jnp.int32(slot),
                pre.k, pre.v, pre.kv_pos, jnp.int32(pre.length),
                jnp.asarray(toks), jnp.asarray(msk),
                jnp.asarray(T, jnp.int32), jnp.float32(self.temperature),
                **pkw,
            )
            pos0 = pre.length + T
        else:
            prefill = self._prefill_fn(bucket)
            frame0, self.state = prefill(
                self.params, self._next_key(), self.state, jnp.int32(slot),
                jnp.asarray(toks), jnp.asarray(msk),
                jnp.asarray(T, jnp.int32), jnp.float32(self.temperature),
                **pkw,
            )
            pos0 = T
        self._adapter_ids[slot] = aid
        self._pos_host[slot] = pos0
        self.slots = self._admit(
            self.slots, jnp.int32(slot), frame0, jnp.int32(pos0),
            jnp.int32(req.max_frames), jnp.int32(pb + bucket),
        )

        self.slot_request[slot] = req
        self.slot_frames[slot] = []
        self.slot_streamed[slot] = 0
        self.active[slot] = True
        self.slot_gen[slot] += 1
        if req.max_frames < 1:  # no budget: finish empty, free the slot
            self._finished_at_submit.append(self._finish(slot))
        else:
            # frame0 stays on device; the admit program above already set
            # live = ~EOS & (budget > 1), so decode correctness never
            # needed the host value — step() fetches it with the chunk
            self._pending_f0[slot] = frame0
        return slot

    def _compact_fns(self, c: int):
        """Jitted gather/scatter between the full ``n_slots`` state and a
        ``c``-slot working copy (c < n_slots).

        The gather index vector is padded to length ``c`` with
        ``n_slots`` (out of bounds): gathers clamp (the row is forced
        dead), scatters drop — so padded rows never touch real slots.
        The KV-cache copy is ~tens of MB per slot, ≪ one chunk's weight
        reads; the payoff is that a 64-slot server with one live stream
        decodes at the 1-slot rate instead of paying full-batch compute.

        On a mesh, ``c`` is a multiple of the data-axis size
        (_decode_capacity) and the compacted state is sharding-constrained
        back onto the mesh (slots over ``data``) — the cross-group gather
        rides ICI; a mostly-idle multi-chip server then decodes at the
        right-sized cost too.
        """
        if c in self._compactors:
            return self._compactors[c]
        n = self.n_slots
        constrain_state = constrain_slots = lambda x: x
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from csm_tpu.parallel.inference import frame_state_specs

            mesh = self.mesh

            def constrain_state(state):  # noqa: F811
                specs = frame_state_specs(
                    per_row_offset=True, cache=state.cache
                )
                return jax.tree.map(
                    lambda s, x: jax.lax.with_sharding_constraint(
                        x, NamedSharding(mesh, s)
                    ),
                    specs, state,
                    is_leaf=lambda x: isinstance(x, P),
                )

            def constrain_slots(slots):  # noqa: F811
                d = lambda *s: NamedSharding(mesh, P(*s))  # noqa: E731
                return SlotState(
                    last_frame=jax.lax.with_sharding_constraint(
                        slots.last_frame, d("data", None)
                    ),
                    pos=jax.lax.with_sharding_constraint(slots.pos, d("data")),
                    live=jax.lax.with_sharding_constraint(slots.live, d("data")),
                    remaining=jax.lax.with_sharding_constraint(
                        slots.remaining, d("data")
                    ),
                    anchor=jax.lax.with_sharding_constraint(
                        slots.anchor, d("data")
                    ),
                )

        def gather(state: csm.FrameState, slots: SlotState, idx):
            t0 = lambda x: jnp.take(x, idx, axis=0, mode="clip")  # noqa: E731
            _t1 = lambda x: jnp.take(x, idx, axis=1, mode="clip")  # noqa: E731
            t1 = lambda c: jax.tree.map(_t1, c)  # noqa: E731  (QuantKV-safe)
            sub_state = csm.FrameState(
                cache=KVCache(t1(state.cache.k), t1(state.cache.v)),
                offset=t0(state.offset),
                kv_pos=t0(state.kv_pos),
            )
            sub_slots = SlotState(
                last_frame=t0(slots.last_frame),
                pos=t0(slots.pos),
                live=t0(slots.live) & (idx < n),
                remaining=t0(slots.remaining),
                anchor=t0(slots.anchor),
            )
            return constrain_state(sub_state), constrain_slots(sub_slots)

        def scatter(state: csm.FrameState, slots: SlotState,
                    sub_state: csm.FrameState, sub_slots: SlotState, idx):
            p0 = lambda x, u: x.at[idx].set(u, mode="drop")  # noqa: E731
            _p1 = lambda x, u: x.at[:, idx].set(u, mode="drop")  # noqa: E731
            p1 = lambda c, u: jax.tree.map(_p1, c, u)  # noqa: E731
            state = csm.FrameState(
                cache=KVCache(
                    p1(state.cache.k, sub_state.cache.k),
                    p1(state.cache.v, sub_state.cache.v),
                ),
                offset=p0(state.offset, sub_state.offset),
                kv_pos=p0(state.kv_pos, sub_state.kv_pos),
            )
            slots = SlotState(
                last_frame=p0(slots.last_frame, sub_slots.last_frame),
                pos=p0(slots.pos, sub_slots.pos),
                live=p0(slots.live, sub_slots.live),
                remaining=p0(slots.remaining, sub_slots.remaining),
                anchor=p0(slots.anchor, sub_slots.anchor),
            )
            return constrain_state(state), constrain_slots(slots)

        fns = (
            jax.jit(gather),
            # donate only the FULL buffers: the c-sized sub inputs can't
            # back any n_slots-sized output (shape mismatch would just
            # warn "donated buffers not usable" on every compile)
            jax.jit(scatter, donate_argnums=(0, 1)),
        )
        self._compactors[c] = fns
        return fns

    def _put_ids(self, ids: np.ndarray) -> jnp.ndarray:
        """Per-slot adapter ids as a device array — sharded over ``data``
        alongside the slots on a mesh."""
        ids = jnp.asarray(np.asarray(ids, np.int32))
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            ids = jax.device_put(ids, NamedSharding(self.mesh, P("data")))
        return ids

    def _decode_capacity(self, n_live: int) -> int:
        """Smallest power-of-two decode batch that fits the live slots —
        or ``n_slots`` (the uncompacted program) when compaction can't
        at least halve the batch.  On a mesh the capacity is additionally
        rounded up to a multiple of the data-axis size (slots stay evenly
        sharded; the gather redistributes live slots across groups)."""
        c = 1
        while c < n_live:
            c *= 2
        if self.mesh is not None:
            n_data = self.mesh.shape["data"]
            c = max(c, n_data)
            c = ((c + n_data - 1) // n_data) * n_data
        return c if c <= self.n_slots // 2 else self.n_slots

    def _dispatch(self) -> _InFlight:
        """Dispatch one decode chunk for the current device state (no host
        fetch).  When live slots fill at most half the server, they are
        compacted into a smaller decode program (idle slots cost
        nothing)."""
        self._step_count += 1
        pend = self._pending_f0  # prefill frames still on device
        self._pending_f0 = {}
        live_idx = np.nonzero(self.active)[0]
        c = self._decode_capacity(len(live_idx))
        # post-admission ramp: gather the first frames after ramp_chunk
        # steps instead of a full chunk (streaming time-to-first-audio)
        chunk = self.ramp_chunk if (pend and self.ramp_chunk) else None
        if c < self.n_slots:
            idx = np.full((c,), self.n_slots, np.int32)
            idx[: len(live_idx)] = live_idx
            idx_dev = jnp.asarray(idx)
            gather, scatter = self._compact_fns(c)
            sub_state, sub_slots = gather(self.state, self.slots, idx_dev)
            dkw = {}
            if self._bank is not None:
                sub_ids = np.where(idx < self.n_slots,
                                   self._adapter_ids[np.minimum(
                                       idx, self.n_slots - 1)], 0)
                dkw = dict(bank=self._bank,
                           adapter_ids=self._put_ids(sub_ids))
            frames, counts, sub_slots, sub_state = self._decode_fn(c, chunk)(
                self.params, self._base_key, self._step_count,
                sub_state, sub_slots, jnp.float32(self.temperature), **dkw,
            )
            live = jnp.copy(sub_slots.live)
            self.state, self.slots = scatter(
                self.state, self.slots, sub_state, sub_slots, idx_dev
            )
            row_of = {int(s): i for i, s in enumerate(live_idx)}
        else:
            dkw = {}
            if self._bank is not None:
                dkw = dict(bank=self._bank,
                           adapter_ids=self._put_ids(self._adapter_ids))
            frames, counts, self.slots, self.state = self._decode_fn(
                self.n_slots, chunk
            )(
                self.params, self._base_key, self._step_count,
                self.state, self.slots, jnp.float32(self.temperature), **dkw,
            )
            # the slots buffer gets donated by the NEXT dispatch (or by a
            # submit's admit) before a pipelined fetch — copy liveness out
            live = jnp.copy(self.slots.live)
            row_of = {int(s): int(s) for s in live_idx}
        gens = {int(s): int(self.slot_gen[int(s)]) for s in live_idx}
        return _InFlight(frames, counts, live, pend,
                         live_idx, row_of, gens)

    def _collect(self, infl: _InFlight) -> List[StreamResult]:
        """Fetch a dispatched chunk's results and apply them to the host
        mirrors — ONE host gather per chunk."""
        f_host, counts_h, live_h, f0_vals = jax.device_get(
            (infl.frames, infl.counts, infl.live, list(infl.pend.values()))
        )
        done: List[StreamResult] = []
        # deferred prefill frames land FIRST in their slot's stream; an
        # all-zero frame0 was the EOS marker and is never emitted
        for slot, f0 in zip(infl.pend, f0_vals):
            s = int(slot)
            if (self.slot_request[s] is None
                    or self.slot_gen[s] != infl.gens[s]):
                continue  # finished/cancelled/re-admitted since dispatch
            f0 = np.asarray(f0, np.int32)
            if f0.any():
                self.slot_frames[s].append(f0)
        for slot in infl.live_idx:
            s = int(slot)
            if (self.slot_request[s] is None
                    or self.slot_gen[s] != infl.gens[s]):
                continue  # stale row: its device counts were 0 anyway
            r = infl.row_of[s]
            # exact for still-live slots (pos advances once per emitted
            # frame); dead slots' positions stop mattering
            self._pos_host[s] += int(counts_h[r])
            for t in range(int(counts_h[r])):
                self.slot_frames[s].append(f_host[t, r])
            if not live_h[r]:
                done.append(self._finish(s))
            elif counts_h[r]:
                self._notify(s, done=False)
        return done

    def step(self) -> List[StreamResult]:
        """Advance every active stream by up to one chunk of frames; returns
        finished streams.  EOS and budget exhaustion are detected on device
        — the host does one dispatch and one gather per chunk.

        ``pipelined=True``: one chunk stays in flight — this call
        dispatches chunk N+1, then fetches chunk N, so the device starts
        the next chunk's weight reads while the host drains the previous
        one.  Results arrive one step later than the unpipelined server;
        an admission step with ``ramp_chunk`` set goes synchronous so the
        ramp's time-to-first-audio win is preserved."""
        if self.window is not None:
            self._maybe_reanchor()
        done: List[StreamResult] = self._finished_at_submit
        self._finished_at_submit = []
        if not self.pipelined:
            if not self.active.any():
                return done
            return done + self._collect(self._dispatch())
        sync_ramp = bool(self._pending_f0) and self.ramp_chunk
        if sync_ramp and self._inflight is not None:
            done += self._collect(self._inflight)
            self._inflight = None
        new = self._dispatch() if self.active.any() else None
        if sync_ramp and new is not None:
            done += self._collect(new)
            new = None
        if self._inflight is not None:
            done += self._collect(self._inflight)
        self._inflight = new
        if self._inflight is not None and not self.active.any():
            # everything died in the chunk just collected — the freshly
            # dispatched chunk is trivial (its while_loop exits at once);
            # drain it so `active` empty ⇒ nothing in flight (the
            # invariant run()/daemon loops poll on)
            done += self._collect(self._inflight)
            self._inflight = None
        return done

    def _notify(self, slot: int, done: bool) -> None:
        """Push frames not yet streamed to the request's ``on_frames``."""
        req = self.slot_request[slot]
        if req is None or req.on_frames is None:
            return
        frames = self.slot_frames[slot]
        start = int(self.slot_streamed[slot])
        new = (
            np.stack(frames[start:])
            if len(frames) > start
            else np.zeros((0, self.args.audio_num_codebooks), np.int32)
        )
        self.slot_streamed[slot] = len(frames)
        req.on_frames(req.request_id, new, done)

    def _finish(self, slot: int, cancelled: bool = False) -> StreamResult:
        req = self.slot_request[slot]
        self._notify(slot, done=True)
        frames = (
            np.stack(self.slot_frames[slot])
            if self.slot_frames[slot]
            else np.zeros((0, self.args.audio_num_codebooks), np.int32)
        )
        res = StreamResult(req.request_id, frames, len(self.slot_frames[slot]),
                           cancelled=cancelled)
        self.active[slot] = False
        self.slot_request[slot] = None
        self.slot_frames[slot] = []
        return res

    def cancel(self, request_id: int) -> Optional[StreamResult]:
        """Abort an in-flight request (client disconnect / user abort).

        The slot goes dead ON DEVICE immediately — the next decode chunk
        spends no work on it — and frees for the next admission.  The
        request's ``on_frames`` callback still fires exactly once with
        ``done=True`` (so streaming sinks close), and the partial
        ``StreamResult`` is returned with ``cancelled=True`` (it does NOT
        also surface through ``step()``).  Returns None if no live slot
        carries ``request_id``.  The reference has no serving path at
        all, let alone cancellation (src/csm/generator.py runs each
        request to completion synchronously).

        Pipelined servers drain the in-flight chunk first (its frames
        still belong to their requests); a request that FINISHED inside
        that chunk is no longer cancellable — its result surfaces
        through the next ``step()`` as a normal completion and None is
        returned here.
        """
        if self._inflight is not None:
            self._finished_at_submit.extend(self._collect(self._inflight))
            self._inflight = None
        for slot in np.nonzero(self.active)[0]:
            s = int(slot)
            req = self.slot_request[s]
            if req is not None and req.request_id == request_id:
                self.slots = self._kill(self.slots, jnp.int32(s))
                self._pending_f0.pop(s, None)  # un-emitted prefill frame
                return self._finish(s, cancelled=True)
        return None

    def run(self, requests: List[StreamRequest], max_steps: int = 10_000):
        """Serve a request list to completion; returns (results, stats)."""
        pending = list(requests)
        results: List[StreamResult] = []
        t0 = time.time()
        steps = 0
        step_wall: List[float] = []  # per-chunk heartbeat (stall forensics)
        while (pending or self.active.any()) and steps < max_steps:
            while pending and self.submit(pending[0]) is not None:
                pending.pop(0)
            ts = time.time()
            results.extend(self.step())
            step_wall.append(time.time() - ts)
            steps += 1
        wall = time.time() - t0
        total_frames = sum(r.n_steps for r in results)
        stats = {
            "wall_s": wall,
            "decode_steps": steps,
            "total_frames": total_frames,
            "frames_per_s": total_frames / max(wall, 1e-9),
            "aggregate_rtf": total_frames / 12.5 / max(wall, 1e-9),
            # per-chunk wall times: benches reject stall-poisoned runs
            # (an outlier chunk = the tunnel relay, not the scheduler —
            # scripts/bench_serving.py)
            "step_wall": step_wall,
        }
        return results, stats
