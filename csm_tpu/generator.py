"""End-to-end TTS generation pipeline.

Capability equivalent of the reference ``Generator``/``Segment``/
``load_csm_1b`` (src/csm/generator.py): contextual prompt assembly in the
(T, 33) frame format, autoregressive frame generation, Mimi decode to a
24 kHz waveform, optional watermarking.

TPU-first differences:
  * the frame loop is ONE compiled ``lax.while_loop``
    (csm_tpu/models/generation.py) — the reference steps Python per frame
    with a host sync each 80 ms (src/csm/generator.py:196-207);
  * prompts pad to static buckets (compile-count control);
  * batch size is a constructor argument — the reference hardwires
    ``setup_caches(1)`` (src/csm/generator.py:62); ``generate_batch``
    synthesizes many utterances per call for serving.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from csm_tpu.data import frames as fr
from csm_tpu.data.tokenizers import MimiAudioTokenizer, load_text_tokenizer
from csm_tpu.models.config import ModelArgs, csm_1b_args
from csm_tpu.models.generation import (
    PROMPT_BUCKETS,
    bucket_length,
    generate_audio_tokens_jit,
)

SAMPLE_RATE = 24_000
FRAME_RATE = 12.5
MS_PER_FRAME = 80.0


@dataclasses.dataclass
class Segment:
    """One conversational turn (reference: src/csm/generator.py:18-25)."""

    speaker: int
    text: str
    audio: np.ndarray  # float32 mono at 24 kHz


@dataclasses.dataclass
class PackedContext:
    """A pre-encoded conversation context (voice preset).

    ``Generator.precompute_context`` Mimi-encodes and frame-packs the
    segments ONCE; the result is accepted anywhere a context segment
    list is — repeated calls with the same preset skip the per-call
    codec encode the reference pays every time
    (src/csm/generator.py:117,174-185).  The serving analogue goes
    further and caches the backbone KV too
    (``BatchedServer.register_prefix``).
    """

    tokens: np.ndarray  # (T, K+1) int32
    mask: np.ndarray  # (T, K+1) bool


class Generator:
    """Contextual speech generator.

    Args:
        params: CSM parameter tree (csm_tpu.models.csm layout).
        args: ModelArgs.
        mimi: MimiAudioTokenizer (encode for context audio, decode for
            output).  Required for real audio; tests may inject fakes.
        text_tokenizer: .encode(str)->list[int]; defaults to the Llama-3.2
            tokenizer (byte-level fallback offline).
        watermarker: optional callable (audio, sr) -> (audio, sr) applied
            to generated audio (reference: src/csm/generator.py:211-217).
        mesh: optional jax.sharding.Mesh with (data, model) axes — weights
            go TP over ``model``; generate_batch shards the batch over
            ``data`` when divisible (csm_tpu/parallel/inference.py).
    """

    def __init__(
        self,
        params: dict,
        args: Optional[ModelArgs] = None,
        mimi: Optional[MimiAudioTokenizer] = None,
        text_tokenizer=None,
        watermarker=None,
        compute_dtype=jnp.bfloat16,
        mesh=None,
        kv_dtype=None,
    ):
        """``kv_dtype`` — KV-cache storage dtype (``jnp.int8`` quantizes
        K/V at write, csm_tpu/ops/kvcache.py; None = compute_dtype)."""
        self.mesh = mesh
        self.kv_dtype = kv_dtype
        if mesh is not None:
            from csm_tpu.parallel.inference import shard_inference_params

            params = shard_inference_params(params, mesh)
        elif os.environ.get("CSM_TPU_NO_FUSE") != "1":
            # single-device decode: fused qkv / gate-up projection layout
            # (same math, fewer/larger HBM streams — models/csm.py)
            from csm_tpu.models.csm import fuse_csm_params

            params = fuse_csm_params(params)
        self.params = params
        self.args = args or csm_1b_args()
        self.mimi = mimi
        self.text_tokenizer = text_tokenizer or load_text_tokenizer()
        self.watermarker = watermarker
        self.compute_dtype = compute_dtype
        self.sample_rate = SAMPLE_RATE
        self.max_seq_len = self.args.backbone.max_seq_len
        self.last_stats: dict = {}

    # ---- prompt assembly (reference: src/csm/generator.py:77-145) ----

    def _segment_frames(self, seg: Segment):
        ids = self.text_tokenizer.encode(f"[{seg.speaker}]{seg.text}")
        if self.mimi is None:
            raise ValueError("context audio requires a Mimi tokenizer")
        codes = self.mimi.encode(np.asarray(seg.audio, np.float32))
        return fr.segment_frames(self.args, ids, codes)

    def precompute_context(self, segments: List[Segment]) -> PackedContext:
        """Encode + pack a context once for reuse across calls."""
        parts = [self._segment_frames(s) for s in segments]
        return PackedContext(*fr.concat_frames(parts))

    def _build_prompt(self, text: str, speaker: int, context):
        if isinstance(context, PackedContext):
            parts = [(context.tokens, context.mask)]
        else:
            parts = [self._segment_frames(s) for s in context]
        ids = self.text_tokenizer.encode(f"[{speaker}]{text}")
        parts.append(fr.text_frames(self.args, ids))
        return fr.concat_frames(parts)

    # ---- generation ----

    def generate(
        self,
        text: str,
        speaker: int = 0,
        context: Optional[List[Segment]] = None,
        max_audio_length_ms: float = 90_000,
        temperature: float = 0.9,
        topk: int = 50,
        key: Optional[jax.Array] = None,
        seed: int = 0,
    ) -> np.ndarray:
        """Generate a 24 kHz waveform (reference: src/csm/generator.py:147-218)."""
        return self.generate_batch(
            [text],
            [speaker],
            [context or []],
            max_audio_length_ms=max_audio_length_ms,
            temperature=temperature,
            topk=topk,
            key=key,
            seed=seed,
        )[0]

    def generate_batch(
        self,
        texts: List[str],
        speakers: List[int],
        contexts: Optional[List[List[Segment]]] = None,
        max_audio_length_ms: float = 90_000,
        temperature: float = 0.9,
        topk: int = 50,
        key: Optional[jax.Array] = None,
        seed: int = 0,
    ) -> List[np.ndarray]:
        """Batched generation — N utterances in one compiled decode."""
        t_start = time.time()
        contexts = contexts or [[] for _ in texts]
        max_frames = int(max_audio_length_ms / MS_PER_FRAME)
        K = self.args.audio_num_codebooks

        prompts = [
            self._build_prompt(t, s, c)
            for t, s, c in zip(texts, speakers, contexts)
        ]
        lens = np.array([p[0].shape[0] for p in prompts], np.int32)
        limit = self.max_seq_len - max_frames
        if int(lens.max()) >= limit:
            # Contract from the reference (src/csm/generator.py:192-194):
            # the prompt must leave room for the full audio budget.
            raise ValueError(
                f"prompt too long: {int(lens.max())} >= {limit} "
                f"({self.max_seq_len} - {max_frames} audio frames)"
            )

        S_pad = bucket_length(
            int(lens.max()), tuple(b for b in PROMPT_BUCKETS if b <= self.max_seq_len)
        )
        B = len(prompts)
        tokens = np.zeros((B, S_pad, K + 1), np.int32)
        mask = np.zeros((B, S_pad, K + 1), bool)
        for b, (tk, mk) in enumerate(prompts):
            tokens[b, : tk.shape[0]] = tk
            mask[b, : mk.shape[0]] = mk

        if key is None:
            key = jax.random.key(seed)
        tokens_d, mask_d, lens_d = (
            jnp.asarray(tokens), jnp.asarray(mask), jnp.asarray(lens)
        )
        if self.mesh is not None:
            from csm_tpu.parallel.inference import shard_batch_dim

            tokens_d = shard_batch_dim(tokens_d, self.mesh)
            mask_d = shard_batch_dim(mask_d, self.mesh)
            lens_d = shard_batch_dim(lens_d, self.mesh)
        t_tok = time.time()
        res = generate_audio_tokens_jit(
            self.params,
            self.args,
            key,
            tokens_d,
            mask_d,
            lens_d,
            max_frames=max_frames,
            temperature=temperature,
            topk=topk,
            compute_dtype=self.compute_dtype,
            kv_dtype=self.kv_dtype,
        )
        frames = np.asarray(res.frames)  # (B, max_frames, K)
        nf = np.asarray(res.num_frames)
        t_gen = time.time()

        outs: List[np.ndarray] = []
        for b in range(B):
            n = int(nf[b])
            if n == 0:
                outs.append(np.zeros(0, np.float32))
                continue
            if self.mimi is None:
                raise ValueError("decoding audio requires a Mimi tokenizer")
            audio = self.mimi.decode(frames[b, :n].T)  # (K, n) -> (T,)
            audio = np.asarray(audio[: int(n / FRAME_RATE * self.sample_rate)])
            if not np.all(np.isfinite(audio)):
                # NaN-audio detection & repair (reference:
                # src/csm/cli/generate_mlx.py:606-671)
                bad = int(np.sum(~np.isfinite(audio)))
                print(f"WARNING: repaired {bad} non-finite audio samples")
                audio = np.nan_to_num(audio, nan=0.0, posinf=0.0, neginf=0.0)
            if self.watermarker is not None:
                audio, _ = self.watermarker(audio, self.sample_rate)
            outs.append(np.asarray(audio, np.float32))

        wall = time.time() - t_start
        total_audio = sum(len(o) for o in outs) / self.sample_rate
        self.last_stats = {
            "wall_s": wall,
            "tokenize_s": t_tok - t_start,
            "generate_s": t_gen - t_tok,
            "decode_s": time.time() - t_gen,
            "audio_s": total_audio,
            "frames": int(nf.sum()),
            "frames_per_s": float(nf.sum()) / max(t_gen - t_tok, 1e-9),
            "rtf": total_audio / max(wall, 1e-9),
        }
        return outs


def _streaming_server_cache(gen: "Generator", chunk_frames: int, topk: int,
                            window: Optional[int] = None):
    srv = getattr(gen, "_stream_servers", None)
    if srv is None:
        srv = gen._stream_servers = {}
    key = (chunk_frames, topk, window)
    if key not in srv:
        from csm_tpu.serving import BatchedServer

        srv[key] = BatchedServer(
            gen.params, gen.args, n_slots=1, max_seq_len=gen.max_seq_len,
            topk=topk, compute_dtype=gen.compute_dtype,
            chunk_size=chunk_frames,
            kv_dtype="int8" if gen.kv_dtype == jnp.int8 else "bf16",
            window=window,
        )
    return srv[key]


def _generator_streaming(
    self,
    text: str,
    speaker: int = 0,
    context: Optional[List[Segment]] = None,
    max_audio_length_ms: float = 90_000,
    temperature: float = 0.9,
    topk: int = 50,
    seed: int = 0,
    chunk_frames: int = 13,
    window: Optional[int] = None,
):
    """Stream generation: yields (audio_chunk float32 @24 kHz, done bool)
    roughly every ``chunk_frames`` × 80 ms of audio.

    ``window`` — sliding-window KV size for UNBOUNDED streams: the prompt
    stays as a never-evicted anchor, decode frames ring over the rest,
    and the ``max_seq_len − max_frames`` admission contract is waived
    (csm_tpu/serving.BatchedServer window mode).

    First-audio latency ≈ prefill + chunk_frames frames + one Mimi decode —
    the low-latency serving mode (the original CSM's headline UX metric is
    ~380 ms to first audio, docs/reference/sesame_csm/inference.md).  The
    emitted stream is EXACT and O(chunk) per chunk: the codec carries
    conv/transformer state across chunks (csm_tpu/codec/streaming.py), so
    each step decodes only the NEW frames — serving-grade for arbitrarily
    long utterances (the round-1 path re-decoded the growing buffer,
    O(n²) codec work).  Watermarking is skipped in streaming mode (it
    operates on complete utterances) — watermark the concatenation.
    """
    from csm_tpu.serving import StreamRequest

    context = context or []
    tokens, mask = self._build_prompt(text, speaker, context)
    max_frames = int(max_audio_length_ms / MS_PER_FRAME)
    if window is None:
        # windowed streams waive this contract: the server ring-evicts
        limit = self.max_seq_len - max_frames
        if tokens.shape[0] >= limit:
            raise ValueError(
                f"prompt too long: {tokens.shape[0]} >= {limit}"
            )
    if self.mimi is None:
        raise ValueError("streaming decode requires a Mimi tokenizer")

    server = _streaming_server_cache(self, chunk_frames, topk, window)
    server.reset(seed)
    server.temperature = temperature
    server.submit(StreamRequest(tokens, mask, max_frames=max_frames))

    decoder = self.mimi.stream_decoder()

    def decode_new(frames_buf, start, pad_to=None):
        """Stream-decode frames_buf[start:], optionally padded to a static
        chunk length (final remnant only — state is discarded after)."""
        new = frames_buf[start:]
        n = new.shape[0]
        if n == 0:
            return np.zeros(0, np.float32)
        if pad_to is not None and n < pad_to:
            new = np.concatenate(
                [new, np.zeros((pad_to - n, new.shape[1]), new.dtype)]
            )
        audio = decoder.decode_chunk(new.T)
        return audio[: n * decoder.cfg.samples_per_frame]

    decoded = 0  # frames already stream-decoded
    emitted_any = False
    result = None
    finished_at_submit = server.step() if not server.active.any() else []
    if finished_at_submit:
        result = finished_at_submit[0]
        if result.frames.shape[0]:
            yield decode_new(result.frames, 0), True
            return
    done_emitted = False
    while server.active.any():
        finished = server.step()
        if finished:
            result = finished[0]
        frames = (
            result.frames
            if result is not None
            else np.stack(server.slot_frames[0])
            if server.slot_frames[0]
            else None
        )
        if frames is None or frames.shape[0] <= decoded:
            # EOS can land on a step that adds no new frames — the final
            # done=True is emitted by the guard below, never dropped
            continue
        done = result is not None
        chunk = decode_new(
            frames, decoded, pad_to=chunk_frames if done else None
        )
        decoded = frames.shape[0]
        emitted_any = True
        done_emitted = done_emitted or done
        yield chunk, done
    if result is None or not emitted_any or not done_emitted:
        yield np.zeros(0, np.float32), True


Generator.generate_streaming = _generator_streaming


# bf16 trees larger than this stream through the quantizer at load —
# they cannot coexist with their float form on a 16 GiB chip
_STREAMING_LOAD_BYTES = 8 << 30


def load_csm(
    ckpt_path: Optional[str] = None,
    mimi_path: Optional[str] = None,
    watermarker=None,
    compute_dtype=jnp.bfloat16,
    quantize="none",
    kv_int8: bool = False,
    args: Optional[ModelArgs] = None,
    lora_path: Optional[str] = None,
) -> Generator:
    """Build a CSM Generator of any flavor
    (reference ``load_csm_1b``: src/csm/generator.py:221-244).

    ``args`` — model shape override (default ``csm_1b_args()``; e.g.
    ``csm_8b_args()`` for the original CSM's 8B scale
    (/root/reference/docs/reference/sesame_csm/components.md:8-10) or
    ``tiny_file_args()`` for the file-format fixture flavor).  Models
    whose bf16 tree exceeds ~8 GiB (the 8B flavor) load through the
    leaf-streamed quantizer — ``quantize`` must then be "int8" or
    "int4", and the float tree never materializes on device.

    ``ckpt_path`` — reference ``ckpt.pt`` (torchtune names) or an orbax
    checkpoint directory; None → random init (no network egress here, so
    there is no HF auto-download — pass local files).
    ``mimi_path`` — Mimi safetensors/pt checkpoint; None → random init.
    ``quantize`` — weight-only quantization of the transformer stacks:
    False/"none", True/"int8" (~1.6x faster bandwidth-bound decode),
    "int8-decoder" (quantize only the acoustic decoder: most of the
    speed win with c0 logits bit-identical to bf16), or "int4" (grouped
    4-bit + Pallas fused-dequant kernel; another ~1.4x on the weight
    stream — csm_tpu/utils/quantize.py, ops/int4_matmul.py).
    ``kv_int8`` — int8 KV cache (quantize-at-write, half the decode-time
    cache HBM stream; csm_tpu/ops/kvcache.py).
    ``lora_path`` — optional adapter directory from ``csm-finetune-lora``
    (save-mode lora): merged into the base at load, so a lora-only
    artifact serves directly without a separate full export.  Merge
    happens before ``quantize``.
    """
    from csm_tpu.codec.mimi import CSM_MIMI_CONFIG, mimi_init
    from csm_tpu.models.config import csm_param_count

    args = args or csm_1b_args()
    qmode = {False: "none", True: "int8", None: "none"}.get(quantize, quantize)
    if 2 * csm_param_count(args) > _STREAMING_LOAD_BYTES:
        return _load_csm_streaming(
            ckpt_path, mimi_path, watermarker, compute_dtype, qmode,
            kv_int8, args, lora_path,
        )
    if ckpt_path is None:
        params = jax.jit(lambda: _cast(_random_params(args), compute_dtype))()
    elif ckpt_path.endswith(".pt"):
        from csm_tpu.utils.checkpoint_compat import load_torch_checkpoint

        params = _cast(load_torch_checkpoint(ckpt_path, args), compute_dtype)
    else:
        from csm_tpu.training.checkpoint import load_params

        params, args = load_params(ckpt_path)
        params = _cast(params, compute_dtype)

    if lora_path is not None:
        from csm_tpu.training.lora import load_lora, merge_lora

        lora, lcfg, largs = load_lora(lora_path)
        if largs != args:
            raise ValueError(
                f"adapter at {lora_path} was trained for a different model "
                f"shape (adapter args != loaded args)"
            )
        params = _cast(merge_lora(params, lora, lcfg), compute_dtype)

    if qmode == "int8":
        from csm_tpu.utils.quantize import quantize_csm_params

        params = quantize_csm_params(params)
    elif qmode == "int8-decoder":
        # mixed precision: quantize ONLY the 100M acoustic decoder (31 of
        # the ~12 ms frame's HBM reads re-stream it) — the semantic
        # backbone and codebook-0 head stay bf16, so for the same token
        # history the c0 logits are BIT-IDENTICAL to the unquantized
        # model; only the acoustic codebooks carry quantization error
        from csm_tpu.utils.quantize import quantize_csm_params

        params = quantize_csm_params(params, components=("decoder",))
    elif qmode == "int4":
        from csm_tpu.utils.quantize import quantize_csm_params_int4

        params = jax.jit(quantize_csm_params_int4)(params)
    elif qmode != "none":
        raise ValueError(
            f"quantize must be none|int8|int8-decoder|int4, got {quantize!r}")

    if mimi_path is None:
        mimi_params = mimi_init(jax.random.key(1), CSM_MIMI_CONFIG)
    else:
        from csm_tpu.codec.convert import load_mimi_checkpoint

        mimi_params = load_mimi_checkpoint(mimi_path)

    mimi = MimiAudioTokenizer(mimi_params)
    return Generator(
        params, args, mimi=mimi, watermarker=watermarker,
        compute_dtype=compute_dtype,
        kv_dtype=jnp.int8 if kv_int8 else None,
    )


def _load_csm_streaming(
    ckpt_path, mimi_path, watermarker, compute_dtype, qmode, kv_int8,
    args, lora_path,
) -> Generator:
    """Leaf-streamed load for models too big to exist in bf16 on one chip
    (the 8B flavor): weights are initialized / uploaded and quantized per
    layer chunk, so only the quantized tree ever materializes on device
    (scripts/bench_8b.py proved the memory envelope: int4 serving
    8.58 GiB, int8 ~10 GiB on a 16 GiB v5e)."""
    from csm_tpu.codec.mimi import CSM_MIMI_CONFIG, mimi_init

    if qmode not in ("int8", "int4"):
        raise ValueError(
            f"this model's bf16 tree does not fit one chip: pass "
            f"quantize='int8' or 'int4' (CLI --int8 / --int4, csm-serve "
            f"--weight-dtype int8|int4), got {qmode!r}"
        )
    if lora_path is not None:
        raise ValueError(
            "lora_path merges adapters into a float base, which this "
            "flavor cannot materialize — serve adapters unmerged at "
            "runtime instead (csm-serve --adapter NAME=PATH applies "
            "them on top of the quantized base)"
        )
    if ckpt_path is None:
        from csm_tpu.utils.quantize import init_csm_params_quantized

        params = init_csm_params_quantized(jax.random.key(0), args, qmode)
    elif ckpt_path.endswith((".pt", ".safetensors")):
        from csm_tpu.utils.checkpoint_compat import load_torch_checkpoint
        from csm_tpu.utils.quantize import quantize_csm_params_streaming

        host = load_torch_checkpoint(ckpt_path, args)
        params = quantize_csm_params_streaming(host, mode=qmode)
        del host
    else:
        raise ValueError(
            "orbax checkpoint dirs restore to device in float and would "
            "OOM this flavor — export the checkpoint to .safetensors "
            "(csm_tpu.utils.safetensors_io) or pass a torch .pt"
        )

    if os.environ.get("CSM_TPU_NO_FUSE") != "1":
        params = _fuse_owned(params)

    if mimi_path is None:
        mimi_params = mimi_init(jax.random.key(1), CSM_MIMI_CONFIG)
    else:
        from csm_tpu.codec.convert import load_mimi_checkpoint

        mimi_params = load_mimi_checkpoint(mimi_path)
    return Generator(
        params, args, mimi=MimiAudioTokenizer(mimi_params),
        watermarker=watermarker, compute_dtype=compute_dtype,
        kv_dtype=jnp.int8 if kv_int8 else None,
    )


def _fuse_owned(params: dict) -> dict:
    """qkv / gate-up fusion with incremental freeing.

    ``fuse_csm_params`` builds a full second tree before the first is
    dropped — fine at 1B, but an int8 8B tree (~8.5 GiB) plus its fused
    copy exceeds the chip.  Here the loader owns the ONLY reference, so
    each source projection is released as soon as its fused leaf exists,
    bounding the transient to one fused leaf (~1 GiB).  Downstream
    ``fuse_csm_params`` calls (Generator / BatchedServer) see ``wqkv``
    and skip."""
    for comp in ("backbone", "decoder"):
        tp = params[comp]
        if "wqkv" in tp:
            continue
        for names, fused_name in ((("wq", "wk", "wv"), "wqkv"),
                                  (("w1", "w3"), "w13")):
            ws = [tp.pop(n) for n in names]
            if isinstance(ws[0], dict):
                fused = {
                    k: jnp.concatenate([w[k] for w in ws], axis=-1)
                    for k in ws[0]
                }
            else:
                fused = jnp.concatenate(ws, axis=-1)
            jax.block_until_ready(fused)
            del ws  # last reference: frees the separate projections
            tp[fused_name] = fused
    return params


# Back-compat name from the reference API (src/csm/generator.py:221):
# identical behavior; ``args`` selects the flavor either way.
load_csm_1b = load_csm


def _random_params(args: ModelArgs):
    from csm_tpu.models.csm import init_csm_params

    return init_csm_params(jax.random.key(0), args)


def _cast(params, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype) if hasattr(x, "astype") else x, params
    )
