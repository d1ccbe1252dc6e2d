"""``csm-generate`` — speech generation CLI.

Capability equivalent of the reference csm-generate + csm-generate-mlx
(src/csm/cli/generate.py, generate_mlx.py): voice presets, contextual
generation from audio/text/speaker triples, sampling controls, seed, and
the accelerated backend's RTF / frames-per-second reporting
(generate_mlx.py:584-587,694-717).  There is one backend here — the TPU —
so the two reference CLIs collapse into one (``csm-generate-tpu`` is an
alias).
"""

from __future__ import annotations

import argparse
import sys
import time

from csm_tpu.cli.common import (
    add_tiny_test_flag,
    add_voice_args,
    build_generator,
    resolve_speaker,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Generate speech with CSM (TPU)")
    p.add_argument("--model-path", type=str, default=None,
                   help="CSM checkpoint: reference ckpt.pt or an orbax dir "
                        "(no network egress — files must be local)")
    p.add_argument("--lora-path", type=str, default=None,
                   help="LoRA adapter directory (csm-finetune-lora "
                        "save-mode lora): merged into the base at load — "
                        "serve a fine-tune from the lora-only artifact")
    p.add_argument("--mimi-path", type=str, default=None,
                   help="Mimi codec checkpoint (safetensors/pt)")
    p.add_argument("--text", type=str, required=True)
    add_voice_args(p)
    p.add_argument("--output", type=str, default="audio.wav")
    p.add_argument("--context-audio", type=str, nargs="*")
    p.add_argument("--context-text", type=str, nargs="*")
    p.add_argument("--context-speaker", type=int, nargs="*")
    p.add_argument("--max-audio-length-ms", type=int, default=10_000)
    p.add_argument("--temperature", type=float, default=0.9)
    p.add_argument("--topk", type=int, default=50)
    p.add_argument("--seed", type=int, default=0, help="Sampling RNG seed")
    p.add_argument("--int8", action="store_true",
                   help="int8 weight-only quantization (~1.6x faster decode)")
    p.add_argument("--int8-decoder", action="store_true",
                   help="int8-quantize ONLY the acoustic decoder (most of "
                        "--int8's decode speedup; the semantic backbone "
                        "and codebook-0 logits stay bit-identical to bf16)")
    p.add_argument("--int4", action="store_true",
                   help="grouped int4 weight-only quantization (Pallas "
                        "fused-dequant kernel; fastest decode, more "
                        "quantization error than --int8)")
    p.add_argument("--flavor", choices=("1b", "8b", "tiny"), default="1b",
                   help="Model shape for --model-path checkpoints: 1b "
                        "(default), 8b (the original CSM's internal "
                        "scale; loads leaf-streamed — requires --int8 or "
                        "--int4 on one chip), or tiny (tiny layers, full "
                        "1B token geometry — the file-format test fixture)")
    p.add_argument("--kv-int8", action="store_true",
                   help="int8 KV cache (quantize at write; halves the "
                        "decode-time cache HBM stream)")
    p.add_argument("--no-watermark", action="store_true",
                   help="Skip watermarking the generated audio")
    p.add_argument("--watermark-ckpt", type=str, default=None,
                   help="Directory with silentcipher torch checkpoints")
    p.add_argument("--stream", action="store_true",
                   help="Stream generation (low first-audio latency): decode "
                        "in chunks and report per-chunk latency; watermarking "
                        "is applied to the final concatenation")
    p.add_argument("--chunk-frames", type=int, default=6,
                   help="Frames per streamed chunk (6 = 480 ms of audio)")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--profile", type=str, default=None, metavar="DIR",
                   help="Write a jax.profiler trace of the generation to DIR "
                        "(view with XProf/TensorBoard)")
    add_tiny_test_flag(p)
    return p


def load_context(args, generator):
    from csm_tpu.data.audio import load_audio
    from csm_tpu.generator import Segment

    if not args.context_audio:
        return []
    if not (args.context_text and args.context_speaker) or not (
        len(args.context_audio) == len(args.context_text) == len(args.context_speaker)
    ):
        raise ValueError(
            "--context-audio requires matching --context-text and "
            "--context-speaker lists"
        )
    return [
        Segment(speaker=s, text=t, audio=load_audio(a, generator.sample_rate))
        for a, t, s in zip(args.context_audio, args.context_text, args.context_speaker)
    ]


def main(argv=None) -> int:
    from csm_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    args = build_parser().parse_args(argv)
    speaker = resolve_speaker(args)

    print("Loading model...")
    t0 = time.time()
    generator = build_generator(args)
    if not args.no_watermark:
        from csm_tpu.watermarking import load_watermarker, watermark

        wmarker = load_watermarker(args.watermark_ckpt)
        generator.watermarker = lambda audio, sr: watermark(wmarker, audio, sr)
    print(f"Model ready in {time.time() - t0:.1f}s")

    context = load_context(args, generator)
    if getattr(args, "tiny_test", False):
        # the tiny fixture's context is short (128 positions); clamp the
        # default 10 s budget to what the ACTUAL prompt bucket leaves
        # room for (80 ms per frame) instead of erroring
        from csm_tpu.models.generation import PROMPT_BUCKETS, bucket_length

        tokens, _ = generator._build_prompt(args.text, speaker, context)
        try:
            bucket = bucket_length(
                tokens.shape[0],
                tuple(b for b in PROMPT_BUCKETS if b <= generator.max_seq_len),
            )
            limit_ms = (generator.max_seq_len - bucket) * 80
        except ValueError:
            limit_ms = 0
        if limit_ms <= 0:
            print(f"--tiny-test: prompt ({tokens.shape[0]} frames) fills the "
                  f"tiny context; shorten --text", file=sys.stderr)
            return 1
        if args.max_audio_length_ms > limit_ms:
            print(f"--tiny-test: clamping --max-audio-length-ms to {limit_ms}")
            args.max_audio_length_ms = limit_ms
    print(f"Generating: {args.text!r} (speaker {speaker}, "
          f"{len(context)} context segments)")
    from csm_tpu.utils.observability import profile_trace

    with profile_trace(args.profile, enabled=args.profile is not None):
        if args.stream:
            import numpy as np

            t0 = time.time()
            chunks = []
            for i, (chunk, done) in enumerate(
                generator.generate_streaming(
                    args.text, speaker=speaker, context=context,
                    max_audio_length_ms=args.max_audio_length_ms,
                    temperature=args.temperature, topk=args.topk,
                    seed=args.seed, chunk_frames=args.chunk_frames,
                )
            ):
                chunks.append(chunk)
                tag = "first audio" if i == 0 else f"chunk {i}"
                print(f"  {tag}: +{len(chunk) / generator.sample_rate * 1000:.0f} ms "
                      f"audio at t={time.time() - t0:.3f}s")
            audio = np.concatenate(chunks) if chunks else np.zeros(0, "float32")
            if generator.watermarker is not None and audio.shape[0]:
                audio, _ = generator.watermarker(audio, generator.sample_rate)
            generator.last_stats = {
                "wall_s": time.time() - t0,
                "rtf": len(audio) / generator.sample_rate / max(time.time() - t0, 1e-9),
                "frames_per_s": len(audio) / 1920 / max(time.time() - t0, 1e-9),
            }
        else:
            audio = generator.generate(
                args.text,
                speaker=speaker,
                context=context,
                max_audio_length_ms=args.max_audio_length_ms,
                temperature=args.temperature,
                topk=args.topk,
                seed=args.seed,
            )

    from csm_tpu.data.audio import save_wav

    save_wav(args.output, audio, generator.sample_rate)
    s = generator.last_stats
    print(
        f"Wrote {args.output}: {len(audio) / generator.sample_rate:.2f}s audio "
        f"in {s['wall_s']:.2f}s (RTF {s['rtf']:.2f}, "
        f"{s['frames_per_s']:.1f} frames/s)"
    )
    if args.debug:
        print("timing_stats:", {k: round(v, 4) for k, v in s.items()})
    return 0


if __name__ == "__main__":
    sys.exit(main())
