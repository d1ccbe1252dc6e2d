"""``csm-train`` — full-parameter fine-tuning CLI.

Capability equivalent of the reference csm-train (src/csm/cli/train.py):
data directories of (wav, txt, optional alignment json), val split,
per-component LR multipliers, semantic/acoustic loss weights, gradient
accumulation, freeze flags, resume.  The reference's CLI crashes on a
missing import (src/csm/cli/train.py:337) and its loss has a placeholder
acoustic term — both implemented for real here.

csm-train-tpu is an alias (the reference's csm-train-mlx analogue).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

from csm_tpu.cli.common import add_parallel_args, add_tiny_test_flag


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Fine-tune CSM (TPU)")
    # Data
    p.add_argument("--audio-dir", type=str, required=True,
                   help="Directory of .wav files (recursively globbed)")
    p.add_argument("--transcript-dir", type=str, default=None,
                   help="Directory of matching .txt transcripts "
                        "(default: alongside the wavs)")
    p.add_argument("--alignment-dir", type=str, default=None,
                   help="Optional directory of word-alignment .json files")
    p.add_argument("--speaker-id", type=int, default=0)
    p.add_argument("--val-split", type=float, default=0.1)
    p.add_argument("--context-turns", type=int, default=2)
    p.add_argument("--conversational", action="store_true",
                   help="group context windows by source recording so "
                        "context never crosses files (reference "
                        "csm-train-mlx --conversational)")
    p.add_argument("--max-seq-len", type=int, default=2048)
    # Model
    p.add_argument("--model-path", type=str, default=None)
    p.add_argument("--mimi-path", type=str, default=None)
    p.add_argument("--output-dir", type=str, default="./csm_train_output")
    # Optimization
    p.add_argument("--learning-rate", type=float, default=1e-5)
    p.add_argument("--backbone-lr-multiplier", type=float, default=0.1)
    p.add_argument("--decoder-lr-multiplier", type=float, default=1.0)
    p.add_argument("--embedding-lr-multiplier", type=float, default=0.5)
    p.add_argument("--semantic-weight", type=float, default=100.0)
    p.add_argument("--acoustic-weight", type=float, default=1.0)
    p.add_argument("--weight-decay", type=float, default=0.01)
    p.add_argument("--max-grad-norm", type=float, default=1.0)
    p.add_argument("--accumulation-steps", type=int, default=1)
    p.add_argument("--grad-microbatches", type=int, default=1,
                   help="Split each batch into M microbatches INSIDE the "
                        "compiled step (activation memory / M at one extra "
                        "grads-sized buffer; the 8B-fits-8-devices lever)")
    p.add_argument("--param-dtype", choices=["f32", "bf16"], default="f32",
                   help="Master-weight dtype (bf16: half the weight+grad "
                        "HBM; part of the 8B recipe)")
    p.add_argument("--mu-dtype", choices=["f32", "bf16"], default=None,
                   help="Adam first-moment storage dtype (default: follows "
                        "params; moment math is always f32)")
    p.add_argument("--nu-dtype", choices=["f32", "bf16"], default=None,
                   help="Adam second-moment storage dtype (keep f32 unless "
                        "memory-bound: rsqrt(nu) amplifies quantization)")
    p.add_argument("--freeze-backbone", action="store_true")
    p.add_argument("--freeze-decoder", action="store_true")
    p.add_argument("--freeze-embeddings", action="store_true")
    # Schedule
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--val-every", type=int, default=100)
    p.add_argument("--save-every", type=int, default=500)
    p.add_argument("--resume-from", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--async-checkpointing", action="store_true",
                   help="non-blocking checkpoint saves: the step loop "
                        "resumes once arrays are snapshotted; disk writes "
                        "+ the latest pointer commit in the background")
    p.add_argument("--prefetch", type=int, default=2,
                   help="batches collated ahead on a host thread "
                        "(0 disables)")
    add_parallel_args(p)
    # Samples
    p.add_argument("--generate-samples", action="store_true")
    p.add_argument("--sample-prompt", type=str, default="Hello from CSM.")
    add_tiny_test_flag(p)
    return p


def discover_files(args):
    """wav + transcript (+ alignment) triples
    (reference: src/csm/cli/train.py:228-276)."""
    wavs = sorted(
        glob.glob(os.path.join(args.audio_dir, "**", "*.wav"), recursive=True)
    )
    triples = []
    for wav in wavs:
        stem = os.path.splitext(os.path.basename(wav))[0]
        tdir = args.transcript_dir or os.path.dirname(wav)
        txt = os.path.join(tdir, stem + ".txt")
        if not os.path.exists(txt):
            continue
        align = None
        if args.alignment_dir:
            cand = os.path.join(args.alignment_dir, stem + ".json")
            align = cand if os.path.exists(cand) else None
        triples.append((wav, txt, align))
    return triples


def prepare_datasets(args, model_args, audio_tokenizer, text_tokenizer):
    import numpy as np

    from csm_tpu.data import (
        ContextualExampleGenerator,
        CSMDataProcessor,
        CSMDataset,
    )

    proc = CSMDataProcessor()
    examples = []
    for wav, txt, align in discover_files(args):
        examples.extend(
            proc.prepare_from_audio_file(wav, txt, args.speaker_id, align)
        )
    if not examples:
        raise SystemExit(f"no (wav, txt) pairs found under {args.audio_dir}")
    ctx = ContextualExampleGenerator(args.context_turns)
    if getattr(args, "conversational", False):
        # reference --conversational (src/csm/cli/train_mlx.py:627-669):
        # context windows stay within one source recording
        contextual = ctx.create_conversational_examples(examples)
    else:
        contextual = ctx.create_contextual_examples(examples)

    rng = np.random.default_rng(args.seed)
    rng.shuffle(contextual)
    n_val = int(len(contextual) * args.val_split)
    val, train = contextual[:n_val], contextual[n_val:]

    mk = lambda exs: CSMDataset(
        exs, text_tokenizer, audio_tokenizer, args=model_args,
        max_seq_len=args.max_seq_len,
    ) if exs else None
    return mk(train), mk(val)


def build_tokenizers(args, model_args):
    import jax

    from csm_tpu.data.tokenizers import (
        ByteTokenizer,
        MimiAudioTokenizer,
        load_text_tokenizer,
    )

    if args.tiny_test:
        from csm_tpu.codec.mimi import MimiConfig, mimi_init
        from csm_tpu.codec.transformer import MimiTransformerConfig

        mcfg = MimiConfig(
            num_quantizers=model_args.audio_num_codebooks,
            codebook_size=model_args.audio_vocab_size - 3,
            transformer=MimiTransformerConfig(num_layers=1),
        )
        return ByteTokenizer(), MimiAudioTokenizer(
            mimi_init(jax.random.key(1), mcfg), cfg=mcfg
        )
    from csm_tpu.codec.mimi import CSM_MIMI_CONFIG, mimi_init

    if args.mimi_path:
        from csm_tpu.codec.convert import load_mimi_checkpoint

        mimi_params = load_mimi_checkpoint(args.mimi_path)
    else:
        print("WARNING: no --mimi-path; using random codec weights")
        mimi_params = mimi_init(jax.random.key(1), CSM_MIMI_CONFIG)
    return (
        load_text_tokenizer(
            allow_byte_fallback=getattr(args, "allow_byte_tokenizer", False)
            or None
        ),
        MimiAudioTokenizer(mimi_params),
    )


def main(argv=None) -> int:
    from csm_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    args = build_parser().parse_args(argv)
    import jax.numpy as jnp

    from csm_tpu.training.trainer import CSMTrainer

    parallel = None
    if args.distributed:
        from csm_tpu.parallel.distributed import initialize

        pid, nproc = initialize()
        print(f"process {pid}/{nproc}")
    if (args.model_parallel > 1 or args.fsdp or args.pipeline_parallel > 1
            or args.seq_parallel > 1):
        from csm_tpu.parallel.mesh import ParallelConfig

        parallel = ParallelConfig(
            model_parallel=args.model_parallel,
            fsdp=args.fsdp,
            pipeline_parallel=args.pipeline_parallel,
            pp_microbatches=args.pp_microbatches,
            seq_parallel=args.seq_parallel,
            ring_layout=args.ring_layout,
        )

    dt = {"f32": jnp.float32, "bf16": jnp.bfloat16, None: None}
    if args.tiny_test:
        import jax

        from csm_tpu.models.config import tiny_test_args
        from csm_tpu.models.csm import init_csm_params

        model_args = tiny_test_args()
        params = init_csm_params(jax.random.key(0), model_args, jnp.float32)
        trainer = CSMTrainer(
            output_dir=args.output_dir, args=model_args, params=params,
            learning_rate=args.learning_rate,
            backbone_lr_multiplier=args.backbone_lr_multiplier,
            decoder_lr_multiplier=args.decoder_lr_multiplier,
            embedding_lr_multiplier=args.embedding_lr_multiplier,
            semantic_weight=args.semantic_weight,
            acoustic_weight=args.acoustic_weight,
            weight_decay=args.weight_decay,
            compute_dtype=jnp.float32,
            remat=False,
            parallel=parallel,
            param_dtype=dt[args.param_dtype],
            async_checkpointing=args.async_checkpointing,
            prefetch_depth=args.prefetch,
        )
    else:
        trainer = CSMTrainer(
            model_path=args.model_path,
            output_dir=args.output_dir,
            learning_rate=args.learning_rate,
            backbone_lr_multiplier=args.backbone_lr_multiplier,
            decoder_lr_multiplier=args.decoder_lr_multiplier,
            embedding_lr_multiplier=args.embedding_lr_multiplier,
            semantic_weight=args.semantic_weight,
            acoustic_weight=args.acoustic_weight,
            weight_decay=args.weight_decay,
            parallel=parallel,
            param_dtype=dt[args.param_dtype],
            async_checkpointing=args.async_checkpointing,
            prefetch_depth=args.prefetch,
        )

    text_tok, audio_tok = build_tokenizers(args, trainer.args)
    train_ds, val_ds = prepare_datasets(args, trainer.args, audio_tok, text_tok)
    trainer.logger.info(
        f"dataset: {len(train_ds)} train / {len(val_ds) if val_ds else 0} val examples"
    )

    trainer.prepare_optimizer(
        freeze_backbone=args.freeze_backbone,
        freeze_decoder=args.freeze_decoder,
        freeze_embeddings=args.freeze_embeddings,
        max_grad_norm=args.max_grad_norm,
        accumulation_steps=args.accumulation_steps,
        mu_dtype=dt[args.mu_dtype],
        nu_dtype=dt[args.nu_dtype],
        grad_microbatches=args.grad_microbatches,
    )
    loss = trainer.train(
        train_ds,
        val_ds,
        batch_size=args.batch_size,
        epochs=args.epochs,
        val_every=args.val_every,
        save_every=args.save_every,
        resume_from=args.resume_from,
        seed=args.seed,
    )
    print(f"training done, final loss {loss:.4f}")

    if args.generate_samples:
        out = os.path.join(args.output_dir, "sample.wav")
        trainer.generate_sample(
            args.sample_prompt, args.speaker_id, out, mimi=audio_tok
        )
        print(f"wrote sample {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
