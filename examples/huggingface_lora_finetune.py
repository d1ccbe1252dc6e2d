"""LoRA fine-tune CSM on a HuggingFace dataset (e.g. Common Voice).

Equivalent of the reference examples/huggingface_lora_finetune.py:
download a speech dataset → convert to TrainingExamples → contextual
examples → CSMLoRATrainer → adapter + samples.

Requires network access (datasets + checkpoints) — in offline
environments use --tiny-test with local wavs instead.

Usage:
    python examples/huggingface_lora_finetune.py \
        --dataset mozilla-foundation/common_voice_17_0 --language en \
        --num-samples 100 --output-dir ./cv_lora
"""

from __future__ import annotations

import argparse
import sys


def load_hf_examples(dataset_name: str, language: str, n: int, sample_rate: int):
    """Stream ``n`` clips from a HF speech dataset into TrainingExamples."""
    import numpy as np

    try:
        from datasets import Audio, load_dataset
    except ImportError:
        raise SystemExit("pip install datasets (not available offline)")

    from csm_tpu.data import TrainingExample
    from csm_tpu.data.audio import resample

    ds = load_dataset(dataset_name, language, split="train", streaming=True)
    ds = ds.cast_column("audio", Audio(sampling_rate=sample_rate))

    examples = []
    for row in ds:
        audio = np.asarray(row["audio"]["array"], np.float32)
        sr = row["audio"]["sampling_rate"]
        if sr != sample_rate:
            audio = resample(audio, sr, sample_rate)
        text = (row.get("sentence") or row.get("text") or "").strip()
        if len(text) < 10 or len(audio) < sample_rate:
            continue
        examples.append(TrainingExample(text=text, audio=audio, speaker_id=0))
        if len(examples) >= n:
            break
    return examples


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="mozilla-foundation/common_voice_17_0")
    p.add_argument("--language", default="en")
    p.add_argument("--num-samples", type=int, default=100)
    p.add_argument("--model-path", default=None)
    p.add_argument("--mimi-path", default=None)
    p.add_argument("--output-dir", default="./cv_lora")
    p.add_argument("--lora-r", type=int, default=8)
    p.add_argument("--lora-alpha", type=float, default=16.0)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--epochs", type=int, default=3)
    args = p.parse_args(argv)

    from csm_tpu.data import ContextualExampleGenerator, CSMDataset
    from csm_tpu.data.tokenizers import MimiAudioTokenizer, load_text_tokenizer
    from csm_tpu.training.trainer import CSMLoRATrainer

    trainer = CSMLoRATrainer(
        model_path=args.model_path,
        output_dir=args.output_dir,
        lora_r=args.lora_r,
        lora_alpha=args.lora_alpha,
    )

    print(f"downloading {args.num_samples} clips from {args.dataset}...")
    examples = load_hf_examples(args.dataset, args.language, args.num_samples, 24_000)
    contextual = ContextualExampleGenerator(2).create_contextual_examples(examples)
    n_val = max(1, len(contextual) // 10)
    val, train = contextual[:n_val], contextual[n_val:]

    if args.mimi_path:
        from csm_tpu.codec.convert import load_mimi_checkpoint

        mimi = MimiAudioTokenizer(load_mimi_checkpoint(args.mimi_path))
    else:
        import jax

        from csm_tpu.codec.mimi import CSM_MIMI_CONFIG, mimi_init

        print("WARNING: no --mimi-path, using random codec weights")
        mimi = MimiAudioTokenizer(mimi_init(jax.random.key(1), CSM_MIMI_CONFIG))
    # offline demo: the byte fallback is acceptable here (loud warning)
    text_tok = load_text_tokenizer(allow_byte_fallback=True)

    mk = lambda exs: CSMDataset(exs, text_tok, mimi, args=trainer.args)
    trainer.prepare_optimizer()
    loss = trainer.train(
        mk(train), mk(val), batch_size=args.batch_size, epochs=args.epochs
    )
    print(f"final loss {loss:.4f}")
    trainer.save_model(f"{args.output_dir}/adapter", save_mode="both")
    trainer.generate_sample(
        "This voice was fine-tuned on Common Voice.", 0,
        f"{args.output_dir}/sample.wav", mimi=mimi, text_tokenizer=text_tok,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
