"""Expressive style-transfer LoRA fine-tuning.

Equivalent of the reference examples/lora_finetuning/style_transfer_finetune.py:
capturing a speaking STYLE (prosody, pacing, expressiveness) rather than
just a voice needs a bigger adapter — high rank (r=32), all attention +
FFN projections, both transformers — trained on audio performed in the
target style.

Usage: python examples/lora_finetuning/style_transfer_lora.py <audio_dir> [out_dir]
"""

import sys
from types import SimpleNamespace

from csm_tpu.cli.train import build_tokenizers, prepare_datasets
from csm_tpu.training.trainer import CSMLoRATrainer

SAMPLE_PROMPTS = [
    "This is a test of the style-transferred voice model.",
    "Every sentence carries the new speaking style.",
]


def main(audio_dir: str, out_dir: str = "./lora_style",
         tiny_test: bool = False):
    args = SimpleNamespace(
        audio_dir=audio_dir, transcript_dir=None, alignment_dir=None,
        speaker_id=0, val_split=0.1, context_turns=2,
        max_seq_len=2048,  # style lives in long-range prosody: keep context
        mimi_path=None, seed=0, tiny_test=tiny_test,
    )

    lora_kw = dict(
        lora_r=32,                # high rank: style needs capacity
        lora_alpha=64.0,          # alpha/r = 2
        target_modules=(          # full projection surface, both stacks
            "q_proj", "k_proj", "v_proj", "o_proj",
            "gate_proj", "up_proj", "down_proj",
        ),
        apply_to_backbone=True,
        apply_to_decoder=True,    # acoustic codebooks carry the timbre
        learning_rate=1e-4,
    )
    if tiny_test:
        import jax
        import jax.numpy as jnp

        from csm_tpu.models.config import tiny_test_args
        from csm_tpu.models.csm import init_csm_params

        margs = tiny_test_args()
        trainer = CSMLoRATrainer(
            output_dir=out_dir, args=margs,
            params=init_csm_params(jax.random.key(0), margs, jnp.float32),
            compute_dtype=jnp.float32, remat=False, **lora_kw,
        )
    else:
        trainer = CSMLoRATrainer(output_dir=out_dir, **lora_kw)

    text_tok, audio_tok = build_tokenizers(args, trainer.args)
    train_ds, val_ds = prepare_datasets(args, trainer.args, audio_tok, text_tok)
    trainer.prepare_optimizer()
    loss = trainer.train(train_ds, val_ds, batch_size=2, epochs=10)
    print(f"final loss: {loss:.4f}")

    # 'both' keeps the adapter artifact AND a merged full model
    trainer.save_model(f"{out_dir}/model", save_mode="both")
    for i, prompt in enumerate(SAMPLE_PROMPTS):
        trainer.generate_sample(
            prompt, 0, f"{out_dir}/style_sample_{i}.wav",
            mimi=audio_tok, text_tokenizer=text_tok,
        )


if __name__ == "__main__":
    main(*sys.argv[1:])
