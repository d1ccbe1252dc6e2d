"""Basic LoRA fine-tuning through the library API.

Equivalent of the reference examples/lora_finetuning/ basic variant:
prepare data → CSMLoRATrainer → train → save adapter → sample.

Usage: python examples/lora_finetuning/basic_lora.py <audio_dir> [out_dir]
"""

import sys

from csm_tpu.cli.train import build_tokenizers, prepare_datasets
from csm_tpu.training.trainer import CSMLoRATrainer


def main(audio_dir: str, out_dir: str = "./lora_basic", tiny_test: bool = False):
    from types import SimpleNamespace

    args = SimpleNamespace(
        audio_dir=audio_dir, transcript_dir=None, alignment_dir=None,
        speaker_id=0, val_split=0.1, context_turns=2, max_seq_len=2048,
        mimi_path=None, seed=0, tiny_test=tiny_test,
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
            lora_r=8, lora_alpha=16.0, compute_dtype=jnp.float32, remat=False,
        )
    else:
        trainer = CSMLoRATrainer(output_dir=out_dir, lora_r=8, lora_alpha=16.0)

    text_tok, audio_tok = build_tokenizers(args, trainer.args)
    train_ds, val_ds = prepare_datasets(args, trainer.args, audio_tok, text_tok)
    trainer.prepare_optimizer()
    loss = trainer.train(train_ds, val_ds, batch_size=2, epochs=3)
    print(f"final loss: {loss:.4f}")

    trainer.save_model(f"{out_dir}/adapter", save_mode="lora")
    trainer.generate_sample(
        "Hello from my fine-tuned voice.", 0, f"{out_dir}/sample.wav",
        mimi=audio_tok, text_tokenizer=text_tok,
    )


if __name__ == "__main__":
    main(*sys.argv[1:])
