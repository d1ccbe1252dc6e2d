"""Low-resource LoRA fine-tuning (< ~10 minutes of audio).

Equivalent of the reference examples/lora_finetuning/low_resource_finetune.py:
with very little data the failure mode is overfitting, so the recipe is
a LOW rank (r=4, proportional alpha), q/v-only adapters, small batches,
more epochs, and adapter dropout for regularization.

Usage: python examples/lora_finetuning/low_resource_lora.py <audio_dir> [out_dir]
"""

import sys
from types import SimpleNamespace

from csm_tpu.cli.train import build_tokenizers, prepare_datasets
from csm_tpu.training.trainer import CSMLoRATrainer


def main(audio_dir: str, out_dir: str = "./lora_low_resource",
         tiny_test: bool = False):
    args = SimpleNamespace(
        audio_dir=audio_dir, transcript_dir=None, alignment_dir=None,
        speaker_id=0, val_split=0.2,  # bigger val split: overfitting watch
        context_turns=1, max_seq_len=1024,  # short windows: more examples
        mimi_path=None, seed=0, tiny_test=tiny_test,
    )

    lora_kw = dict(
        lora_r=4,                 # low rank: fewer trainable params to overfit
        lora_alpha=8.0,           # keep alpha/r = 2 like the r=8 default
        lora_dropout=0.1,         # regularize the adapter input
        target_modules=("q_proj", "v_proj"),  # smallest useful surface
        learning_rate=5e-5,       # gentler than the 1e-4 default
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
    # more epochs compensate for few examples; best-val checkpointing in
    # the trainer is the early-stopping mechanism
    loss = trainer.train(train_ds, val_ds, batch_size=1, epochs=15)
    print(f"final loss: {loss:.4f}")

    trainer.save_model(f"{out_dir}/adapter", save_mode="lora")
    trainer.generate_sample(
        "A few minutes of audio is enough.", 0, f"{out_dir}/sample.wav",
        mimi=audio_tok, text_tokenizer=text_tok,
    )


if __name__ == "__main__":
    main(*sys.argv[1:])
