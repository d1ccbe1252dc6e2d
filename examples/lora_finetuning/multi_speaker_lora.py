"""Multi-speaker LoRA with shared-adapter interpolation (library API).

Equivalent of the reference examples/lora_finetuning multi-speaker
variant + merge_speaker_models: per-speaker adapters over one shared
base, then a weighted shared/speaker adapter mix for generation.

Usage: python examples/lora_finetuning/multi_speaker_lora.py <cfg.json> [out]
"""

import json
import sys

from csm_tpu.cli.train import build_tokenizers, prepare_datasets
from csm_tpu.training.lora import merge_lora
from csm_tpu.training.multi_speaker import MultiSpeakerLoRATrainer


def main(config_path: str, out_dir: str = "./multi_speaker",
         tiny_test: bool = False):
    from types import SimpleNamespace

    speakers = json.load(open(config_path))
    ids = [s["speaker_id"] for s in speakers]

    base_kw = {}
    if tiny_test:
        import jax
        import jax.numpy as jnp

        from csm_tpu.models.config import tiny_test_args
        from csm_tpu.models.csm import init_csm_params

        margs = tiny_test_args()
        base_kw = dict(
            args=margs,
            params=init_csm_params(jax.random.key(0), margs, jnp.float32),
            compute_dtype=jnp.float32, remat=False,
        )

    ms = MultiSpeakerLoRATrainer(
        speaker_ids=ids,
        output_dir=out_dir,
        use_shared_adapter=True,
        lora_r=8,
        lora_alpha=16.0,
        **base_kw,
    )

    datasets = {}
    for s in speakers:
        args = SimpleNamespace(
            audio_dir=s["audio_dir"], transcript_dir=s.get("transcript_dir"),
            alignment_dir=s.get("alignment_dir"), speaker_id=s["speaker_id"],
            val_split=0.0, context_turns=2, max_seq_len=2048,
            mimi_path=None, seed=0, tiny_test=tiny_test,
        )
        trainer = ms.trainers[s["speaker_id"]]
        text_tok, audio_tok = build_tokenizers(args, trainer.args)
        train_ds, _ = prepare_datasets(args, trainer.args, audio_tok, text_tok)
        datasets[s["speaker_id"]] = train_ds

    ms.train(datasets, epochs=3, batch_size=2)
    ms.save_speaker_models(save_mode="lora")

    # interpolate shared & per-speaker adapters, merge into full weights
    for sid in ids:
        mixed = ms.merge_speaker_models(sid, shared_weight=0.3)
        t = ms.trainers[sid]
        merged = merge_lora(t.params, mixed, t.lora_config)
        print(f"speaker {sid}: merged adapter ready "
              f"({sum(x.size for x in __import__('jax').tree.leaves(mixed)):,} adapter params)")


if __name__ == "__main__":
    main(*sys.argv[1:])
