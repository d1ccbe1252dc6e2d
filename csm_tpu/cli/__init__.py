"""Console entry points (see pyproject [project.scripts] and docs/cli.md):
csm-generate, csm-train, csm-finetune-lora, csm-finetune-lora-multi,
csm-verify, csm-benchmark-tpu, csm-benchmark-lora (+ -tpu aliases)."""
