"""LoRA: low-rank adaptation as a parameter-tree transform.

Capability equivalent of the reference LoRA stack
(src/csm/mlx/components/lora.py + src/csm/training/lora_trainer.py):
  * adapters A ~ N(0, 1/sqrt(in)) of shape (in, r), B = 0 of shape
    (r, out), scaling alpha/r (reference: components/lora.py:52-69);
  * default targets q_proj/v_proj; optional k/o and gate/up/down MLP
    modules, optional layer subset (reference: lora_trainer.py:41-48);
  * only adapter params are optimized (reference: lora_trainer.py:305-372);
  * merge-to-base W' = W + (A @ B) * scaling for export
    (reference: components/lora.py:140-153);
  * save modes lora / full / both with a metadata JSON
    (reference: lora_trainer.py:459-570).

TPU-first design: adapters are LAYER-STACKED arrays (L, in, r)/(L, r, out)
scanned alongside the base weights (csm_tpu/models/llama.py) — one
compiled layer body; the low-rank path (x@A)@B runs in the forward so
gradients exist only for A/B (no merged-weight materialization).  Unlike
the reference (GQA unhandled in adapter shapes, components/lora.py:212-251),
k/v adapters use the true GQA output widths.

Layer subsets are realized by zero-initializing A on non-target layers:
with A=B=0 both gradients vanish identically, so untargeted layers stay
exactly frozen while the scan stays uniform.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from csm_tpu.models.config import ModelArgs, TransformerConfig

# Reference module names (torchtune convention) → our projection names.
MODULE_NAME_MAP = {
    "q_proj": "wq",
    "k_proj": "wk",
    "v_proj": "wv",
    "o_proj": "wo",
    "output_proj": "wo",
    "gate_proj": "w1",
    "up_proj": "w3",
    "down_proj": "w2",
    # already-native names pass through
    "wq": "wq", "wk": "wk", "wv": "wv", "wo": "wo",
    "w1": "w1", "w2": "w2", "w3": "w3",
}

_PROJ_DIMS = {
    # name -> (in_dim, out_dim) as functions of the config
    "wq": lambda c: (c.embed_dim, c.num_heads * c.head_dim),
    "wk": lambda c: (c.embed_dim, c.num_kv_heads * c.head_dim),
    "wv": lambda c: (c.embed_dim, c.num_kv_heads * c.head_dim),
    "wo": lambda c: (c.num_heads * c.head_dim, c.embed_dim),
    "w1": lambda c: (c.embed_dim, c.intermediate_dim),
    "w3": lambda c: (c.embed_dim, c.intermediate_dim),
    "w2": lambda c: (c.intermediate_dim, c.embed_dim),
}


@dataclasses.dataclass(frozen=True)
class LoRAConfig:
    """Reference defaults: r=8, alpha=16, q_proj+v_proj
    (src/csm/training/lora_trainer.py:41-48)."""

    r: int = 8
    alpha: float = 16.0
    dropout: float = 0.0
    target_modules: Tuple[str, ...] = ("q_proj", "v_proj")
    target_layers: Optional[Tuple[int, ...]] = None
    apply_to_backbone: bool = True
    apply_to_decoder: bool = True

    @property
    def scaling(self) -> float:
        return self.alpha / self.r

    @property
    def projections(self) -> Tuple[str, ...]:
        return tuple(MODULE_NAME_MAP[m] for m in self.target_modules)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(s: str) -> "LoRAConfig":
        d = json.loads(s)
        for k in ("target_modules", "target_layers"):
            if d.get(k) is not None:
                d[k] = tuple(d[k])
        return LoRAConfig(**d)


def _init_transformer_lora(
    key: jax.Array, cfg: TransformerConfig, lcfg: LoRAConfig, dtype
) -> dict:
    L = cfg.num_layers
    layer_on = np.zeros((L,), np.float32)
    layers = (
        range(L) if lcfg.target_layers is None else lcfg.target_layers
    )
    for i in layers:
        if 0 <= i < L:
            layer_on[i] = 1.0

    out = {}
    for j, name in enumerate(lcfg.projections):
        din, dout = _PROJ_DIMS[name](cfg)
        a = jax.random.normal(
            jax.random.fold_in(key, j), (L, din, lcfg.r), jnp.float32
        ) / jnp.sqrt(din)
        a = a * jnp.asarray(layer_on)[:, None, None]  # zero → frozen layer
        out[name] = {
            "a": a.astype(dtype),
            "b": jnp.zeros((L, lcfg.r, dout), dtype),
        }
    return out


def init_lora_params(
    key: jax.Array, args: ModelArgs, lcfg: LoRAConfig, dtype=jnp.float32
) -> dict:
    """Adapter tree: {"backbone": {proj: {a, b}}, "decoder": {...}}."""
    kb, kd = jax.random.split(key)
    out = {}
    if lcfg.apply_to_backbone:
        out["backbone"] = _init_transformer_lora(kb, args.backbone, lcfg, dtype)
    if lcfg.apply_to_decoder:
        out["decoder"] = _init_transformer_lora(kd, args.decoder, lcfg, dtype)
    return out


def merge_lora(params: dict, lora: dict, lcfg: LoRAConfig) -> dict:
    """W' = W + (A @ B) * scaling, returning a full merged param tree
    (reference: src/csm/mlx/components/lora.py:140-153, 705-738).

    With a quantized base (csm_tpu/utils/quantize.py, the ``quant_base``
    LoRA trainer modes: int8 per-out-channel or grouped int4) each
    TARGETED projection is dequantized to bf16 before its delta is
    added; untargeted projections keep their stored layout (the model
    forward handles mixed float/quantized trees transparently)."""
    from csm_tpu.utils.quantize import (
        dequantize_weight, dequantize_weight_int4, is_quantized,
        is_quantized_int4)

    merged = dict(params)
    for comp in ("backbone", "decoder"):
        if comp not in lora:
            continue
        sub = dict(params[comp])
        for name, ad in lora[comp].items():
            delta = jnp.einsum("lir,lro->lio", ad["a"], ad["b"]) * lcfg.scaling
            base = sub[name]
            if is_quantized(base):
                base = dequantize_weight(base, jnp.bfloat16)
            elif is_quantized_int4(base):
                base = dequantize_weight_int4(base, jnp.bfloat16)
            sub[name] = base + delta.astype(base.dtype)
        merged[comp] = sub
    return merged


def count_params(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def parameter_efficiency(params: dict, lora: dict) -> float:
    """Trainable fraction (reference logs this,
    src/csm/training/lora_trainer.py:305-372)."""
    return count_params(lora) / max(count_params(params), 1)


# ---- save / load (reference save modes: lora_trainer.py:459-570) ----


def save_lora(path: str, lora: dict, lcfg: LoRAConfig, args: ModelArgs) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, lora, force=True)
    meta = {
        "lora_config": json.loads(lcfg.to_json()),
        "model_args": json.loads(args.to_json()),
        "num_lora_params": count_params(lora),
    }
    with open(os.path.join(path, "lora_metadata.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return path


def load_lora(path: str) -> Tuple[dict, LoRAConfig, ModelArgs]:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        lora = ckptr.restore(path)
    with open(os.path.join(path, "lora_metadata.json")) as f:
        meta = json.load(f)
    return (
        lora,
        LoRAConfig.from_json(json.dumps(meta["lora_config"])),
        ModelArgs.from_json(json.dumps(meta["model_args"])),
    )


def interpolate_lora(loras: Sequence[dict], weights: Sequence[float]) -> dict:
    """Weighted interpolation of adapter trees — the multi-speaker
    merge (reference: src/csm/training/multi_speaker_lora.py:378-438)."""
    assert len(loras) == len(weights) and loras
    total = sum(weights)
    ws = [w / total for w in weights]
    out = jax.tree.map(lambda x: x * ws[0], loras[0])
    for lo, w in zip(loras[1:], ws[1:]):
        out = jax.tree.map(lambda acc, x, w=w: acc + x * w, out, lo)
    return out
