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


# ---- adapter bank (multi-LoRA serving; csm_tpu/serving.py) ----

# separate projection -> (fused name, out-column offset fn)
_FUSE_TARGET = {
    "wq": ("wqkv", lambda c: 0),
    "wk": ("wqkv", lambda c: c.num_heads * c.head_dim),
    "wv": ("wqkv", lambda c: (c.num_heads + c.num_kv_heads) * c.head_dim),
    "w1": ("w13", lambda c: 0),
    "w3": ("w13", lambda c: c.intermediate_dim),
    "wo": ("wo", lambda c: 0),
    "w2": ("w2", lambda c: 0),
}

_FUSED_OUT = {
    "wqkv": lambda c: (c.num_heads + 2 * c.num_kv_heads) * c.head_dim,
    "w13": lambda c: 2 * c.intermediate_dim,
    "wo": lambda c: c.embed_dim,
    "w2": lambda c: c.embed_dim,
}


_SEPARATE_OUT = {
    "wq": lambda c: c.num_heads * c.head_dim,
    "wk": lambda c: c.num_kv_heads * c.head_dim,
    "wv": lambda c: c.num_kv_heads * c.head_dim,
    "w1": lambda c: c.intermediate_dim,
    "w3": lambda c: c.intermediate_dim,
    "wo": lambda c: c.embed_dim,
    "w2": lambda c: c.embed_dim,
}


def fuse_lora_bank(adapters, args, dtype=jnp.bfloat16,
                   layout: str = "fused") -> dict:
    """Stack adapters into a serving BANK over the FUSED param layout.

    ``adapters`` — list of ``(lora_tree, LoRAConfig)`` as returned by
    ``load_lora``.  Adapters may differ in rank, alpha, and target
    modules.  Returns {"backbone": {fused_name: {"a", "b"}}, "decoder":
    ...} with, per fused projection,

        a: (L, A+1, in, R)    b: (L, A+1, R, out_fused)

    where A = len(adapters), index 0 is the ZERO adapter (base model),
    R = max total rank over adapters, and per-adapter scaling alpha/r is
    FOLDED INTO b (so the forward uses lora_scale=1).  Separate
    projections targeting one fused matmul (wq/wk/wv → wqkv, w1/w3 →
    w13) are rank-CONCATENATED with their b blocks placed at the fused
    out-column offsets — the low-rank forms add, so the fused adapter is
    exactly the sum of the separate ones.  The layer axis leads for
    ``lax.scan`` slicing (csm_tpu/models/llama.transformer_apply).

    ``layout="separate"`` builds the bank over the SEPARATE projection
    names (wq/wk/wv, w1/w3) instead — the layout mesh servers keep
    (tensor parallelism shards q/k/v head groups independently, so
    ``fuse_csm_params`` is single-device-only).  The bank names MUST
    match the param-tree names or the per-projection lookup in
    ``_layer_forward`` silently skips the adapter.
    """
    if layout == "separate":
        target = {n: (n, lambda c: 0) for n in _FUSE_TARGET}
        fused_out = _SEPARATE_OUT
    elif layout == "fused":
        target, fused_out = _FUSE_TARGET, _FUSED_OUT
    else:
        raise ValueError(f"layout must be fused|separate, got {layout!r}")
    comps = {"backbone": args.backbone, "decoder": args.decoder}
    # which fused names does any adapter touch, per component
    touched = {c: set() for c in comps}
    for lora, _cfg in adapters:
        for comp in comps:
            for name in (lora.get(comp) or {}):
                touched[comp].add(target[name][0])

    # total rank per (comp, fused name) per adapter; R = max (+1 floor)
    def total_rank(lora, comp, fused):
        return sum(
            ad["a"].shape[-1]
            for name, ad in (lora.get(comp) or {}).items()
            if target[name][0] == fused
        )

    bank = {}
    for comp, cfg in comps.items():
        sub = {}
        for fused in sorted(touched[comp]):
            R = max(
                [total_rank(lora, comp, fused) for lora, _ in adapters] + [1]
            )
            out_dim = fused_out[fused](cfg)
            in_dim = (
                cfg.num_heads * cfg.head_dim if fused == "wo"
                else cfg.intermediate_dim if fused == "w2"
                else cfg.embed_dim
            )
            L = cfg.num_layers
            a_bank = [jnp.zeros((L, in_dim, R), dtype)]  # id 0 = base
            b_bank = [jnp.zeros((L, R, out_dim), dtype)]
            for lora, lcfg in adapters:
                a_parts, b_parts = [], []
                for name, ad in sorted((lora.get(comp) or {}).items()):
                    tgt, off_fn = target[name]
                    if tgt != fused:
                        continue
                    r = ad["a"].shape[-1]
                    a_parts.append(ad["a"].astype(dtype))
                    bpad = jnp.zeros((L, r, out_dim), dtype)
                    off = off_fn(cfg)
                    b = (ad["b"] * lcfg.scaling).astype(dtype)
                    bpad = jax.lax.dynamic_update_slice(
                        bpad, b, (0, 0, off)
                    )
                    b_parts.append(bpad)
                if a_parts:
                    a = jnp.concatenate(a_parts, axis=-1)
                    b = jnp.concatenate(b_parts, axis=-2)
                else:
                    a = jnp.zeros((L, in_dim, 0), dtype)
                    b = jnp.zeros((L, 0, out_dim), dtype)
                pad_r = R - a.shape[-1]
                if pad_r:
                    a = jnp.pad(a, ((0, 0), (0, 0), (0, pad_r)))
                    b = jnp.pad(b, ((0, 0), (0, pad_r), (0, 0)))
                a_bank.append(a)
                b_bank.append(b)
            sub[fused] = {
                "a": jnp.stack(a_bank, axis=1),  # (L, A+1, in, R)
                "b": jnp.stack(b_bank, axis=1),  # (L, A+1, R, out)
            }
        bank[comp] = sub or None
    return bank
