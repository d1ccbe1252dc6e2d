"""Checkpoint interop with the reference's PyTorch/torchtune name space.

The reference distributes CSM-1B as a torch ``state_dict`` with torchtune
naming (the name map is documented by the reference's own MLX converter,
src/csm/mlx/components/transformer.py:79-103 and
src/csm/mlx/mlx_wrapper.py:104-311):

    backbone.layers.{i}.attn.{q,k,v,output}_proj.weight
    backbone.layers.{i}.mlp.{w1,w2,w3}.weight
    backbone.layers.{i}.{sa_norm,mlp_norm}.scale
    backbone.norm.scale            (same for decoder.*)
    text_embeddings.weight, audio_embeddings.weight,
    projection.weight, codebook0_head.weight, audio_head

Two representation changes happen at import:
  1. Linear weights transpose (out, in) → (in, out) so forward is ``x @ W``.
  2. q/k projection output rows are permuted from torchtune's *interleaved*
     RoPE pair layout to our *half-split* layout (see csm_tpu/ops/rope.py).
     Permutation per head: [0, 2, 4, ..., D-2, 1, 3, 5, ..., D-1] — then
     half-split pair (j, j + D/2) is exactly the interleaved pair (2j, 2j+1),
     so attention scores are bit-identical in exact arithmetic.

Both directions are provided so checkpoints can round-trip to the reference
format.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from csm_tpu.models.config import ModelArgs, TransformerConfig


def interleaved_to_half_perm(head_dim: int) -> np.ndarray:
    """Head-dim permutation taking interleaved RoPE layout to half-split."""
    return np.concatenate(
        [np.arange(0, head_dim, 2), np.arange(1, head_dim, 2)]
    )


def half_to_interleaved_perm(head_dim: int) -> np.ndarray:
    """Inverse permutation (export direction)."""
    return np.argsort(interleaved_to_half_perm(head_dim))


def _permute_qk_rows(w: np.ndarray, num_heads: int, head_dim: int, perm: np.ndarray):
    """Permute the output rows of a (num_heads*head_dim, in) projection
    within each head."""
    out_dim, in_dim = w.shape
    w = w.reshape(num_heads, head_dim, in_dim)
    w = w[:, perm, :]
    return w.reshape(out_dim, in_dim)


def _np(t) -> np.ndarray:
    """torch tensor / array-like → float32 numpy without importing torch."""
    if hasattr(t, "detach"):
        t = t.detach()
    if hasattr(t, "to") and hasattr(t, "cpu"):
        import torch  # local import: only needed when converting torch ckpts

        return t.to(torch.float32).cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def convert_transformer(
    state: Dict[str, np.ndarray], prefix: str, cfg: TransformerConfig
) -> Dict[str, np.ndarray]:
    """Convert one transformer's torchtune tensors to our layer-stacked tree."""
    L, D = cfg.num_layers, cfg.head_dim
    perm = interleaved_to_half_perm(D)

    def layer(i, name):
        return _np(state[f"{prefix}.layers.{i}.{name}"])

    wq, wk, wv, wo, w1, w2, w3, sa, mn = [], [], [], [], [], [], [], [], []
    for i in range(L):
        q = _permute_qk_rows(layer(i, "attn.q_proj.weight"), cfg.num_heads, D, perm)
        k = _permute_qk_rows(layer(i, "attn.k_proj.weight"), cfg.num_kv_heads, D, perm)
        wq.append(q.T)
        wk.append(k.T)
        wv.append(layer(i, "attn.v_proj.weight").T)
        wo.append(layer(i, "attn.output_proj.weight").T)
        w1.append(layer(i, "mlp.w1.weight").T)
        w2.append(layer(i, "mlp.w2.weight").T)
        w3.append(layer(i, "mlp.w3.weight").T)
        sa.append(layer(i, "sa_norm.scale"))
        mn.append(layer(i, "mlp_norm.scale"))

    return {
        "wq": np.stack(wq),
        "wk": np.stack(wk),
        "wv": np.stack(wv),
        "wo": np.stack(wo),
        "w1": np.stack(w1),
        "w2": np.stack(w2),
        "w3": np.stack(w3),
        "sa_norm": np.stack(sa),
        "mlp_norm": np.stack(mn),
        "norm": _np(state[f"{prefix}.norm.scale"]),
    }


def convert_torch_state_dict(state: Dict, args: ModelArgs) -> dict:
    """Reference torch ``state_dict`` → CSM-TPU parameter tree (numpy f32;
    cast with ``jax.tree.map`` afterwards)."""
    return {
        "backbone": convert_transformer(state, "backbone", args.backbone),
        "decoder": convert_transformer(state, "decoder", args.decoder),
        "text_embeddings": _np(state["text_embeddings.weight"]),
        "audio_embeddings": _np(state["audio_embeddings.weight"]),
        "projection": _np(state["projection.weight"]).T,
        "codebook0_head": _np(state["codebook0_head.weight"]).T,
        "audio_head": _np(state["audio_head"]),
    }


def export_transformer(
    tree: Dict[str, np.ndarray], prefix: str, cfg: TransformerConfig
) -> Dict[str, np.ndarray]:
    """Our layer-stacked tree → torchtune-named flat tensors."""
    D = cfg.head_dim
    perm = half_to_interleaved_perm(D)
    out: Dict[str, np.ndarray] = {}
    for i in range(cfg.num_layers):
        q = np.asarray(tree["wq"][i]).T
        k = np.asarray(tree["wk"][i]).T
        out[f"{prefix}.layers.{i}.attn.q_proj.weight"] = _permute_qk_rows(
            q, cfg.num_heads, D, perm
        )
        out[f"{prefix}.layers.{i}.attn.k_proj.weight"] = _permute_qk_rows(
            k, cfg.num_kv_heads, D, perm
        )
        out[f"{prefix}.layers.{i}.attn.v_proj.weight"] = np.asarray(tree["wv"][i]).T
        out[f"{prefix}.layers.{i}.attn.output_proj.weight"] = np.asarray(
            tree["wo"][i]
        ).T
        out[f"{prefix}.layers.{i}.mlp.w1.weight"] = np.asarray(tree["w1"][i]).T
        out[f"{prefix}.layers.{i}.mlp.w2.weight"] = np.asarray(tree["w2"][i]).T
        out[f"{prefix}.layers.{i}.mlp.w3.weight"] = np.asarray(tree["w3"][i]).T
        out[f"{prefix}.layers.{i}.sa_norm.scale"] = np.asarray(tree["sa_norm"][i])
        out[f"{prefix}.layers.{i}.mlp_norm.scale"] = np.asarray(tree["mlp_norm"][i])
    out[f"{prefix}.norm.scale"] = np.asarray(tree["norm"])
    return out


def export_to_torch_names(params: dict, args: ModelArgs) -> Dict[str, np.ndarray]:
    """CSM-TPU parameter tree → reference-named numpy dict."""
    to_np = lambda x: np.asarray(x, dtype=np.float32)
    out = export_transformer(
        {k: to_np(v) for k, v in params["backbone"].items()}, "backbone", args.backbone
    )
    out.update(
        export_transformer(
            {k: to_np(v) for k, v in params["decoder"].items()},
            "decoder",
            args.decoder,
        )
    )
    out["text_embeddings.weight"] = to_np(params["text_embeddings"])
    out["audio_embeddings.weight"] = to_np(params["audio_embeddings"])
    out["projection.weight"] = to_np(params["projection"]).T
    out["codebook0_head.weight"] = to_np(params["codebook0_head"]).T
    out["audio_head"] = to_np(params["audio_head"])
    return out


def load_torch_checkpoint(path: str, args: ModelArgs) -> dict:
    """Load a reference ``ckpt.pt`` (torch) or ``.safetensors`` file into a
    CSM-TPU param tree (reference load path: src/csm/generator.py:240-241)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        state = load_file(path)
    else:
        import torch

        state = torch.load(path, map_location="cpu", weights_only=True)
    return convert_torch_state_dict(state, args)
