"""Sharding rules for the CSM parameter tree and training batches.

Tensor-parallel layout (the standard Megatron-style split, expressed as
GSPMD annotations — XLA inserts the all-reduces):

  * attention: wq/wk/wv shard the head (output) dim, wo shards the input
    dim — one psum per attention block;
  * SwiGLU: w1/w3 shard the intermediate dim, w2 shards its input dim —
    one psum per MLP;
  * embeddings shard the vocab dim (gather + psum), heads shard the vocab
    (output) dim — logits come out vocab-sharded and the loss's softmax
    reductions are handled by XLA;
  * norms and small tensors are replicated.

With ``fsdp=True`` the same weights are additionally sharded over the
``data`` axis on their first non-model dim (layer-stacked leading axis),
giving a ZeRO-3-style layout: XLA all-gathers each layer's weights just
before use inside the `lax.scan` over layers and reduce-scatters the
gradients.

Batches shard over ``data`` on the leading (batch) dim.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from csm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _transformer_specs(fsdp: bool) -> dict:
    # Layer-stacked arrays: leading axis = layer. FSDP shards the embed/in
    # dim over data; model axis shards heads / intermediate / output dims.
    d = DATA_AXIS if fsdp else None
    return {
        "wq": P(None, d, MODEL_AXIS),
        "wk": P(None, d, MODEL_AXIS),
        "wv": P(None, d, MODEL_AXIS),
        "wo": P(None, MODEL_AXIS, d),
        "w1": P(None, d, MODEL_AXIS),
        "w3": P(None, d, MODEL_AXIS),
        "w2": P(None, MODEL_AXIS, d),
        "sa_norm": P(None, None),
        "mlp_norm": P(None, None),
        "norm": P(None),
    }


def csm_param_specs(fsdp: bool = False) -> dict:
    """PartitionSpec tree matching ``init_csm_params`` output."""
    d = DATA_AXIS if fsdp else None
    return {
        "backbone": _transformer_specs(fsdp),
        "decoder": _transformer_specs(fsdp),
        "text_embeddings": P(MODEL_AXIS, d),
        "audio_embeddings": P(MODEL_AXIS, d),
        "projection": P(d, MODEL_AXIS),
        "codebook0_head": P(d, MODEL_AXIS),
        "audio_head": P(None, d, MODEL_AXIS),
    }


def batch_specs() -> dict:
    from csm_tpu.training.losses import Batch

    return Batch(
        tokens=P(DATA_AXIS, None, None),
        tokens_mask=P(DATA_AXIS, None, None),
        targets=P(DATA_AXIS, None, None),
        target_mask=P(DATA_AXIS, None),
    )._asdict()


def fit_spec(shape, spec: P, mesh: Mesh) -> P:
    """Drop mesh axes from dims they don't evenly divide (that dim is
    replicated instead; the rest of the spec is kept).

    Real-model necessity, not a convenience: the audio vocab is 2051
    (reference contract, src/csm/generator.py:236) — indivisible by any
    mesh axis — so ``codebook0_head`` / ``audio_head`` vocab dims must
    fall back to replication while every other dim stays sharded.
    GSPMD still shards the matmul FLOPs via the activation/weight specs
    that do apply.
    """
    import math

    out = []
    for i, axis in enumerate(spec):
        if axis is None or i >= len(shape):
            out.append(None)
            continue
        axes = axis if isinstance(axis, tuple) else (axis,)
        div = math.prod(mesh.shape[a] for a in axes)
        out.append(axis if shape[i] % div == 0 else None)
    return P(*out)


def shard_params(params: Any, mesh: Mesh, fsdp: bool = False) -> Any:
    """Place a parameter tree onto the mesh with TP(+FSDP) sharding.

    Dims a mesh axis doesn't divide are replicated (``fit_spec``)."""
    specs = csm_param_specs(fsdp)
    # specs is the first tree so is_leaf sees the PartitionSpec leaves
    # (P is a tuple subclass and would otherwise be flattened).
    return jax.tree.map(
        lambda s, x: jax.device_put(
            x, NamedSharding(mesh, fit_spec(x.shape, s, mesh))
        ),
        specs,
        params,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_batch(batch, mesh: Mesh):
    from csm_tpu.training.losses import Batch

    specs = batch_specs()
    return Batch(
        **{
            k: jax.device_put(getattr(batch, k), NamedSharding(mesh, specs[k]))
            for k in specs
        }
    )
