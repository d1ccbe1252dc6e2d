"""Pipeline parallelism over the layer-stacked transformer.

The reference has no distributed training of any kind (SURVEY.md §2.9);
pipeline parallelism here targets the 8B CSM flavor
(docs/reference/sesame_csm/components.md:8-10 — the original Sesame
backbone), whose f32 training state does not fit one chip: stages hold
contiguous layer blocks, so per-device parameter + optimizer bytes fall
by the stage count without any per-matmul collective traffic.

TPU-first design (GPipe-style schedule as pure SPMD dataflow):

  * the transformer's parameters are ALREADY layer-stacked ``(L, ...)``
    arrays scanned by ``transformer_apply`` — a pipeline stage is just a
    shard of that leading axis, so sharding ``L`` over a ``pipe`` mesh
    axis gives each device an ``(L/P, ...)`` block and the stage body is
    the same compiled layer scan;
  * the schedule is a single ``lax.scan`` of ``M + P − 1`` steps
    (M microbatches, P stages): each step every device runs its layer
    block, then activations rotate to the ICI neighbor with
    ``lax.ppermute`` (stage 0 injects microbatch ``t``; stage P−1's
    output at step ``t`` is finished microbatch ``t − (P−1)``);
  * bubble slots compute on don't-care data that is masked out of the
    collected outputs — uniform control flow keeps the program static
    and lets XLA overlap each step's permute DMA with the next step's
    compute;
  * the backward pass needs no hand-written schedule: ``ppermute``
    transposes to the inverse rotation under reverse-mode AD, so the
    cotangents flow back through the pipeline in reverse automatically,
    and each stage's parameter gradients land sharded over ``pipe``
    exactly like the parameters (ZeRO-style optimizer sharding for free
    along the stage axis);
  * outputs leave the pipeline via one masked ``psum`` over ``pipe``
    (stage P−1 holds the real values, everyone else contributes zeros),
    which doubles as the broadcast that keeps the downstream loss
    computation replicated across stages.

Composes with data parallelism on a ``(data, pipe)`` mesh: the batch
shards over ``data``, microbatching happens on the local batch shard,
and XLA all-reduces gradients over ``data`` as usual.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from csm_tpu.models.config import TransformerConfig
from csm_tpu.models.llama import _layer_forward
from csm_tpu.ops.attention import causal_mask_from_positions
from csm_tpu.ops.norms import rms_norm
from csm_tpu.ops.rope import rope_at_positions

PIPE_AXIS = "pipe"
DATA_AXIS = "data"

_STACKED = ("wq", "wk", "wv", "wo", "w1", "w2", "w3", "sa_norm", "mlp_norm")


MODEL_AXIS = "model"


def make_pp_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    pipeline_parallel: int = 2,
    model_parallel: int = 1,
) -> Mesh:
    """A (data, pipe) mesh — or (data, pipe, model) when
    ``model_parallel > 1`` (pipeline stages with Megatron TP inside each
    stage: the 8B-at-16-devices composition).  ``jax.devices()`` order
    follows the physical torus, so contiguous pipe/model groups are ICI
    neighbors and both the per-step activation rotation and the
    per-matmul TP collectives ride ICI."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    group = pipeline_parallel * model_parallel
    if n % group != 0:
        raise ValueError(
            f"{n} devices not divisible by pipeline_parallel="
            f"{pipeline_parallel} x model_parallel={model_parallel}"
        )
    if model_parallel > 1:
        arr = np.asarray(devices).reshape(
            n // group, pipeline_parallel, model_parallel
        )
        return Mesh(arr, (DATA_AXIS, PIPE_AXIS, MODEL_AXIS))
    arr = np.asarray(devices).reshape(n // pipeline_parallel, pipeline_parallel)
    return Mesh(arr, (DATA_AXIS, PIPE_AXIS))


def pp_param_specs(tp: bool = False) -> dict:
    """PartitionSpec tree for ``init_csm_params`` output on a (data, pipe)
    mesh: layer-stacked transformer arrays shard their leading (layer)
    axis over ``pipe``; embeddings / heads / final norms are replicated
    (they run outside the pipelined region).

    ``tp=True`` (a (data, pipe, model) mesh): each stage's layer block
    additionally shards heads / intermediate dims over ``model`` —
    the same Megatron column/row convention as
    csm_tpu/parallel/sharding._transformer_specs.  The ``model`` axis is
    left AUTO in the pipeline's shard_map, so GSPMD inserts the TP
    collectives inside each stage body."""
    m = MODEL_AXIS if tp else None
    stacked = {
        "wq": P(PIPE_AXIS, None, m),
        "wk": P(PIPE_AXIS, None, m),
        "wv": P(PIPE_AXIS, None, m),
        "wo": P(PIPE_AXIS, m, None),
        "w1": P(PIPE_AXIS, None, m),
        "w3": P(PIPE_AXIS, None, m),
        "w2": P(PIPE_AXIS, m, None),
        "sa_norm": P(PIPE_AXIS),
        "mlp_norm": P(PIPE_AXIS),
    }
    stacked["norm"] = P()
    return {
        "backbone": stacked,
        # The decoder runs OUTSIDE the pipelined region (plain GSPMD), but
        # its layer stack still shards over ``pipe`` for memory — XLA
        # all-gathers each layer's weights inside its scan.
        "decoder": dict(stacked),
        # Embeddings / heads shard their vocab dim over ``pipe``
        # (TP-style, GSPMD inserts the gather/psum) — at 8B these are
        # ~3 GiB f32 that would otherwise replicate per stage.
        "text_embeddings": P(PIPE_AXIS, None),
        "audio_embeddings": P(PIPE_AXIS, None),
        "projection": P(),
        "codebook0_head": P(None, PIPE_AXIS),
        "audio_head": P(None, None, PIPE_AXIS),
    }


def shard_params_pp(params, mesh: Mesh):
    """Place a CSM parameter tree onto a (data, pipe) mesh.

    The pipelined layer stacks REQUIRE divisibility (a stage is a layer
    block); the auxiliary vocab shardings degrade to replication when a
    dim doesn't divide (e.g. the 2051 audio vocab; fit_spec)."""
    from csm_tpu.parallel.sharding import fit_spec

    specs = pp_param_specs(tp=MODEL_AXIS in mesh.axis_names)

    def put(path, s, x):
        comp = path[0].key if path else ""
        if comp == "backbone" and s and s[0] == PIPE_AXIS:
            # the pipelined stack: layer-axis divisibility enforced by
            # pipelined_transformer, don't silently replicate it; the
            # inner (TP) dims still fall back when indivisible
            inner = fit_spec(x.shape, P(None, *tuple(s)[1:]), mesh)
            sp = P(PIPE_AXIS, *tuple(inner)[1:])
        else:
            sp = fit_spec(x.shape, s, mesh)
        return jax.device_put(x, NamedSharding(mesh, sp))

    return jax.tree_util.tree_map_with_path(
        put, specs, params, is_leaf=lambda x: isinstance(x, P)
    )


def shard_lora_pp(lora: dict, mesh: Mesh) -> dict:
    """Place a layer-stacked LoRA adapter tree (csm_tpu/training/lora.py)
    onto the pipe mesh: backbone adapters shard their layer axis like the
    base stack they ride through the pipeline; decoder adapters (the
    decoder runs OUTSIDE the pipelined region, and its 4 layers may not
    divide the stage count) fall back to replication when indivisible."""
    pipe = mesh.shape[PIPE_AXIS]

    def put(x):
        sp = P(PIPE_AXIS) if x.shape[0] % pipe == 0 else P()
        return jax.device_put(x, NamedSharding(mesh, sp))

    return jax.tree.map(put, lora)


def _pipeline_local(
    stacked: dict,
    lora: Optional[dict],
    h_loc: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    cfg: TransformerConfig,
    n_microbatches: int,
    lora_scale: float,
    remat: bool,
    lora_dropout_rate: float = 0.0,
    lora_dropout_key=None,
):
    """Per-device pipeline body (call inside shard_map).

    stacked: this stage's (L/P, ...) layer block; h_loc: the local
    (B/dp, T, E) batch shard, replicated over ``pipe``.

    LoRA dropout keys are derived per (GLOBAL layer, pipeline step):
    stage ``s``'s local layer ``i`` is global layer ``s*L/P + i``, and
    folding in the schedule step gives every microbatch an independent
    mask (masks can't be bit-identical to the single-device path — batch
    slicing differs — but the rate and independence match).
    """
    n_stages = jax.lax.axis_size(PIPE_AXIS)
    stage_idx = jax.lax.axis_index(PIPE_AXIS)
    M = n_microbatches
    B, T, E = h_loc.shape
    if B % M:
        raise ValueError(f"local batch {B} not divisible by microbatches {M}")
    mb = B // M
    h_mb = h_loc.reshape(M, mb, T, E)

    drop_on = lora_dropout_key is not None and lora_dropout_rate > 0.0
    n_local = stacked["wq"].shape[0]
    layer_ids = stage_idx * n_local + jnp.arange(n_local)

    def layer_body(t, carry, x):
        lp, lo, lid = x
        lk = (
            jax.random.fold_in(jax.random.fold_in(lora_dropout_key, lid), t)
            if drop_on else None
        )
        h_new, _ = _layer_forward(
            carry, lp, cfg, cos, sin, mask, None, None,
            lora=lo, lora_scale=lora_scale,
            lora_dropout_rate=lora_dropout_rate if drop_on else 0.0,
            lora_key=lk,
        )
        return h_new, None

    if remat:
        layer_body = jax.checkpoint(layer_body)

    def run_stage(x, t):
        y, _ = jax.lax.scan(
            functools.partial(layer_body, t), x, (stacked, lora, layer_ids)
        )
        return y

    fwd = [(i, (i + 1) % n_stages) for i in range(n_stages)]
    n_steps = M + n_stages - 1

    def step(carry, t):
        # stage 0 injects microbatch t (clamped re-runs in bubble slots
        # are masked out of the collected outputs)
        inject = jax.lax.dynamic_index_in_dim(
            h_mb, jnp.clip(t, 0, M - 1), 0, keepdims=False
        )
        x_in = jnp.where(stage_idx == 0, inject, carry)
        y = run_stage(x_in, t)
        nxt = jax.lax.ppermute(y, PIPE_AXIS, fwd)
        return nxt, y

    carry0 = jnp.zeros((mb, T, E), h_loc.dtype)
    _, ys = jax.lax.scan(step, carry0, jnp.arange(n_steps))

    # stage P-1's output at step t is finished microbatch t-(P-1);
    # masked psum both filters the bubble garbage and broadcasts the
    # result so downstream (loss) computation is replicated over pipe.
    outs = ys[n_stages - 1 :]  # (M, mb, T, E)
    outs = jnp.where(stage_idx == n_stages - 1, outs, jnp.zeros_like(outs))
    outs = jax.lax.psum(outs, PIPE_AXIS)
    return outs.reshape(B, T, E)


def pipelined_transformer(
    params: dict,
    cfg: TransformerConfig,
    h: jnp.ndarray,
    positions: jnp.ndarray,
    mesh: Mesh,
    n_microbatches: int,
    *,
    lora: Optional[dict] = None,
    lora_scale: float = 0.0,
    remat: bool = False,
    lora_dropout_rate: float = 0.0,
    lora_dropout_key=None,
) -> jnp.ndarray:
    """Pipeline-parallel ``transformer_apply`` (full-sequence, no cache).

    Args:
        params: layer-stacked transformer params (csm_tpu/models/llama.py),
            placed with ``pp_param_specs`` (layer axis over ``pipe``).
        h: (B, T, E) global hidden states, batch over ``data``.
        positions: (T,) int positions (training layout: all rows aligned).
        mesh: a mesh with a ``pipe`` axis (and optionally ``data``).
        n_microbatches: microbatches per local batch shard; the pipeline
            bubble fraction is (P-1)/(M+P-1).
        lora: optional layer-stacked adapters (sharded over ``pipe`` like
            the base weights); scanned alongside them in the stage body.

    Returns (B, T, E) output after the final norm — numerically the
    single-device ``transformer_apply`` up to reduction order.
    """
    if cfg.num_layers % mesh.shape[PIPE_AXIS]:
        raise ValueError(
            f"{cfg.num_layers} layers not divisible by "
            f"pipe={mesh.shape[PIPE_AXIS]}"
        )
    cos, sin = rope_at_positions(cfg, positions)  # (T, D/2)
    mask = causal_mask_from_positions(positions[None, :], positions)  # (1,T,T)

    data = DATA_AXIS if DATA_AXIS in mesh.axis_names else None
    stacked = {k: params[k] for k in _STACKED}
    stacked_spec = {k: P(PIPE_AXIS) for k in _STACKED}
    lora_spec = None if lora is None else jax.tree.map(
        lambda _: P(PIPE_AXIS), lora
    )

    drop_on = lora_dropout_key is not None and lora_dropout_rate > 0.0

    def local(stacked, lora, h, cos, sin, mask, dkey):
        return _pipeline_local(
            stacked, lora, h, cos, sin, mask,
            cfg=cfg,
            n_microbatches=n_microbatches,
            lora_scale=lora_scale,
            remat=remat,
            lora_dropout_rate=lora_dropout_rate if drop_on else 0.0,
            lora_dropout_key=dkey if drop_on else None,
        )

    # pipe (and data) are MANUAL axes; a ``model`` axis, when present,
    # stays AUTO so GSPMD inserts the Megatron TP collectives inside each
    # stage body from the weight shardings (pp_param_specs(tp=True))
    manual = frozenset(a for a in mesh.axis_names if a != MODEL_AXIS)
    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(stacked_spec, lora_spec, P(data, None, None), P(), P(),
                  P(), P()),
        out_specs=P(data, None, None),
        check_vma=False,
        axis_names=manual,
    )
    h = f(stacked, lora, h, cos, sin, mask,
          lora_dropout_key if drop_on else jnp.zeros((), jnp.uint32))
    return rms_norm(h, params["norm"], cfg.norm_eps)
