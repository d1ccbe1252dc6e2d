"""Sharding for inference & serving over a (data, model) mesh.

Round-1 wired the mesh only through ``make_train_step``; this module
threads the same GSPMD specs through the decode path (SURVEY.md §5.8:
"Batched serving (BASELINE config 5) = batch-axis sharding of the decode
scan"; VERDICT round-1 item #2):

  * weights: Megatron-style TP over ``model`` (csm_param_specs, no FSDP —
    serving wants weights resident, not gathered per layer);
  * KV caches + per-slot bookkeeping: batch/slot dim over ``data``, KV
    heads over ``model`` — each data-group of chips owns a disjoint set
    of streams, each model-group splits every stream's heads;
  * prompts/batches: leading dim over ``data`` when divisible, otherwise
    replicated (GSPMD still shards the flops via the weight specs).

The v5e-8 serving plan (BASELINE config 5 names v5e-8) is documented in
docs/architecture.md §serving-scale: CSM-1B in bf16 is ~2.2 GB, so the
plan is mesh (data=8, model=1) — 8 independent slot groups, weights
replicated, zero decode-path collectives; ``model>1`` is reserved for
the 8B flavor where weights + cache exceed one chip's HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from csm_tpu.models.csm import FrameState
from csm_tpu.ops.kvcache import KVCache
from csm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from csm_tpu.parallel.sharding import csm_param_specs


def shard_inference_params(params, mesh: Mesh):
    """Place CSM weights on the mesh with TP sharding (no FSDP).

    int8-quantized projections ({"w8", "scale"} leaves, csm_tpu/utils/
    quantize.py) shard like their float originals: w8 takes the weight's
    spec; the per-out-channel scale (L, 1, out) keeps only the out-dim
    axis."""
    from csm_tpu.parallel.sharding import fit_spec
    from csm_tpu.utils.quantize import is_quantized

    specs = csm_param_specs(fsdp=False)

    def put(s, x):
        if is_quantized(x):
            w_spec = fit_spec(x["w8"].shape, s, mesh)
            return {
                "w8": jax.device_put(x["w8"], NamedSharding(mesh, w_spec)),
                "scale": jax.device_put(
                    x["scale"],
                    NamedSharding(
                        mesh,
                        fit_spec(x["scale"].shape, P(None, None, s[2]), mesh),
                    ),
                ),
            }
        return jax.device_put(
            x, NamedSharding(mesh, fit_spec(x.shape, s, mesh))
        )

    return jax.tree.map(put, specs, params, is_leaf=lambda x: isinstance(x, P))


def frame_state_specs(
    per_row_offset: bool, cache: KVCache | None = None
) -> FrameState:
    """PartitionSpec tree for a FrameState: slots over data, heads over model.

    ``cache`` — optional template whose k/v structure the spec tree must
    match (int8 caches carry {q, s} QuantKV leaves; the SAME 5-D spec
    applies to both: codes and per-row scales shard identically)."""
    kv = P(None, DATA_AXIS, None, MODEL_AXIS, None)
    k_spec = v_spec = kv
    if cache is not None:
        k_spec = jax.tree.map(lambda _: kv, cache.k)
        v_spec = jax.tree.map(lambda _: kv, cache.v)
    return FrameState(
        cache=KVCache(k_spec, v_spec),
        offset=P(DATA_AXIS) if per_row_offset else P(),
        kv_pos=P(DATA_AXIS, None),
    )


def shard_frame_state(state: FrameState, mesh: Mesh) -> FrameState:
    specs = frame_state_specs(
        per_row_offset=state.offset.ndim == 1, cache=state.cache
    )
    return jax.tree.map(
        lambda s, x: jax.device_put(x, NamedSharding(mesh, s)),
        specs,
        state,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_batch_dim(x, mesh: Mesh):
    """Shard an array's leading dim over ``data`` when divisible, else
    replicate (GSPMD then reshards internally as propagation dictates)."""
    n_data = mesh.shape[DATA_AXIS]
    spec = P(DATA_AXIS) if x.shape[0] % n_data == 0 else P()
    full = P(*([spec[0] if spec else None] + [None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, full))


def device_put_replicated(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))


def per_device_bytes(shapes, specs, mesh: Mesh) -> int:
    """Per-device bytes of a sharded tree: each leaf's bytes divided by the
    product of the mesh-axis sizes its FITTED PartitionSpec names — dims a
    mesh axis doesn't divide count as replicated (fit_spec), matching what
    shard_params/shard_inference_params actually place."""
    import math

    from csm_tpu.parallel.sharding import fit_spec

    leaves_shapes = jax.tree.leaves(shapes)
    leaves_specs = jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))
    total = 0
    for shp, spec in zip(leaves_shapes, leaves_specs):
        n = math.prod(shp.shape) * shp.dtype.itemsize if shp.shape else shp.dtype.itemsize
        div = 1
        for axis in fit_spec(shp.shape, spec, mesh):
            if axis is None:
                continue
            for a in (axis if isinstance(axis, tuple) else (axis,)):
                div *= mesh.shape[a]
        total += -(-n // div)
    return total


def hbm_plan(args, n_slots: int, max_seq_len: int, dtype_bytes: int = 2) -> dict:
    """Back-of-envelope per-device HBM for a serving config (documented
    evidence for the v5e-8 plan; see also dryrun_multichip's compiled
    memory report)."""
    bb = args.backbone
    # parameter bytes computed from shapes, not materialized weights
    from csm_tpu.models.csm import init_csm_params

    shapes = jax.eval_shape(
        lambda k: init_csm_params(k, args, jnp.bfloat16), jax.random.key(0)
    )
    import math

    param_bytes = sum(
        math.prod(l.shape) * dtype_bytes for l in jax.tree.leaves(shapes)
    )
    cache_bytes = (
        2  # k and v
        * bb.num_layers
        * n_slots
        * max_seq_len
        * bb.num_kv_heads
        * bb.head_dim
        * dtype_bytes
    )
    return {
        "param_bytes": param_bytes,
        "cache_bytes": cache_bytes,
        "total_bytes": param_bytes + cache_bytes,
    }
