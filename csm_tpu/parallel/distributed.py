"""Multi-host / multi-slice runtime: process init, hybrid meshes, data feed.

The reference is single-process, single-device by construction (SURVEY.md
§2.9 — no torch.distributed anywhere); this module is the TPU-native
scale-out story on top of the same jitted programs:

  * one JAX process per host, `jax.distributed.initialize()` — on TPU
    pods the coordinator/process topology comes from the TPU metadata, so
    a bare `initialize()` works under every standard launcher;
  * ONE global mesh over `jax.devices()` (all processes see all devices);
    the same `make_train_step` / `shard_params` / `shard_batch` calls then
    run multi-host SPMD with zero code changes — GSPMD inserts collectives
    over ICI within a slice and DCN across slices;
  * multi-slice meshes keep the DATA axis outermost across slices
    (`hybrid_mesh`): gradient all-reduce is the only cross-slice traffic,
    riding DCN once per step, while TP/pipeline traffic stays on ICI —
    the "How to Scale Your Model" slice-layout recipe;
  * each process loads only its shard of the global batch
    (`process_batch_slice`) and assembles the logically-global array with
    `global_batch_from_local` — no host ever materializes the full batch.

Single-process environments degrade gracefully: `initialize()` is a no-op
without coordinator info, meshes span the local devices, and the process
batch slice is the whole batch — so every code path here is exercised by
the single-host tests and the multi-host behavior differs only by the
process topology JAX reports.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from csm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Join the multi-host runtime; returns (process_index, process_count).

    On TPU pods all three arguments come from the platform metadata and a
    bare call suffices.  Elsewhere they can be passed explicitly or via
    the standard env vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID).  A single-process run (no coordinator info anywhere)
    skips initialization entirely and reports (0, 1).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    if num_processes is None and env_np:
        num_processes = int(env_np)
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if process_id is None and env_pid:
        process_id = int(env_pid)
    # A pod slice announces its peers; a single-worker attachment (or a
    # dev box) must NOT initialize — the coordinator would wait forever.
    workers = [
        w for w in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if w
    ]
    multi_host = (
        coordinator_address is not None
        or (num_processes or 0) > 1
        or len(workers) > 1
        or "MEGASCALE_COORDINATOR_ADDRESS" in os.environ
    )
    if multi_host and not _already_initialized():
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def _already_initialized() -> bool:
    """jax.distributed.initialize raises if called twice; callers like
    csm-finetune-lora-multi build one trainer per speaker and must be
    able to call initialize() each time."""
    if hasattr(jax.distributed, "is_initialized"):
        return bool(jax.distributed.is_initialized())
    from jax._src.distributed import global_state  # older jax

    return global_state.client is not None


def hybrid_mesh(
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    num_slices: Optional[int] = None,
) -> Mesh:
    """A (data, model) mesh that keeps DATA outermost across slices.

    Within one slice this is exactly ``make_mesh``.  Across slices
    (multi-slice TPU, DCN-connected), the data axis is laid out
    slice-major so the only cross-slice collective is the once-per-step
    gradient all-reduce; every TP collective stays on ICI.  ``num_slices``
    defaults to what the platform reports.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    if num_slices is None:
        slice_ids = {getattr(d, "slice_index", 0) for d in devices}
        num_slices = len(slice_ids)
    per_slice = n // num_slices
    if per_slice % model_parallel:
        raise ValueError(
            f"model_parallel={model_parallel} must fit within one slice "
            f"({per_slice} devices) — TP over DCN would bottleneck every matmul"
        )
    if num_slices > 1:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(per_slice // model_parallel, model_parallel),
            dcn_mesh_shape=(num_slices, 1),
            devices=devices,
        )
    else:
        arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def process_batch_slice(
    global_batch_size: int, mesh: Optional[Mesh] = None
) -> Tuple[int, int]:
    """(start, size) of the global-batch rows THIS process should load.

    Without a mesh: even contiguous split by process index (correct when
    the data axis is laid out process-major, as ``hybrid_mesh`` does).
    With a mesh: computed from actual device ownership along the data
    axis — on a (data, pipe) or (data, seq) mesh whose model/pipe/seq
    axis spans processes, several processes address the SAME rows (batch
    is replicated over non-data axes) and each must load them all; the
    even split would starve the step.  The global batch must divide the
    data axis (uneven host batches silently skew gradient weighting).
    """
    if mesh is None:
        n = jax.process_count()
        if global_batch_size % n:
            raise ValueError(
                f"global batch {global_batch_size} not divisible by "
                f"{n} processes"
            )
        per = global_batch_size // n
        return jax.process_index() * per, per

    dp = mesh.shape[DATA_AXIS]
    if global_batch_size % dp:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by the "
            f"data axis ({dp})"
        )
    ax = list(mesh.axis_names).index(DATA_AXIS)
    dev = np.moveaxis(mesh.devices, ax, 0).reshape(dp, -1)
    pid = jax.process_index()
    owned = [
        i for i in range(dp)
        if any(d.process_index == pid for d in dev[i])
    ]
    if not owned:
        raise ValueError("this process owns no devices on the data axis")
    if owned != list(range(owned[0], owned[-1] + 1)):
        raise ValueError(
            "non-contiguous data-axis ownership for this process; build "
            "the mesh data-outermost across hosts (hybrid_mesh)"
        )
    per = global_batch_size // dp
    return owned[0] * per, len(owned) * per


def global_batch_from_local(local_batch, mesh: Mesh, seq_sharded: bool = False):
    """Assemble the logically-global, data-sharded Batch from each
    process's local rows (csm_tpu/training/losses.Batch in, Batch out).

    Single-process: equivalent to ``shard_batch``.  Multi-host: each
    process contributes only its ``process_batch_slice(B, mesh)`` rows
    and the result is a global jax.Array addressable by the same train
    step.  Works on every mesh layout whose batch rows are sharded over
    the data axis only — (data, model), (data, pipe) — because non-data
    axes never appear in the batch specs; replicated copies are supplied
    by each owning process.

    ``seq_sharded`` — (data, seq) ring-attention layout: the sequence
    dim is sharded over the ``seq`` axis too.  Each process still feeds
    the FULL sequence extent of its rows, so the seq axis must live
    within a process (the performance-correct layout anyway: ring
    collectives ride ICI, not DCN) — the shape check below raises
    otherwise rather than mis-assembling.
    """
    from csm_tpu.parallel.sharding import batch_specs
    from csm_tpu.training.losses import Batch

    specs = batch_specs()
    if seq_sharded:
        from csm_tpu.parallel.ring_attention import SEQ_AXIS

        def add_seq(spec):
            # index 1 is the sequence dim; a rank-1 spec would silently
            # drop the seq sharding after truncation — refuse instead
            if len(spec) < 2:
                raise ValueError(f"batch spec {spec} has no sequence dim "
                                 "to shard over the seq axis")
            return P(spec[0], SEQ_AXIS, *spec[2:])

        specs = {k: add_seq(s) for k, s in specs.items()}
    out = {}
    for k in specs:
        local = np.asarray(getattr(local_batch, k))
        out[k] = jax.make_array_from_process_local_data(
            NamedSharding(mesh, specs[k]), local
        )
    return Batch(**out)
