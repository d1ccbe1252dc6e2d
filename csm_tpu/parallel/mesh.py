"""Device mesh construction for CSM training & serving.

The reference has NO distributed support of any kind (SURVEY.md §2.9 —
no torch.distributed, no NCCL/MPI); scaling here is built the TPU way:
a `jax.sharding.Mesh` with named axes and GSPMD sharding propagation,
collectives riding ICI.

Axes:
    data  — batch-parallel axis (gradients all-reduced by XLA).
    model — tensor-parallel axis (attention heads / FFN intermediate /
            vocab sharded; activations resharded by XLA as needed).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class ParallelConfig:
    """Trainer-level parallelism selection (csm_tpu/training/trainer.py).

    ``model_parallel``/``fsdp`` build a (data, model) mesh (Megatron TP +
    optional ZeRO-3 layout, csm_tpu/parallel/sharding.py);
    ``pipeline_parallel`` builds a (data, pipe) mesh instead
    (csm_tpu/parallel/pipeline.py); ``seq_parallel`` builds a (data, seq)
    mesh for long-context ring-attention training
    (csm_tpu/parallel/ring_attention.py; the batch's time dim shards
    over ``seq``, so it must be a multiple of the axis size).  The three mesh layouts are mutually
    exclusive.  The remaining devices always form the data axis.
    """

    model_parallel: int = 1
    fsdp: bool = False
    pipeline_parallel: int = 1
    pp_microbatches: int = 1
    seq_parallel: int = 1
    # ring-attention sequence layout for seq_parallel>1: "auto" uses the
    # balanced zigzag whenever T divides by 2*seq_parallel (contiguous
    # gives the last device ~2x the causal work), else contiguous;
    # results are identical either way (csm_tpu/parallel/ring_attention.py)
    ring_layout: str = "auto"

    @property
    def enabled(self) -> bool:
        return (
            self.model_parallel > 1
            or self.fsdp
            or self.pipeline_parallel > 1
            or self.seq_parallel > 1
        )

    def build_mesh(self, devices=None) -> Mesh:
        exclusive = (
            (self.pipeline_parallel > 1)
            + (self.seq_parallel > 1)
            + (self.model_parallel > 1 or self.fsdp)
        )
        if exclusive > 1:
            raise ValueError(
                "pipeline_parallel, seq_parallel, and model_parallel/fsdp "
                "are mutually exclusive mesh layouts"
            )
        if self.pipeline_parallel > 1:
            from csm_tpu.parallel.pipeline import make_pp_mesh

            return make_pp_mesh(devices, pipeline_parallel=self.pipeline_parallel)
        if self.seq_parallel > 1:
            from csm_tpu.parallel.ring_attention import make_sp_mesh

            return make_sp_mesh(devices, seq_parallel=self.seq_parallel)
        # (data, model): DCN-aware layout — data outermost across slices so
        # only the gradient all-reduce crosses slices (single slice/host
        # reduces to make_mesh exactly)
        from csm_tpu.parallel.distributed import hybrid_mesh

        return hybrid_mesh(model_parallel=self.model_parallel, devices=devices)


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    model_parallel: int = 1,
) -> Mesh:
    """Build a (data, model) mesh over ``devices``.

    ``model_parallel`` divides the device count; the rest is the data axis.
    On a TPU slice, `jax.devices()` order already follows the physical
    torus, so contiguous model groups map to ICI neighbors.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def shard(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
