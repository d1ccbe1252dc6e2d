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

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


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
