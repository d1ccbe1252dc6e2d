"""Safetensors import/export for CSM parameters.

The reference's MLX stack checkpoints models as safetensors with
torchtune-style names (src/csm/training/utils.py:577-861); supporting the
same format means adapters/models move freely between the stacks.  Arrays
are stored under the torch-name mapping defined by
csm_tpu/utils/checkpoint_compat.py (RoPE row permutation included), so a
safetensors file written here loads into the reference and vice versa.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from csm_tpu.models.config import ModelArgs
from csm_tpu.utils.checkpoint_compat import (
    convert_torch_state_dict,
    export_to_torch_names,
)


def save_params_safetensors(path: str, params: dict, args: ModelArgs) -> str:
    """Write params as safetensors with reference (torchtune) names."""
    from safetensors.numpy import save_file

    named = export_to_torch_names(
        jax.tree.map(lambda x: np.asarray(x, np.float32), params), args
    )
    save_file({k: np.ascontiguousarray(v) for k, v in named.items()}, path,
              metadata={"format": "csm-tpu", "model_args": args.to_json()})
    return path


def load_params_safetensors(path: str, args: ModelArgs | None = None) -> tuple[dict, ModelArgs]:
    """Load a reference-named safetensors checkpoint into our param tree."""
    from safetensors.numpy import safe_open

    state: Dict[str, np.ndarray] = {}
    with safe_open(path, framework="numpy") as f:
        meta = f.metadata() or {}
        for k in f.keys():
            state[k] = f.get_tensor(k)
    if args is None:
        if "model_args" in meta:
            args = ModelArgs.from_json(meta["model_args"])
        else:
            from csm_tpu.models.config import csm_1b_args

            args = csm_1b_args()
    params = jax.tree.map(jnp.asarray, convert_torch_state_dict(state, args))
    return params, args
