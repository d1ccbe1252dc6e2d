"""Multi-chip sharding validation (subprocess CPU mesh).

The TPU build's analogue of multi-node tests the reference lacks
(SURVEY.md §4): the SAME jitted train step must compile and run SPMD over
an 8-device (data, model) mesh with dp+tp+fsdp shardings.  Runs in a
subprocess with ``JAX_PLATFORMS=cpu`` + 8 virtual host devices — the
exact environment the driver uses for ``dryrun_multichip``.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cpu8(code: str, timeout: int = 1800) -> str:
    # Scrub the axon TPU plugin env — its sitecustomize force-selects the
    # TPU platform regardless of JAX_PLATFORMS.
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("PALLAS_AXON", "AXON_"))
    }
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    return proc.stdout


@pytest.mark.multichip
def test_dryrun_multichip_8():
    """The driver's canonical multichip drive: full sharded train step."""
    out = _run_cpu8(
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    assert "dryrun_multichip OK" in out


@pytest.mark.multichip
def test_sharded_step_matches_single_device():
    """Sharded (4x2 dp+tp+fsdp) step == single-device step, same batch."""
    out = _run_cpu8(
        """
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_default_matmul_precision", "highest")
from csm_tpu.models.config import tiny_test_args
from csm_tpu.models.csm import init_csm_params
from csm_tpu.parallel.mesh import make_mesh
from csm_tpu.parallel.sharding import shard_batch, shard_params
from csm_tpu.training.losses import Batch
from csm_tpu.training.optimizer import TrainState, init_train_state, make_optimizer
from csm_tpu.training.train_step import make_train_step

args = tiny_test_args()
K = args.audio_num_codebooks
params = init_csm_params(jax.random.key(3), args, jnp.float32)
rng = np.random.default_rng(0)
B, T = 4, 8
tokens = np.zeros((B, T, K + 1), np.int32)
tokens_mask = np.zeros((B, T, K + 1), bool)
targets = np.zeros((B, T, K), np.int32)
target_mask = np.zeros((B, T), bool)
tokens[:, : T // 2, -1] = rng.integers(1, args.text_vocab_size, (B, T // 2))
tokens_mask[:, : T // 2, -1] = True
audio = rng.integers(0, args.audio_vocab_size, (B, T - T // 2, K))
tokens[:, T // 2 :, :K] = audio
tokens_mask[:, T // 2 :, :K] = True
targets[:, T // 2 - 1 : T - 1] = audio
target_mask[:, T // 2 - 1 : T - 1] = True
batch = Batch(jnp.asarray(tokens), jnp.asarray(tokens_mask),
              jnp.asarray(targets), jnp.asarray(target_mask))

tx = make_optimizer(params, learning_rate=1e-3)
step = make_train_step(args, tx, compute_dtype=jnp.float32)

state1 = init_train_state(jax.tree.map(jnp.array, params), tx)
state1, m1 = step(state1, jax.random.key(7), batch)

mesh = make_mesh(jax.devices()[:8], model_parallel=2)
sparams = shard_params(params, mesh, fsdp=True)
opt_state = jax.jit(tx.init)(sparams)
state8 = TrainState(sparams, opt_state, jnp.zeros((), jnp.int32))
state8, m8 = step(state8, jax.random.key(7), shard_batch(batch, mesh))

np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=2e-4)
np.testing.assert_allclose(
    np.asarray(state1.params["decoder"]["wo"]),
    np.asarray(state8.params["decoder"]["wo"]), atol=2e-5)
print("sharded parity OK", float(m1["loss"]), float(m8["loss"]))
"""
    )
    assert "sharded parity OK" in out
