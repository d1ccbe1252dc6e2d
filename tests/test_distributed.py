"""Multi-host runtime helpers (single-process behavior + CPU-mesh SPMD).

True multi-host needs multiple processes; what IS testable hermetically:
the single-process degradation contract (initialize no-op, full batch
slice), the hybrid mesh layout math, and that ``global_batch_from_local``
feeds the standard train step identically to ``shard_batch`` on an
8-virtual-device mesh (the same subprocess strategy as test_multichip).
"""

import pytest

from cpu_mesh import run_cpu8 as _run_cpu8

from csm_tpu.parallel.distributed import initialize, process_batch_slice



def test_initialize_single_process_noop():
    pid, n = initialize()
    assert (pid, n) == (0, 1)


def test_process_batch_slice_single():
    # at process_count=1 every batch size divides and the slice is all rows
    assert process_batch_slice(8) == (0, 8)
    assert process_batch_slice(7) == (0, 7)


@pytest.mark.multichip
def test_global_batch_feed_matches_shard_batch():
    """global_batch_from_local == shard_batch on a (4, 2) mesh, and the
    hybrid mesh (single slice) == make_mesh for the train step."""
    out = _run_cpu8(
        """
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_default_matmul_precision", "highest")
from csm_tpu.models.config import tiny_test_args
from csm_tpu.models.csm import init_csm_params
from csm_tpu.parallel.distributed import global_batch_from_local, hybrid_mesh, process_batch_slice
from csm_tpu.parallel.sharding import shard_batch, shard_params
from csm_tpu.training.losses import Batch
from csm_tpu.training.optimizer import TrainState, make_optimizer
from csm_tpu.training.train_step import make_train_step

args = tiny_test_args()
K = args.audio_num_codebooks
params = init_csm_params(jax.random.key(3), args, jnp.float32)
rng = np.random.default_rng(0)
B, T = 8, 8
start, size = process_batch_slice(B)
assert (start, size) == (0, B)  # single process loads everything
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

mesh = hybrid_mesh(model_parallel=2, devices=jax.devices()[:8])
assert dict(mesh.shape) == {"data": 4, "model": 2}
sp = shard_params(params, mesh, fsdp=True)
tx = make_optimizer(params, learning_rate=1e-3)
step = make_train_step(args, tx, compute_dtype=jnp.float32)

g1 = global_batch_from_local(batch, mesh)
g2 = shard_batch(batch, mesh)
for k in g1._fields:
    np.testing.assert_array_equal(np.asarray(getattr(g1, k)), np.asarray(getattr(g2, k)))

st = TrainState(sp, jax.jit(tx.init)(sp), jnp.zeros((), jnp.int32))
st, m = step(st, jax.random.key(7), g1)
assert np.isfinite(float(m["loss"]))
print("distributed feed OK", float(m["loss"]))
"""
    )
    assert "distributed feed OK" in out
