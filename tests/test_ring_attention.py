"""Ring attention (sequence-parallel) correctness on the CPU mesh.

SURVEY.md §5.7 long-context extension: exact causal attention with the
sequence sharded over a ``seq`` mesh axis (csm_tpu/parallel/ring_attention).
Single-device ``gqa_attention`` is the oracle; the subprocess CPU mesh is
the same environment the driver's ``dryrun_multichip`` uses.
"""

import pytest

from cpu_mesh import run_cpu8 as _run_cpu8


@pytest.mark.multichip
def test_ring_attention_matches_single_device():
    """S=4096 causal + per-row PAD positions + (data, seq) combo mesh."""
    out = _run_cpu8(
        """
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_default_matmul_precision", "highest")
from csm_tpu.ops.attention import causal_mask_from_positions, gqa_attention
from csm_tpu.parallel.ring_attention import make_sp_mesh, sharded_ring_attention

def rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape), jnp.float32)

# --- long context: S=4096 over seq=8 ---
B, S, Hq, Hkv, D = 1, 4096, 4, 2, 64
q, k, v = rand((B, S, Hq, D), 0), rand((B, S, Hkv, D), 1), rand((B, S, Hkv, D), 2)
qpos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
kvpos = jnp.arange(S, dtype=jnp.int32)
ref = gqa_attention(q, k, v, causal_mask_from_positions(qpos, kvpos))
mesh = make_sp_mesh(jax.devices())
out = jax.jit(lambda *a: sharded_ring_attention(mesh, *a))(q, k, v, qpos, kvpos)
np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)
print("ring S=4096 OK")

# --- PAD positions, (data=2, seq=4) mesh ---
B, S = 2, 1024
PAD = 1 << 28
q, k, v = rand((B, S, Hq, D), 3), rand((B, S, Hkv, D), 4), rand((B, S, Hkv, D), 5)
lens = np.array([700, 1024])
pos = np.where(np.arange(S)[None] < lens[:, None], np.arange(S)[None], PAD)
pos = jnp.asarray(pos, jnp.int32)
ref = gqa_attention(q, k, v, causal_mask_from_positions(pos, pos))
mesh = make_sp_mesh(jax.devices(), seq_parallel=4)
out = jax.jit(lambda *a: sharded_ring_attention(mesh, *a))(q, k, v, pos, pos)
rows = np.arange(S)[None] < lens[:, None]
np.testing.assert_allclose(np.asarray(out)[rows], np.asarray(ref)[rows], atol=3e-5)
print("ring PAD rows OK")

# --- zigzag layout: balanced causal work, identical output ---
B, S = 1, 2048
q, k, v = rand((B, S, Hq, D), 6), rand((B, S, Hkv, D), 7), rand((B, S, Hkv, D), 8)
qpos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
kvpos = jnp.arange(S, dtype=jnp.int32)
ref = gqa_attention(q, k, v, causal_mask_from_positions(qpos, kvpos))
mesh = make_sp_mesh(jax.devices())
zz = jax.jit(lambda *a: sharded_ring_attention(mesh, *a, layout="zigzag"))(
    q, k, v, qpos, kvpos)
np.testing.assert_allclose(np.asarray(zz), np.asarray(ref), atol=3e-5)
print("ring zigzag OK")
"""
    )
    assert "ring S=4096 OK" in out and "ring PAD rows OK" in out
    assert "ring zigzag OK" in out


@pytest.mark.multichip
def test_seq_parallel_train_step_matches_single_device():
    """Long-context training integration: make_train_step(seq_mesh=...)
    runs the backbone with ring attention, batch time dim sharded over
    ``seq`` — same loss and updated params as the single-device step."""
    out = _run_cpu8(
        """
import dataclasses
import jax, jax.numpy as jnp, numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
jax.config.update("jax_default_matmul_precision", "highest")
from csm_tpu.models.config import tiny_test_args
from csm_tpu.models.csm import init_csm_params
from csm_tpu.parallel.ring_attention import make_sp_mesh
from csm_tpu.training.losses import Batch
from csm_tpu.training.optimizer import TrainState, init_train_state, make_optimizer
from csm_tpu.training.train_step import make_train_step

base = tiny_test_args()
args = dataclasses.replace(
    base,
    backbone_config=dataclasses.replace(base.backbone_config, max_seq_len=512),
    decoder_config=dataclasses.replace(base.decoder_config, max_seq_len=512),
)
K = args.audio_num_codebooks
params = init_csm_params(jax.random.key(3), args, jnp.float32)
rng = np.random.default_rng(0)
B, T = 2, 256
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

step1 = make_train_step(args, tx, compute_dtype=jnp.float32)
state1 = init_train_state(jax.tree.map(jnp.array, params), tx)
state1, m1 = step1(state1, jax.random.key(7), batch)

mesh = make_sp_mesh(jax.devices(), seq_parallel=4)  # (data=2, seq=4)
def put(x, *spec):
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))
sbatch = Batch(put(batch.tokens, "data", "seq", None),
               put(batch.tokens_mask, "data", "seq", None),
               put(batch.targets, "data", "seq", None),
               put(batch.target_mask, "data", "seq"))
# both ring layouts through the REAL train step: contiguous and the
# balanced zigzag (what ParallelConfig(ring_layout="auto") selects when
# T=256 divides by 2*seq=8) must equal the single-device step
for layout in ("contiguous", "zigzag"):
    stepS = make_train_step(args, tx, compute_dtype=jnp.float32,
                            seq_mesh=mesh, ring_layout=layout)
    # copy: the step donates its state, and device_put may alias params
    sp = jax.device_put(jax.tree.map(jnp.array, params),
                        NamedSharding(mesh, P()))
    stateS = TrainState(sp, jax.jit(tx.init)(sp), jnp.zeros((), jnp.int32))
    stateS, mS = stepS(stateS, jax.random.key(7), sbatch)
    np.testing.assert_allclose(float(m1["loss"]), float(mS["loss"]), rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(state1.params["backbone"]["wo"]),
        np.asarray(stateS.params["backbone"]["wo"]), atol=2e-5)
    print(f"seq-parallel train parity OK [{layout}]",
          float(m1["loss"]), float(mS["loss"]))
"""
    )
    assert "seq-parallel train parity OK [contiguous]" in out
    assert "seq-parallel train parity OK [zigzag]" in out


@pytest.mark.multichip
def test_ring_attention_gradients():
    """Reverse-mode through the ring (scan + ppermute) matches XLA autodiff."""
    out = _run_cpu8(
        """
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_default_matmul_precision", "highest")
from csm_tpu.ops.attention import causal_mask_from_positions, gqa_attention
from csm_tpu.parallel.ring_attention import make_sp_mesh, sharded_ring_attention

def rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape), jnp.float32)

B, S, Hq, Hkv, D = 1, 512, 4, 2, 32
q, k, v = rand((B, S, Hq, D), 0), rand((B, S, Hkv, D), 1), rand((B, S, Hkv, D), 2)
qpos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
kvpos = jnp.arange(S, dtype=jnp.int32)
mesh = make_sp_mesh(jax.devices())  # seq=8 (B=1 can't split a data axis)

def loss_ring(q, k, v):
    return (sharded_ring_attention(mesh, q, k, v, qpos, kvpos) ** 2).sum()

def loss_ref(q, k, v):
    m = causal_mask_from_positions(qpos, kvpos)
    return (gqa_attention(q, k, v, m) ** 2).sum()

g1 = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
g2 = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
for a, b in zip(g1, g2):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3)
print("ring gradients OK")
"""
    )
    assert "ring gradients OK" in out
