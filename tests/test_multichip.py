"""Multi-chip sharding validation (subprocess CPU mesh).

The TPU build's analogue of multi-node tests the reference lacks
(SURVEY.md §4): the SAME jitted train step must compile and run SPMD over
an 8-device (data, model) mesh with dp+tp+fsdp shardings.  Runs in a
subprocess with ``JAX_PLATFORMS=cpu`` + 8 virtual host devices — the
exact environment the driver uses for ``dryrun_multichip``.
"""

import pytest

from cpu_mesh import run_cpu8 as _run_cpu8


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


@pytest.mark.multichip
def test_sharded_decode_matches_single_device():
    """Sharded generate_audio_tokens == single-device (argmax decoding).

    data-only sharding must be EXACT (each row's math is unchanged);
    tensor-parallel reassociates matmul reductions, so TP asserts a high
    token-match rate instead.  VERDICT round-1 item #2."""
    out = _run_cpu8(
        """
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_default_matmul_precision", "highest")
from csm_tpu.models.config import tiny_test_args
from csm_tpu.models.csm import init_csm_params
from csm_tpu.models.generation import generate_audio_tokens
from csm_tpu.parallel.inference import shard_batch_dim, shard_inference_params
from csm_tpu.parallel.mesh import make_mesh

args = tiny_test_args()
K = args.audio_num_codebooks
params = init_csm_params(jax.random.key(0), args, jnp.float32)
rng = np.random.default_rng(0)
B, S, MF = 8, 16, 6
tokens = np.zeros((B, S, K + 1), np.int32)
mask = np.zeros((B, S, K + 1), bool)
lens = rng.integers(4, S, B).astype(np.int32)
for b in range(B):
    tokens[b, :lens[b], -1] = rng.integers(1, args.text_vocab_size, lens[b])
    mask[b, :lens[b], -1] = True

fn = jax.jit(lambda p, t, m, l: generate_audio_tokens(
    p, args, jax.random.key(7), t, m, l, max_frames=MF,
    temperature=1.0, topk=1, compute_dtype=jnp.float32))

ref = fn(params, jnp.asarray(tokens), jnp.asarray(mask), jnp.asarray(lens))
ref_frames, ref_n = np.asarray(ref.frames), np.asarray(ref.num_frames)

for mp, exact in ((1, True), (2, False)):
    mesh = make_mesh(jax.devices()[:8], model_parallel=mp)
    sp = shard_inference_params(params, mesh)
    st = shard_batch_dim(jnp.asarray(tokens), mesh)
    sm = shard_batch_dim(jnp.asarray(mask), mesh)
    sl = shard_batch_dim(jnp.asarray(lens), mesh)
    res = fn(sp, st, sm, sl)
    frames, n = np.asarray(res.frames), np.asarray(res.num_frames)
    if exact:
        np.testing.assert_array_equal(n, ref_n)
        np.testing.assert_array_equal(frames, ref_frames)
    else:
        match = float(np.mean(frames == ref_frames))
        assert match > 0.9, f"tp token match rate {match}"
print("sharded decode parity OK")
"""
    )
    assert "sharded decode parity OK" in out


@pytest.mark.multichip
def test_sharded_serving_matches_single_device():
    """BatchedServer on a data=4 mesh == unsharded server, per stream."""
    out = _run_cpu8(
        """
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_default_matmul_precision", "highest")
from csm_tpu.models.config import tiny_test_args
from csm_tpu.models.csm import init_csm_params
from csm_tpu.parallel.mesh import make_mesh
from csm_tpu.serving import BatchedServer, StreamRequest

args = tiny_test_args()
K = args.audio_num_codebooks
params = init_csm_params(jax.random.key(0), args, jnp.float32)
def reqs():
    rng = np.random.default_rng(3)
    out = []
    for rid in range(6):
        T = 5 + rid
        tokens = np.zeros((T, K + 1), np.int32)
        mask = np.zeros((T, K + 1), bool)
        tokens[:, -1] = rng.integers(1, args.text_vocab_size, T)
        mask[:, -1] = True
        out.append(StreamRequest(tokens, mask, max_frames=4, request_id=rid))
    return out
srv1 = BatchedServer(params, args, n_slots=4, max_seq_len=128,
                     temperature=1.0, topk=1, compute_dtype=jnp.float32,
                     chunk_size=2)
r1, _ = srv1.run(reqs())

mesh = make_mesh(jax.devices()[:4], model_parallel=1)
srv8 = BatchedServer(params, args, n_slots=4, max_seq_len=128,
                     temperature=1.0, topk=1, compute_dtype=jnp.float32,
                     chunk_size=2, mesh=mesh)
r8, _ = srv8.run(reqs())

by1 = {r.request_id: r.frames for r in r1}
by8 = {r.request_id: r.frames for r in r8}
assert set(by1) == set(by8) == set(range(6))
for rid in by1:
    np.testing.assert_array_equal(by1[rid], by8[rid])
print("sharded serving parity OK")

# int8 weights through the mesh path: quantized {w8, scale} leaves take
# the same TP specs (csm_tpu/parallel/inference.py); data-only sharding
# must stay exact
srv1q = BatchedServer(params, args, n_slots=4, max_seq_len=128,
                      temperature=1.0, topk=1, compute_dtype=jnp.float32,
                      chunk_size=2, weight_dtype="int8")
r1q, _ = srv1q.run(reqs())
srv8q = BatchedServer(params, args, n_slots=4, max_seq_len=128,
                      temperature=1.0, topk=1, compute_dtype=jnp.float32,
                      chunk_size=2, mesh=mesh, weight_dtype="int8")
r8q, _ = srv8q.run(reqs())
by1q = {r.request_id: r.frames for r in r1q}
by8q = {r.request_id: r.frames for r in r8q}
for rid in by1q:
    np.testing.assert_array_equal(by1q[rid], by8q[rid])
print("sharded int8 serving parity OK")
"""
    )
    assert "sharded serving parity OK" in out
    assert "sharded int8 serving parity OK" in out


@pytest.mark.multichip
def test_fullsize_1b_sharded_step_compiles():
    """FULL-SIZE CSM-1B sharded train step compiles on the 8-device mesh
    (VERDICT round-1 weak #4 — tiny-shape-only sharding evidence).  Also
    regression-guards the 2051-vocab indivisibility (fit_spec): before the
    fix, placing the real head shapes on a model>1 mesh raised outright."""
    out = _run_cpu8(
        "import jax, __graft_entry__ as g\n"
        "from csm_tpu.parallel.mesh import make_mesh\n"
        "g._compile_1b_fullsize(make_mesh(jax.devices()[:8], model_parallel=2))\n",
        extra_env={"CSM_DRYRUN_FULLSIZE": "1"},
    )
    assert "1B FULL-SIZE sharded step compiles" in out


@pytest.mark.multichip
def test_fullsize_8b_serving_decode_compiles():
    """FULL-SIZE 8B SERVING decode chunk compiles for a v5e:2x4 topology
    with the production TP/data shardings and fits per-device HBM —
    the serving counterpart of the 8B training fit proofs.  Uses the
    v5e compiler via jax.experimental.topologies (no TPU hardware)."""
    out = _run_cpu8(
        "import __graft_entry__ as g\n"
        "g._compile_8b_serving()\n",
    )
    assert "8B SERVING decode chunk compiles" in out
    assert "FITS" in out


@pytest.mark.multichip
def test_sharded_compacted_serving_matches_single_device():
    """Idle-slot compaction ON A MESH (VERDICT round-2 item #8): a
    mostly-idle 8-slot server over a data=2 mesh compacts its live slots
    into a right-sized decode program (capacity a multiple of the data
    axis, state sharding-constrained back onto the mesh) and still emits
    exactly the unsharded server's tokens."""
    out = _run_cpu8(
        """
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_default_matmul_precision", "highest")
from csm_tpu.models.config import tiny_test_args
from csm_tpu.models.csm import init_csm_params
from csm_tpu.parallel.mesh import make_mesh
from csm_tpu.serving import BatchedServer, StreamRequest

args = tiny_test_args()
K = args.audio_num_codebooks
params = init_csm_params(jax.random.key(0), args, jnp.float32)
def reqs():
    rng = np.random.default_rng(5)
    out = []
    for rid in range(2):
        T = 5 + rid
        tokens = np.zeros((T, K + 1), np.int32)
        mask = np.zeros((T, K + 1), bool)
        tokens[:, -1] = rng.integers(1, args.text_vocab_size, T)
        mask[:, -1] = True
        out.append(StreamRequest(tokens, mask, max_frames=6, request_id=rid))
    return out

kw = dict(n_slots=8, max_seq_len=128, temperature=1.0, topk=1,
          compute_dtype=jnp.float32, chunk_size=2)
srv1 = BatchedServer(params, args, **kw)
r1, _ = srv1.run(reqs())

mesh = make_mesh(jax.devices()[:2], model_parallel=1)  # data=2
srv2 = BatchedServer(params, args, mesh=mesh, **kw)
assert srv2._decode_capacity(1) == 2, srv2._decode_capacity(1)
assert srv2._decode_capacity(3) == 4
assert srv2._decode_capacity(5) == 8  # > n_slots//2: uncompacted
r2, _ = srv2.run(reqs())
assert srv2._compactors, "mesh compaction never engaged"

by1 = {r.request_id: r.frames for r in r1}
by2 = {r.request_id: r.frames for r in r2}
assert set(by1) == set(by2) == {0, 1}
for rid in by1:
    np.testing.assert_array_equal(by1[rid], by2[rid])
print("mesh compaction parity OK")
"""
    )
    assert "mesh compaction parity OK" in out


@pytest.mark.multichip
def test_sharded_prefix_serving_matches_single_device():
    """Shared-prefix admission on a data=2 mesh: prefix-cached
    requests produce the same tokens as the unsharded prefix server (and
    therefore as inlined context — tests/test_prefix_cache.py)."""
    out = _run_cpu8(
        """
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_default_matmul_precision", "highest")
from csm_tpu.models.config import tiny_test_args
from csm_tpu.models.csm import init_csm_params
from csm_tpu.parallel.mesh import make_mesh
from csm_tpu.serving import BatchedServer, StreamRequest

args = tiny_test_args()
K = args.audio_num_codebooks
params = init_csm_params(jax.random.key(0), args, jnp.float32)
rng = np.random.default_rng(5)
Tc = 20
ctx_t = np.zeros((Tc, K + 1), np.int32); ctx_m = np.zeros((Tc, K + 1), bool)
ctx_t[:16, :K] = rng.integers(1, args.audio_vocab_size, (16, K))
ctx_m[:16, :K] = True
ctx_t[16:, -1] = rng.integers(1, args.text_vocab_size, Tc - 16)
ctx_m[16:, -1] = True
def reqs():
    r2 = np.random.default_rng(7)
    out = []
    for rid in range(4):
        T = 5 + rid
        t = np.zeros((T, K + 1), np.int32); m = np.zeros((T, K + 1), bool)
        t[:, -1] = r2.integers(1, args.text_vocab_size, T); m[:, -1] = True
        out.append(StreamRequest(t, m, max_frames=4, request_id=rid,
                                 prefix="voice"))
    return out
kw = dict(n_slots=2, max_seq_len=256, temperature=1.0, topk=1,
          compute_dtype=jnp.float32, chunk_size=2)
srv1 = BatchedServer(params, args, **kw)
srv1.register_prefix("voice", ctx_t, ctx_m)
r1, _ = srv1.run(reqs())

mesh = make_mesh(jax.devices()[:2], model_parallel=1)  # data=2
srv8 = BatchedServer(params, args, mesh=mesh, **kw)
srv8.register_prefix("voice", ctx_t, ctx_m)
r8, _ = srv8.run(reqs())

by1 = {r.request_id: r.frames for r in r1}
by8 = {r.request_id: r.frames for r in r8}
assert set(by1) == set(by8) == set(range(4))
for rid in by1:
    np.testing.assert_array_equal(by1[rid], by8[rid])
print("PREFIX-MESH-OK")
"""
    )
    assert "PREFIX-MESH-OK" in out


@pytest.mark.multichip
def test_sharded_multi_lora_matches_single_device():
    """Multi-LoRA bank on a data=4 mesh: the bank replicates, per-slot
    ids shard over data, and mixed-adapter frames match the
    single-device bank server exactly (data-only sharding leaves each
    row's math unchanged; TP reassociates reductions — see
    test_sharded_decode_matches_single_device)."""
    out = _run_cpu8(
        """
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_default_matmul_precision", "highest")
from csm_tpu.models.config import tiny_test_args
from csm_tpu.models.csm import init_csm_params
from csm_tpu.parallel.mesh import make_mesh
from csm_tpu.serving import BatchedServer, StreamRequest
from csm_tpu.training.lora import LoRAConfig, init_lora_params

args = tiny_test_args()
K = args.audio_num_codebooks
params = init_csm_params(jax.random.key(0), args, jnp.float32)
cfg1 = LoRAConfig(r=4)
cfg2 = LoRAConfig(r=2, alpha=8.0,
                  target_modules=("q_proj", "k_proj", "v_proj"))
l1 = jax.tree.map(lambda x: x + 0.02,
                  init_lora_params(jax.random.key(1), args, cfg1))
l2 = jax.tree.map(lambda x: x + 0.03,
                  init_lora_params(jax.random.key(2), args, cfg2))
adapters = {"alice": (l1, cfg1, None), "bob": (l2, cfg2, None)}

def reqs():
    rng = np.random.default_rng(9)
    out = []
    for rid, ad in enumerate([None, "alice", "bob", "alice"]):
        T = 5 + rid
        t = np.zeros((T, K + 1), np.int32); m = np.zeros((T, K + 1), bool)
        t[:, -1] = rng.integers(1, args.text_vocab_size, T); m[:, -1] = True
        out.append(StreamRequest(t, m, max_frames=4, request_id=rid,
                                 adapter=ad))
    return out

kw = dict(n_slots=4, max_seq_len=96, temperature=1.0, topk=1,
          compute_dtype=jnp.float32, chunk_size=2)
srv1 = BatchedServer(params, args, adapters=dict(adapters), **kw)
r1, _ = srv1.run(reqs())

mesh = make_mesh(jax.devices()[:4], model_parallel=1)  # data=4
srv8 = BatchedServer(params, args, adapters=dict(adapters), mesh=mesh, **kw)
r8, _ = srv8.run(reqs())

by1 = {r.request_id: r.frames for r in r1}
by8 = {r.request_id: r.frames for r in r8}
assert set(by1) == set(by8) == set(range(4))
for rid in by1:
    np.testing.assert_array_equal(by1[rid], by8[rid])
print("MULTI-LORA-MESH-OK")
"""
    )
    assert "MULTI-LORA-MESH-OK" in out


@pytest.mark.multichip
def test_sharded_pipelined_serving_matches_single_device():
    """pipelined=True on a data=4 mesh: the chunk-in-flight bookkeeping
    (dispatch N+1 before collecting N) must be invisible per stream —
    argmax streams equal the synchronous UNSHARDED server's under churn
    (6 requests over 4 slots force re-admission)."""
    out = _run_cpu8(
        """
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_default_matmul_precision", "highest")
from csm_tpu.models.config import tiny_test_args
from csm_tpu.models.csm import init_csm_params
from csm_tpu.parallel.mesh import make_mesh
from csm_tpu.serving import BatchedServer, StreamRequest

args = tiny_test_args()
K = args.audio_num_codebooks
params = init_csm_params(jax.random.key(0), args, jnp.float32)
def reqs():
    rng = np.random.default_rng(3)
    out = []
    for rid in range(6):
        T = 5 + rid
        tokens = np.zeros((T, K + 1), np.int32)
        mask = np.zeros((T, K + 1), bool)
        tokens[:, -1] = rng.integers(1, args.text_vocab_size, T)
        mask[:, -1] = True
        out.append(StreamRequest(tokens, mask, max_frames=3 + rid % 3,
                                 request_id=rid))
    return out
kw = dict(n_slots=4, max_seq_len=128, temperature=1.0, topk=1,
          compute_dtype=jnp.float32, chunk_size=2)
srv1 = BatchedServer(params, args, **kw)
r1, _ = srv1.run(reqs())

mesh = make_mesh(jax.devices()[:4], model_parallel=1)
srv8 = BatchedServer(params, args, mesh=mesh, pipelined=True, **kw)
r8, _ = srv8.run(reqs())
assert srv8._inflight is None and not srv8.active.any()

by1 = {r.request_id: r.frames for r in r1}
by8 = {r.request_id: r.frames for r in r8}
assert set(by1) == set(by8) == set(range(6))
for rid in by1:
    np.testing.assert_array_equal(by1[rid], by8[rid])
print("PIPELINED-MESH-OK")
"""
    )
    assert "PIPELINED-MESH-OK" in out
