"""Trainer-level parallelism (ParallelConfig → mesh placement) on the
8-virtual-device CPU mesh, subprocess-hermetic like test_multichip.py.

The same `CSMTrainer.train()` host loop must produce the same losses when
the train state is sharded (TP+FSDP or pipeline) as on a single device —
the mesh is an implementation detail behind ParallelConfig.
"""

import pytest

from cpu_mesh import run_cpu8 as _run_cpu8



_COMMON = """
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_default_matmul_precision", "highest")
import sys; sys.path.insert(0, "tests")
from csm_tpu.models.config import tiny_test_args
from csm_tpu.models.csm import init_csm_params
from csm_tpu.parallel.mesh import ParallelConfig
from csm_tpu.training.trainer import CSMTrainer, CSMLoRATrainer
from test_training import make_batch

args = tiny_test_args()
params = init_csm_params(jax.random.key(0), args, jnp.float32)
data = [make_batch(args, B=8, T=8, seed=i) for i in range(3)]

def run(trainer):
    loss = trainer.train(list(data), batch_size=8, epochs=1,
                         val_every=1000, save_every=1000)
    return loss
"""


@pytest.mark.multichip
def test_trainer_tp_fsdp_matches_single_device(tmp_path):
    out = _run_cpu8(
        _COMMON
        + f"""
base = CSMTrainer(output_dir={str(tmp_path / 'a')!r}, args=args,
                  params=jax.tree.map(jnp.array, params),
                  learning_rate=1e-3, compute_dtype=jnp.float32, remat=False)
l1 = run(base)

tp = CSMTrainer(output_dir={str(tmp_path / 'b')!r}, args=args,
                params=jax.tree.map(jnp.array, params),
                learning_rate=1e-3, compute_dtype=jnp.float32, remat=False,
                parallel=ParallelConfig(model_parallel=2, fsdp=True))
l2 = run(tp)
assert tp.mesh is not None and dict(tp.mesh.shape) == {{"data": 4, "model": 2}}
np.testing.assert_allclose(l1, l2, rtol=2e-4)
print("trainer tp+fsdp parity OK", l1, l2)
"""
    )
    assert "trainer tp+fsdp parity OK" in out


@pytest.mark.multichip
def test_trainer_pipeline_matches_single_device(tmp_path):
    out = _run_cpu8(
        _COMMON
        + f"""
base = CSMTrainer(output_dir={str(tmp_path / 'a')!r}, args=args,
                  params=jax.tree.map(jnp.array, params),
                  learning_rate=1e-3, compute_dtype=jnp.float32, remat=False)
l1 = run(base)

pp = CSMTrainer(output_dir={str(tmp_path / 'b')!r}, args=args,
                params=jax.tree.map(jnp.array, params),
                learning_rate=1e-3, compute_dtype=jnp.float32, remat=False,
                parallel=ParallelConfig(pipeline_parallel=2, pp_microbatches=2))
l2 = run(pp)
assert dict(pp.mesh.shape) == {{"data": 4, "pipe": 2}}
np.testing.assert_allclose(l1, l2, rtol=2e-4)
print("trainer pipeline parity OK", l1, l2)
"""
    )
    assert "trainer pipeline parity OK" in out


@pytest.mark.multichip
def test_lora_trainer_pipeline_runs(tmp_path):
    out = _run_cpu8(
        _COMMON
        + f"""
base = CSMLoRATrainer(output_dir={str(tmp_path / 'a')!r}, args=args,
                      params=jax.tree.map(jnp.array, params),
                      learning_rate=1e-3, compute_dtype=jnp.float32,
                      remat=False, lora_r=4)
l1 = run(base)
pp = CSMLoRATrainer(output_dir={str(tmp_path / 'b')!r}, args=args,
                    params=jax.tree.map(jnp.array, params),
                    learning_rate=1e-3, compute_dtype=jnp.float32,
                    remat=False, lora_r=4,
                    parallel=ParallelConfig(pipeline_parallel=2,
                                            pp_microbatches=2))
l2 = run(pp)
np.testing.assert_allclose(l1, l2, rtol=2e-4)
print("lora trainer pipeline parity OK", l1, l2)
"""
    )
    assert "lora trainer pipeline parity OK" in out


def test_parallel_config_validation():
    from csm_tpu.parallel.mesh import ParallelConfig

    assert not ParallelConfig().enabled
    assert ParallelConfig(fsdp=True).enabled
    with pytest.raises(ValueError):
        ParallelConfig(pipeline_parallel=2, model_parallel=2).build_mesh()


def test_fit_spec_replicates_indivisible_dims():
    """The 2051 audio vocab (reference contract) divides NO mesh axis —
    vocab-sharded heads must degrade to replication on that dim while
    every divisible dim stays sharded (the full-size TP bug this guards:
    device_put rejects indivisible NamedShardings outright)."""
    from jax.sharding import AbstractMesh, PartitionSpec as P

    from csm_tpu.parallel.sharding import fit_spec

    mesh = AbstractMesh((4, 2), ("data", "model"))
    # audio_head: (31, 1024, 2051) — vocab dim replicates, rest keeps
    assert fit_spec((31, 1024, 2051), P(None, "data", "model"), mesh) == P(
        None, "data", None
    )
    # codebook0_head: (2048, 2051)
    assert fit_spec((2048, 2051), P("data", "model"), mesh) == P("data", None)
    # divisible dims untouched
    assert fit_spec((16, 2048, 2048), P(None, "data", "model"), mesh) == P(
        None, "data", "model"
    )
    # tuple axes: product must divide
    assert fit_spec((8,), P(("data", "model"),), mesh) == P(("data", "model"))
    assert fit_spec((4,), P(("data", "model"),), mesh) == P(None)
    # spec longer than rank (scalar-ish leaves) tolerated
    assert fit_spec((), P(), mesh) == P()


@pytest.mark.multichip
def test_sharded_resume_restores_mesh_placement(tmp_path):
    """Checkpoint resume on a mesh: arrays must restore INTO the prepared
    state's NamedShardings (not host-local), and training must continue
    with the restored counters.  Guards the resume-template path in
    CSMTrainer.load_checkpoint."""
    out = _run_cpu8(
        _COMMON
        + f"""
from jax.sharding import NamedSharding

tp = CSMTrainer(output_dir={str(tmp_path / 'a')!r}, args=args,
                params=jax.tree.map(jnp.array, params),
                learning_rate=1e-3, compute_dtype=jnp.float32, remat=False,
                parallel=ParallelConfig(model_parallel=2, fsdp=True))
l1 = run(tp)
tp.save_checkpoint("final")

res = CSMTrainer(output_dir={str(tmp_path / 'a')!r}, args=args,
                 params=jax.tree.map(jnp.array, params),
                 learning_rate=1e-3, compute_dtype=jnp.float32, remat=False,
                 parallel=ParallelConfig(model_parallel=2, fsdp=True))
res.prepare_optimizer()
want = jax.tree.map(lambda x: x.sharding, res.state.params)
res.load_checkpoint("latest")
got = jax.tree.map(lambda x: x.sharding, res.state.params)
flat_w, _ = jax.tree.flatten(want)
flat_g, _ = jax.tree.flatten(got)
assert all(isinstance(s, NamedSharding) for s in flat_g)
assert flat_w == flat_g, "restore changed shardings"
assert res.global_step == 3
l2 = res.train(list(data), batch_size=8, epochs=1, val_every=1000,
               save_every=1000)
assert np.isfinite(l2)
print("sharded resume OK", l1, l2)
"""
    )
    assert "sharded resume OK" in out


def test_load_checkpoint_filters_template_to_contents(tmp_path):
    """A params-only checkpoint must restore into a params+opt_state
    template by dropping the absent opt_state key (not raising)."""
    import jax
    import jax.numpy as jnp

    from csm_tpu.models.config import tiny_test_args
    from csm_tpu.models.csm import init_csm_params
    from csm_tpu.training import checkpoint as ckpt
    from csm_tpu.training.optimizer import TrainState

    args = tiny_test_args()
    params = init_csm_params(jax.random.key(0), args, jnp.float32)
    state = TrainState(params=params, opt_state=None, step=jnp.int32(0))
    path = ckpt.save_checkpoint(str(tmp_path / "ck"), "only_params", state, args)

    template = {
        "params": jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
        ),
        "opt_state": {"m": jax.ShapeDtypeStruct((4,), jnp.float32)},
    }
    restored, meta = ckpt.load_checkpoint(path, template=template)
    assert restored.opt_state is None
    assert jax.tree.structure(restored.params) == jax.tree.structure(params)


@pytest.mark.multichip
def test_trainer_seq_parallel_matches_single_device(tmp_path):
    """ParallelConfig(seq_parallel): the backbone runs ring attention with
    the batch's time dim sharded over ``seq`` — same losses as local."""
    out = _run_cpu8(
        _COMMON
        + f"""
base = CSMTrainer(output_dir={str(tmp_path / 'a')!r}, args=args,
                  params=jax.tree.map(jnp.array, params),
                  learning_rate=1e-3, compute_dtype=jnp.float32, remat=False)
l1 = run(base)

sp = CSMTrainer(output_dir={str(tmp_path / 'b')!r}, args=args,
                params=jax.tree.map(jnp.array, params),
                learning_rate=1e-3, compute_dtype=jnp.float32, remat=False,
                parallel=ParallelConfig(seq_parallel=2))
l2 = run(sp)
assert dict(sp.mesh.shape) == {{"data": 4, "seq": 2}}
np.testing.assert_allclose(l1, l2, rtol=2e-4)
print("trainer seq parity OK", l1, l2)
"""
    )
    assert "trainer seq parity OK" in out
