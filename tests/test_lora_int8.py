"""int8-base LoRA fine-tuning (QLoRA-style memory mode).

The frozen base transformer stacks are stored int8 with per-out-channel
scales (csm_tpu/utils/quantize.py) and dequantized inside the matmul
load (csm_tpu/models/llama.py); only the float adapters train.  This is
the single-chip 8B fine-tuning lever (see
__graft_entry__._compile_8b_int8_lora for the compiler-level memory
proof); reference LoRA semantics per src/csm/training/lora_trainer.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csm_tpu.models.config import tiny_test_args
from csm_tpu.models.csm import init_csm_params
from csm_tpu.training.lora import LoRAConfig, init_lora_params, merge_lora
from csm_tpu.training.losses import compute_loss
from csm_tpu.training.optimizer import TrainState, make_lora_optimizer
from csm_tpu.training.train_step import make_lora_train_step
from csm_tpu.training.trainer import CSMLoRATrainer
from csm_tpu.utils.quantize import (
    dequantize_weight,
    is_quantized,
    quantize_csm_params,
)
from test_training import make_batch


@pytest.fixture(scope="module")
def tiny():
    args = tiny_test_args()
    params = init_csm_params(jax.random.key(0), args, jnp.float32)
    return args, params


def test_int8_base_loss_matches_dequantized(tiny):
    """(x @ w8)·scale == x @ (w8·scale) up to float association: the
    quantized-base loss must match the loss on the DEQUANTIZED copy of
    the same base (not the original float base — quantization error is
    real; the dequantized tree isolates the compute path)."""
    args, params = tiny
    q = quantize_csm_params(params)
    deq = jax.tree.map(
        lambda w: dequantize_weight(w, jnp.float32) if is_quantized(w) else w,
        q, is_leaf=is_quantized,
    )
    lcfg = LoRAConfig(r=4)
    lora = init_lora_params(jax.random.key(1), args, lcfg)
    # nonzero B so the adapter path contributes
    lora = jax.tree.map(lambda x: x + 0.01, lora)
    batch = make_batch(args, B=2, T=8, seed=0)
    kw = dict(lora=lora, lora_scale=lcfg.scaling, compute_dtype=jnp.float32)
    l_q, _ = compute_loss(q, args, jax.random.key(2), batch, **kw)
    l_d, _ = compute_loss(deq, args, jax.random.key(2), batch, **kw)
    np.testing.assert_allclose(float(l_q), float(l_d), rtol=1e-5)


def test_int8_base_training_reduces_loss(tiny):
    args, params = tiny
    base = quantize_csm_params(params)
    lcfg = LoRAConfig(r=4)
    lora = init_lora_params(jax.random.key(1), args, lcfg)
    tx = make_lora_optimizer(learning_rate=5e-3)
    step = make_lora_train_step(
        args, tx, lcfg.scaling, compute_dtype=jnp.float32
    )
    state = TrainState(lora, tx.init(lora), jnp.zeros((), jnp.int32))
    batch = make_batch(args, B=2, T=8, seed=0)
    w8_before = np.asarray(base["backbone"]["wq"]["w8"]).copy()

    losses = []
    for i in range(6):
        state, m = step(state, base, jax.random.key(10 + i), batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    # adapters moved, frozen int8 base untouched
    assert float(jnp.abs(state.params["backbone"]["wq"]["b"]).max()) > 0
    np.testing.assert_array_equal(
        np.asarray(base["backbone"]["wq"]["w8"]), w8_before
    )


def test_merge_lora_dequantizes_base(tiny):
    args, params = tiny
    q = quantize_csm_params(params)
    lcfg = LoRAConfig(r=4)
    lora = init_lora_params(jax.random.key(1), args, lcfg)
    lora = jax.tree.map(lambda x: x + 0.05, lora)
    merged = merge_lora(q, lora, lcfg)
    wq = merged["backbone"]["wq"]
    assert not is_quantized(wq), "merge must export a float tree"
    expect = dequantize_weight(q["backbone"]["wq"], jnp.bfloat16) + (
        jnp.einsum(
            "lir,lro->lio", lora["backbone"]["wq"]["a"],
            lora["backbone"]["wq"]["b"],
        ) * lcfg.scaling
    ).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(wq, np.float32), np.asarray(expect, np.float32),
        atol=1e-6,
    )
    # untargeted projections keep the quantized layout (still frozen)
    assert is_quantized(merged["backbone"]["w1"])


def test_trainer_int8_base_end_to_end(tiny, tmp_path):
    args, params = tiny
    tr = CSMLoRATrainer(
        output_dir=str(tmp_path / "run"), args=args, params=params,
        learning_rate=5e-3, lora_r=4, int8_base=True,
        compute_dtype=jnp.float32, remat=False,
    )
    assert is_quantized(tr.params["backbone"]["wq"])
    data = [make_batch(args, B=2, T=8, seed=i) for i in range(2)]
    loss = tr.train(data, val_dataset=data[:1], batch_size=2, epochs=1,
                    val_every=1, save_every=10**9)
    assert np.isfinite(loss)
    paths = tr.save_model(str(tmp_path / "adapter"), save_mode="both")
    assert len(paths) == 2
    from csm_tpu.training.checkpoint import load_params

    merged, margs = load_params(str(tmp_path / "adapter_full"))
    assert margs == args
    assert not is_quantized(merged["backbone"]["wq"])


def test_multi_speaker_shares_one_quantized_base(tiny, tmp_path):
    """Multi-speaker + int8_base: ALL speaker trainers must reference the
    SAME quantized base arrays (quantize once, not once per speaker)."""
    from csm_tpu.training.multi_speaker import MultiSpeakerLoRATrainer

    args, params = tiny
    ms = MultiSpeakerLoRATrainer(
        speaker_ids=[0, 1], output_dir=str(tmp_path / "ms"),
        args=args, params=params, lora_r=2, int8_base=True,
        compute_dtype=jnp.float32, remat=False, learning_rate=5e-3,
    )
    t0, t1 = ms.trainers[0], ms.trainers[1]
    assert is_quantized(t0.params["backbone"]["wq"])
    assert t0.params["backbone"]["wq"]["w8"] is t1.params["backbone"]["wq"]["w8"]
    data = {0: [make_batch(args, B=1, T=8, seed=0)],
            1: [make_batch(args, B=1, T=8, seed=1)]}
    losses = ms.train(data, epochs=1, batch_size=1, save_every=10**9)
    assert all(np.isfinite(v) for v in losses.values())


def test_int8_base_rejects_model_sharding(tiny, tmp_path):
    args, params = tiny
    from csm_tpu.parallel.mesh import ParallelConfig

    with pytest.raises(ValueError, match="int8_base"):
        CSMLoRATrainer(
            output_dir=str(tmp_path), args=args, params=params,
            int8_base=True, parallel=ParallelConfig(model_parallel=2),
            compute_dtype=jnp.float32, remat=False,
        )


@pytest.mark.multichip
def test_int8_base_seq_parallel(tmp_path):
    """The supported-layout claim (single-device / data / seq): int8-base
    LoRA under ParallelConfig(seq_parallel) — ring attention over the
    seq axis with the quantized base replicated — trains to the same
    loss as the single-device int8-base trainer."""
    from cpu_mesh import run_cpu8

    out = run_cpu8(
        f"""
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_default_matmul_precision", "highest")
import sys; sys.path.insert(0, "tests")
from csm_tpu.models.config import tiny_test_args
from csm_tpu.models.csm import init_csm_params
from csm_tpu.parallel.mesh import ParallelConfig
from csm_tpu.training.trainer import CSMLoRATrainer
from test_training import make_batch

args = tiny_test_args()
params = init_csm_params(jax.random.key(0), args, jnp.float32)
data = [make_batch(args, B=8, T=8, seed=i) for i in range(2)]

def run(tr):
    return tr.train(list(data), batch_size=8, epochs=1,
                    val_every=1000, save_every=1000)

base = CSMLoRATrainer(output_dir={str(tmp_path / 'a')!r}, args=args,
                      params=params, lora_r=4, int8_base=True,
                      learning_rate=1e-3, compute_dtype=jnp.float32,
                      remat=False)
l1 = run(base)
sp = CSMLoRATrainer(output_dir={str(tmp_path / 'b')!r}, args=args,
                    params=params, lora_r=4, int8_base=True,
                    learning_rate=1e-3, compute_dtype=jnp.float32,
                    remat=False, parallel=ParallelConfig(seq_parallel=2))
l2 = run(sp)
assert dict(sp.mesh.shape) == {{"data": 4, "seq": 2}}
np.testing.assert_allclose(l1, l2, rtol=2e-4)
print("int8-base seq parity OK", l1, l2)
"""
    )
    assert "int8-base seq parity OK" in out
