"""A/B: per-step metrics fetch vs the trainer's lag-by-one drain.

The trainer dispatches step N+1 before fetching step N's scalars
(csm_tpu/training/trainer.py `train` loop), so the host's metrics
round-trip — expensive on a tunneled rig — overlaps device compute
instead of serializing against it.  This measures the same LoRA train
step (CSM-1B, B=2, S=2048, bf16 base, no remat) both ways, interleaved.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
from csm_tpu.models.config import csm_1b_args
from csm_tpu.models.csm import init_csm_params
from csm_tpu.training import lora as lora_mod
from csm_tpu.training.benchmarks import make_mock_batch
from csm_tpu.training.optimizer import init_train_state, make_lora_optimizer
from csm_tpu.training.train_step import make_lora_train_step
from csm_tpu.utils.transport import warm_transport

def log(*a): print(*a, file=sys.stderr, flush=True)

args = csm_1b_args()
B, T, steps = 2, 2048, 10
base = jax.jit(lambda k: init_csm_params(k, args, jnp.bfloat16))(jax.random.key(0))
lcfg = lora_mod.LoRAConfig(r=8)
lora0 = lora_mod.init_lora_params(jax.random.key(1), args, lcfg)
tx = make_lora_optimizer(learning_rate=1e-4)
step = make_lora_train_step(args, tx, lcfg.scaling,
                            compute_dtype=jnp.bfloat16, remat=False)
state = init_train_state(jax.tree.map(jnp.array, lora0), tx)
batch = make_mock_batch(args, B, T)

state, m = step(state, base, jax.random.key(0), batch)
float(m["loss"])  # compile + completion
warm_transport()

def run(lagged: bool):
    # fresh state per run: the jitted step DONATES its state argument,
    # so a previous run's input buffers are dead
    s = init_train_state(jax.tree.map(jnp.array, lora0), tx)
    jax.block_until_ready(s.params)
    pending = None
    t0 = time.time()
    for i in range(steps):
        s, m = step(s, base, jax.random.key(i + 1), batch)
        if lagged:
            if pending is not None:
                _ = float(jax.device_get(pending["loss"]))
            pending = m
        else:
            _ = float(m["loss"])  # serializing per-step fetch
    if pending is not None:
        _ = float(jax.device_get(pending["loss"]))
    jax.block_until_ready(s.params if hasattr(s, "params") else s)
    return (time.time() - t0) / steps

for r in range(3):
    sync = run(lagged=False)
    lag = run(lagged=True)
    log(f"round {r}: per-step fetch {sync*1e3:.1f} ms/step  "
        f"lag-1 drain {lag*1e3:.1f} ms/step  ({sync/lag-1:+.1%})")
