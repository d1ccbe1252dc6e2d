"""Async checkpointing + batch prefetch.

The reference blocks its training loop on every ``torch.save``
(src/csm/training/trainer.py:289-355); the TPU build writes checkpoints
through orbax's async checkpointer and keeps stepping.  These tests pin
the safety contract: restores see only fully-committed checkpoints, the
``latest`` pointer never dangles, and prefetching changes neither batch
order nor content.
"""

import json
import os
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csm_tpu.models.config import tiny_test_args
from csm_tpu.models.csm import init_csm_params
from csm_tpu.training import checkpoint as ckpt
from csm_tpu.training.dataset_utils import prefetch_batches
from csm_tpu.training.optimizer import TrainState
from csm_tpu.training.trainer import CSMTrainer
from test_training import make_batch


def _tiny_state(seed=0):
    params = {"w": jnp.arange(16, dtype=jnp.float32) + seed,
              "b": jnp.ones((4, 4), jnp.bfloat16) * seed}
    return TrainState(params=params, opt_state=None,
                      step=jnp.asarray(seed, jnp.int32))


def test_async_writer_roundtrip(tmp_path):
    d = str(tmp_path / "ck")
    args = tiny_test_args()
    with ckpt.AsyncCheckpointWriter() as w:
        w.save(d, "step_1", _tiny_state(1), args,
               epoch=0, global_step=1, loss=2.5)
        w.wait()
        state, meta = ckpt.load_checkpoint(os.path.join(d, "step_1"))
    assert meta["global_step"] == 1 and meta["loss"] == 2.5
    assert int(state.step) == 1
    np.testing.assert_array_equal(np.asarray(state.params["w"]),
                                  np.arange(16, dtype=np.float32) + 1)
    assert ckpt.latest_checkpoint(d).endswith("step_1")


def test_async_writer_one_in_flight_and_latest_ordering(tmp_path):
    d = str(tmp_path / "ck")
    args = tiny_test_args()
    with ckpt.AsyncCheckpointWriter() as w:
        # back-to-back saves: the second joins the first; latest ends at
        # the newest fully-committed checkpoint
        w.save(d, "step_1", _tiny_state(1), args, global_step=1)
        w.save(d, "step_2", _tiny_state(2), args, global_step=2)
        w.wait()
    latest = ckpt.latest_checkpoint(d)
    assert latest.endswith("step_2")
    state, meta = ckpt.load_checkpoint(latest)
    assert meta["global_step"] == 2
    np.testing.assert_array_equal(np.asarray(state.params["w"]),
                                  np.arange(16, dtype=np.float32) + 2)
    # both checkpoints restore (the first was not clobbered by the join)
    s1, m1 = ckpt.load_checkpoint(os.path.join(d, "step_1"))
    assert m1["global_step"] == 1


def test_async_save_snapshots_before_mutation(tmp_path):
    # the checkpoint must capture the values AT save() time even if the
    # arrays' buffers are donated/overwritten immediately after (orbax
    # copies device->host before save() returns)
    d = str(tmp_path / "ck")
    args = tiny_test_args()
    x = jnp.arange(1024, dtype=jnp.float32)
    state = TrainState(params={"w": x}, opt_state=None,
                       step=jnp.asarray(7, jnp.int32))
    with ckpt.AsyncCheckpointWriter() as w:
        w.save(d, "snap", state, args)
        # overwrite with a donated-buffer program while the save is in
        # flight
        y = jax.jit(lambda a: a * 0 - 1, donate_argnums=0)(x)
        jax.block_until_ready(y)
        w.wait()
    restored, _ = ckpt.load_checkpoint(os.path.join(d, "snap"))
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.arange(1024, dtype=np.float32))


def test_trainer_async_checkpointing_resume(tmp_path):
    args = tiny_test_args()
    params = init_csm_params(jax.random.key(0), args, jnp.float32)
    out = str(tmp_path / "run")
    tr = CSMTrainer(
        output_dir=out, args=args, params=jax.tree.map(jnp.array, params),
        learning_rate=1e-3, compute_dtype=jnp.float32, remat=False,
        async_checkpointing=True,
    )
    data = [make_batch(args, B=2, T=8, seed=i) for i in range(3)]
    loss = tr.train(data, batch_size=2, epochs=1, save_every=2)
    assert np.isfinite(loss)
    # train() returns only after "final" is committed
    ckpt_dir = os.path.join(out, "checkpoints")
    assert os.path.isdir(os.path.join(ckpt_dir, "final"))
    assert os.path.exists(os.path.join(ckpt_dir, "final", "meta.json"))

    tr2 = CSMTrainer(
        output_dir=out, args=args, params=jax.tree.map(jnp.array, params),
        learning_rate=1e-3, compute_dtype=jnp.float32, remat=False,
    )
    tr2.prepare_optimizer()
    tr2.load_checkpoint("latest")
    assert tr2.global_step == 3
    # the async-trained params match the restored ones
    np.testing.assert_allclose(
        np.asarray(tr.state.params["backbone"]["wq"]),
        np.asarray(tr2.state.params["backbone"]["wq"]),
    )


# ---- prefetch_batches ----


def test_prefetch_preserves_order_and_content():
    src = [np.full((2, 3), i) for i in range(20)]
    out = list(prefetch_batches(iter(src), depth=3))
    assert len(out) == 20
    for i, b in enumerate(out):
        np.testing.assert_array_equal(b, src[i])


def test_prefetch_depth_zero_passthrough():
    src = [1, 2, 3]
    assert list(prefetch_batches(iter(src), depth=0)) == src


def test_prefetch_propagates_source_exception():
    def bad():
        yield 1
        raise RuntimeError("collate failed")

    it = prefetch_batches(bad(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="collate failed"):
        list(it)


def test_prefetch_early_abandon_releases_feeder():
    started = threading.active_count()

    def slow():
        for i in range(10**6):
            yield i

    it = prefetch_batches(slow(), depth=2)
    assert next(it) == 0
    it.close()  # consumer walks away mid-stream
    deadline = time.time() + 5.0
    while threading.active_count() > started and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= started, "feeder thread leaked"


def test_prefetch_overlaps_slow_source():
    # with depth=2 a slow producer and slow consumer overlap: total time
    # approaches max(produce, consume), not the sum
    def src(n=8, dt=0.03):
        for i in range(n):
            time.sleep(dt)
            yield i

    t0 = time.time()
    for _ in prefetch_batches(src(), depth=2):
        time.sleep(0.03)
    overlapped = time.time() - t0
    t0 = time.time()
    for _ in src():
        time.sleep(0.03)
    serial = time.time() - t0
    # generous margin: the box is 1-core and timers are coarse; the
    # overlap must still beat serial by a clear fraction
    assert overlapped < serial * 0.85, (overlapped, serial)
