"""Jitted train / eval steps for CSM.

The reference's hot loop is Python per batch — forward, backward, clip,
step (src/csm/training/trainer.py:252-287).  Here each optimizer step is
ONE compiled XLA program: loss (semantic + amortized acoustic), backward,
global-norm clip, per-component AdamW update — with the train state
donated so parameters update in place in HBM.

Multi-chip: callers place ``state``/``batch`` on a mesh
(csm_tpu/parallel/sharding.py) and the same jitted step runs SPMD —
gradient all-reduce over the ``data`` axis and tensor-parallel collectives
over ``model`` are inserted by XLA from the input shardings.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from csm_tpu.models.config import ModelArgs
from csm_tpu.training.losses import Batch, compute_loss
from csm_tpu.training.optimizer import TrainState


def make_train_step(
    args: ModelArgs,
    tx: optax.GradientTransformation,
    semantic_weight: float = 100.0,
    acoustic_weight: float = 1.0,
    amortization_ratio: int = 16,
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
    seq_mesh=None,
    pp_mesh=None,
    pp_microbatches: int = 1,
    grad_microbatches: int = 1,
    ring_layout: str = "auto",
) -> Callable:
    """Returns jitted ``step(state, key, batch) -> (state, metrics)``.

    ``seq_mesh`` — optional mesh with a ``seq`` axis for long-context
    sequence-parallel training (ring attention in the backbone; shard the
    batch's time dim over ``seq``).

    ``pp_mesh`` — optional mesh with a ``pipe`` axis for pipeline-parallel
    training (csm_tpu/parallel/pipeline.py; place params with
    ``shard_params_pp`` and the batch over ``data``).

    ``grad_microbatches`` — split the batch into M microbatches INSIDE the
    compiled step (``lax.scan``), accumulating gradients: peak activation
    memory drops ~M× at one extra grads-sized buffer.  This is the
    memory lever that fits 8B full-parameter training on 8×16 GiB devices
    (see __graft_entry__._compile_8b_fullsize); semantics match
    ``optax.MultiSteps`` (mean of per-microbatch gradients) without its
    persistent accumulator state.  Must divide the batch dim."""

    def loss_fn(params, key, batch):
        return compute_loss(
            params,
            args,
            key,
            batch,
            semantic_weight=semantic_weight,
            acoustic_weight=acoustic_weight,
            amortization_ratio=amortization_ratio,
            compute_dtype=compute_dtype,
            remat=remat,
            seq_mesh=seq_mesh,
            pp_mesh=pp_mesh,
            pp_microbatches=pp_microbatches,
            ring_layout=ring_layout,
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, key: jax.Array, batch: Batch):
        (_, metrics), grads = _accumulated_grads(
            loss_fn, state.params, key, batch, grad_microbatches
        )
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return step


def _accumulated_grads(loss_fn, params, key, batch, n_micro: int):
    """value_and_grad over the whole batch, or a compiled scan over
    ``n_micro`` microbatch slices accumulating (mean) grads and metrics.
    Count-style metrics (num_*) sum; the rest average."""
    if n_micro <= 1:
        return jax.value_and_grad(loss_fn, has_aux=True)(params, key, batch)

    B = batch.tokens.shape[0]
    if B % n_micro:
        raise ValueError(f"batch dim {B} not divisible by {n_micro} microbatches")
    micro = jax.tree.map(
        lambda x: x.reshape((n_micro, B // n_micro) + x.shape[1:]), batch
    )
    keys = jax.random.split(key, n_micro)

    def body(acc, x):
        k_i, b_i = x
        (_, m), g = jax.value_and_grad(loss_fn, has_aux=True)(params, k_i, b_i)
        g_acc, m_acc = acc
        g_acc = jax.tree.map(jnp.add, g_acc, g)
        m_acc = {k: m_acc[k] + m[k] for k in m_acc}
        return (g_acc, m_acc), None

    g0 = jax.tree.map(lambda p: jnp.zeros(p.shape, p.dtype), params)
    m_shapes = jax.eval_shape(
        lambda p, k, b: loss_fn(p, k, b)[1], params, keys[0],
        jax.tree.map(lambda x: x[0], micro),
    )
    m0 = {k: jnp.zeros(v.shape, v.dtype) for k, v in m_shapes.items()}
    (g_sum, m_sum), _ = jax.lax.scan(body, (g0, m0), (keys, micro))
    grads = jax.tree.map(lambda g: g / n_micro, g_sum)
    metrics = {
        k: (v if k.startswith("num_") else v / n_micro) for k, v in m_sum.items()
    }
    return (None, metrics), grads


def make_lora_train_step(
    args: ModelArgs,
    tx: optax.GradientTransformation,
    lora_scale: float,
    semantic_weight: float = 100.0,
    acoustic_weight: float = 1.0,
    amortization_ratio: int = 16,
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
    lora_dropout: float = 0.0,
    seq_mesh=None,
    pp_mesh=None,
    pp_microbatches: int = 1,
    ring_layout: str = "auto",
) -> Callable:
    """Jitted ``step(lora_state, base_params, key, batch)`` — differentiates
    ONLY the adapter tree; the frozen base rides along un-donated
    (reference: src/csm/training/lora_trainer.py:374-457)."""

    def loss_fn(lora, base_params, key, batch):
        return compute_loss(
            base_params,
            args,
            key,
            batch,
            semantic_weight=semantic_weight,
            acoustic_weight=acoustic_weight,
            amortization_ratio=amortization_ratio,
            compute_dtype=compute_dtype,
            remat=remat,
            lora=lora,
            lora_scale=lora_scale,
            lora_dropout=lora_dropout,
            seq_mesh=seq_mesh,
            pp_mesh=pp_mesh,
            pp_microbatches=pp_microbatches,
            ring_layout=ring_layout,
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, base_params, key: jax.Array, batch: Batch):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, base_params, key, batch
        )
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        lora = optax.apply_updates(state.params, updates)
        return TrainState(lora, opt_state, state.step + 1), metrics

    return step


def make_eval_step(
    args: ModelArgs,
    semantic_weight: float = 100.0,
    acoustic_weight: float = 1.0,
    amortization_ratio: int = 16,
    compute_dtype=jnp.bfloat16,
    seq_mesh=None,
    pp_mesh=None,
    pp_microbatches: int = 1,
    ring_layout: str = "auto",
) -> Callable:
    """Returns jitted ``eval_step(params, key, batch) -> metrics``
    (reference validation pass: src/csm/training/trainer.py:359-394).
    Mesh args mirror make_train_step so validation runs the SAME
    backbone program (pipelined / ring) as training."""

    @jax.jit
    def eval_step(params, key: jax.Array, batch: Batch):
        _, metrics = compute_loss(
            params,
            args,
            key,
            batch,
            semantic_weight=semantic_weight,
            acoustic_weight=acoustic_weight,
            amortization_ratio=amortization_ratio,
            compute_dtype=compute_dtype,
            seq_mesh=seq_mesh,
            pp_mesh=pp_mesh,
            pp_microbatches=pp_microbatches,
            ring_layout=ring_layout,
        )
        return metrics

    return eval_step
