"""Training stack tests: loss semantics, train step, sharded parity.

Mirrors the reference's training test strategy (SURVEY.md §4 —
src/csm/training/test_training.py, test_mlx_training.py) plus what the
reference lacks: the SAME jitted step on a 1-device and an 8-device mesh
must agree (multi-chip emulation on the CPU mesh, conftest.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csm_tpu.models.config import tiny_test_args
from csm_tpu.models.csm import init_csm_params
from csm_tpu.training.losses import Batch, compute_loss, masked_cross_entropy
from csm_tpu.training.optimizer import (
    TrainState,
    component_labels,
    init_train_state,
    make_optimizer,
)
from csm_tpu.training.train_step import make_eval_step, make_train_step


def make_batch(args, B=2, T=12, seed=0):
    """Half text prompt, half audio frames; targets = next-position frames."""
    rng = np.random.default_rng(seed)
    K = args.audio_num_codebooks
    tokens = np.zeros((B, T, K + 1), np.int32)
    tokens_mask = np.zeros((B, T, K + 1), bool)
    targets = np.zeros((B, T, K), np.int32)
    target_mask = np.zeros((B, T), bool)

    t_text = T // 2
    tokens[:, :t_text, -1] = rng.integers(1, args.text_vocab_size, (B, t_text))
    tokens_mask[:, :t_text, -1] = True
    audio = rng.integers(0, args.audio_vocab_size, (B, T - t_text, K), dtype=np.int64)
    tokens[:, t_text:, :K] = audio
    tokens_mask[:, t_text:, :K] = True
    # position t predicts the audio frame at t+1
    targets[:, t_text - 1 : T - 1] = audio
    target_mask[:, t_text - 1 : T - 1] = True
    return Batch(
        tokens=jnp.asarray(tokens),
        tokens_mask=jnp.asarray(tokens_mask),
        targets=jnp.asarray(targets),
        target_mask=jnp.asarray(target_mask),
    )


@pytest.fixture(scope="module")
def tiny():
    args = tiny_test_args()
    params = init_csm_params(jax.random.key(0), args, jnp.float32)
    return args, params


def test_masked_cross_entropy_matches_numpy():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(3, 5, 7)).astype(np.float32)
    labels = rng.integers(0, 7, (3, 5))
    mask = rng.random((3, 5)) < 0.5
    got = float(
        masked_cross_entropy(
            jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask)
        )
    )
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    nll = -np.log(p[np.arange(3)[:, None], np.arange(5)[None], labels])
    want = nll[mask].mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_loss_finite_and_composed(tiny):
    args, params = tiny
    batch = make_batch(args)
    total, metrics = jax.jit(
        lambda p, k, b: compute_loss(p, args, k, b, compute_dtype=jnp.float32)
    )(params, jax.random.key(0), batch)
    assert np.isfinite(float(total))
    np.testing.assert_allclose(
        float(total),
        100.0 * float(metrics["semantic_loss"]) + float(metrics["acoustic_loss"]),
        rtol=1e-6,
    )
    # amortization: ~1/16 of B*T frames selected
    assert int(metrics["num_amortized_frames"]) >= 1
    assert int(metrics["num_amortized_frames"]) <= max(1, batch.tokens.shape[0] * batch.tokens.shape[1] // 16)


def test_loss_ignores_masked_positions(tiny):
    """Changing target values outside target_mask must not change the loss."""
    args, params = tiny
    batch = make_batch(args)
    f = jax.jit(
        lambda p, k, b: compute_loss(p, args, k, b, compute_dtype=jnp.float32)[0]
    )
    base = float(f(params, jax.random.key(0), batch))
    tampered = batch._replace(
        targets=jnp.where(
            batch.target_mask[..., None], batch.targets, batch.targets + 7
        )
        % args.audio_vocab_size
    )
    got = float(f(params, jax.random.key(0), tampered))
    np.testing.assert_allclose(got, base, rtol=1e-6)


def test_component_labels(tiny):
    args, params = tiny
    labels = component_labels(params, freeze_backbone=True)
    assert labels["backbone"]["wq"] == "frozen"
    assert labels["decoder"]["wq"] == "decoder"
    assert labels["text_embeddings"] == "embeddings"
    assert labels["projection"] == "other"


def test_train_step_decreases_loss(tiny):
    """A few steps on one fixed batch must reduce the loss (sanity of
    grads + per-component AdamW)."""
    args, _ = tiny
    params = init_csm_params(jax.random.key(1), args, jnp.float32)
    batch = make_batch(args, B=2, T=8)
    tx = make_optimizer(params, learning_rate=3e-3, max_grad_norm=1.0)
    state = init_train_state(params, tx)
    step = make_train_step(args, tx, compute_dtype=jnp.float32)

    losses = []
    for i in range(8):
        state, metrics = step(state, jax.random.key(42), batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_frozen_component_unchanged(tiny):
    args, _ = tiny
    params = init_csm_params(jax.random.key(2), args, jnp.float32)
    batch = make_batch(args, B=2, T=8)
    tx = make_optimizer(params, learning_rate=1e-2, freeze_backbone=True)
    # copy: the step donates its input state, invalidating those buffers
    state = init_train_state(jax.tree.map(jnp.array, params), tx)
    step = make_train_step(args, tx, compute_dtype=jnp.float32)
    new_state, _ = step(state, jax.random.key(0), batch)
    np.testing.assert_array_equal(
        np.asarray(new_state.params["backbone"]["wq"]),
        np.asarray(params["backbone"]["wq"]),
    )
    assert not np.array_equal(
        np.asarray(new_state.params["decoder"]["wq"]),
        np.asarray(params["decoder"]["wq"]),
    )


def test_eval_step(tiny):
    args, params = tiny
    batch = make_batch(args)
    ev = make_eval_step(args, compute_dtype=jnp.float32)
    metrics = ev(params, jax.random.key(0), batch)
    assert np.isfinite(float(metrics["loss"]))


def test_gradient_accumulation(tiny):
    """accumulation_steps=2: params change only every 2nd micro-step
    (optax.MultiSteps semantics, the reference's accumulation loop)."""
    args, _ = tiny
    params = init_csm_params(jax.random.key(4), args, jnp.float32)
    batch = make_batch(args, B=2, T=8)
    tx = make_optimizer(params, learning_rate=1e-3, accumulation_steps=2)
    state = init_train_state(jax.tree.map(jnp.array, params), tx)
    step = make_train_step(args, tx, compute_dtype=jnp.float32)

    before = np.asarray(params["decoder"]["wq"]).copy()
    state, _ = step(state, jax.random.key(0), batch)  # micro-step 1: no update
    np.testing.assert_array_equal(np.asarray(state.params["decoder"]["wq"]), before)
    state, _ = step(state, jax.random.key(1), batch)  # micro-step 2: update
    assert not np.array_equal(np.asarray(state.params["decoder"]["wq"]), before)


@pytest.mark.slow
def test_grad_microbatches_exact_semantics(tiny):
    """_accumulated_grads(n_micro=2) == mean of per-microbatch
    value_and_grad with the same split keys (the optax.MultiSteps
    contract, computed in one compiled scan)."""
    from csm_tpu.training.train_step import _accumulated_grads

    args, params = tiny
    batch = make_batch(args, B=4, T=8)

    def loss_fn(p, key, b):
        return compute_loss(p, args, key, b, compute_dtype=jnp.float32)

    key = jax.random.key(3)
    (_, metrics), grads = _accumulated_grads(loss_fn, params, key, batch, 2)

    keys = jax.random.split(key, 2)
    halves = jax.tree.map(lambda x: x.reshape((2, 2) + x.shape[1:]), batch)
    g_exp = None
    for i in range(2):
        b_i = jax.tree.map(lambda x: x[i], halves)
        (_, _), g = jax.value_and_grad(loss_fn, has_aux=True)(params, keys[i], b_i)
        g_exp = g if g_exp is None else jax.tree.map(jnp.add, g_exp, g)
    g_exp = jax.tree.map(lambda x: x / 2, g_exp)

    flat_a, _ = jax.tree_util.tree_flatten(grads)
    flat_b, _ = jax.tree_util.tree_flatten(g_exp)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    assert np.isfinite(float(metrics["loss"]))


def test_train_step_grad_microbatches_runs(tiny):
    """A full jitted step with in-step microbatching updates params and
    reports finite metrics."""
    args, _ = tiny
    params = init_csm_params(jax.random.key(9), args, jnp.float32)
    batch = make_batch(args, B=4, T=8)
    tx = make_optimizer(params, learning_rate=1e-3)
    state = init_train_state(jax.tree.map(jnp.array, params), tx)
    step = make_train_step(args, tx, compute_dtype=jnp.float32, grad_microbatches=2)
    before = np.asarray(params["decoder"]["wq"]).copy()
    state, metrics = step(state, jax.random.key(0), batch)
    assert np.isfinite(float(metrics["loss"]))
    assert not np.array_equal(np.asarray(state.params["decoder"]["wq"]), before)


def test_adamw_dtypes_matches_optax():
    """adamw_dtypes at all-f32 == optax.adamw; moment storage dtypes are
    honored when requested (the 8B bf16-master recipe)."""
    from csm_tpu.training.optimizer import adamw_dtypes

    rng = np.random.default_rng(0)
    params = {
        "a": jnp.asarray(rng.standard_normal((4, 3)), jnp.float32),
        "b": jnp.asarray(rng.standard_normal((5,)), jnp.float32),
    }
    grads = jax.tree.map(
        lambda p: jnp.asarray(rng.standard_normal(p.shape), jnp.float32), params
    )

    import optax

    tx_ref = optax.adamw(1e-3, weight_decay=0.01)
    tx_new = adamw_dtypes(1e-3, weight_decay=0.01)
    s_ref, s_new = tx_ref.init(params), tx_new.init(params)
    p_ref, p_new = params, params
    for i in range(3):
        g = jax.tree.map(lambda x: x * (i + 1), grads)
        u_ref, s_ref = tx_ref.update(g, s_ref, p_ref)
        u_new, s_new = tx_new.update(g, s_new, p_new)
        p_ref = optax.apply_updates(p_ref, u_ref)
        p_new = optax.apply_updates(p_new, u_new)
    for a, b in zip(jax.tree.leaves(p_new), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # dtype policy: bf16 params, bf16 mu, f32 nu
    p16 = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    tx16 = adamw_dtypes(1e-3, mu_dtype=jnp.bfloat16, nu_dtype=jnp.float32)
    s16 = tx16.init(p16)
    adam_state = next(
        s for s in jax.tree_util.tree_leaves(
            s16, is_leaf=lambda x: hasattr(x, "mu")
        ) if hasattr(x := s, "mu")
    )
    assert all(m.dtype == jnp.bfloat16 for m in jax.tree.leaves(adam_state.mu))
    assert all(n.dtype == jnp.float32 for n in jax.tree.leaves(adam_state.nu))
    g16 = jax.tree.map(lambda p: p.astype(jnp.bfloat16), grads)
    u16, _ = tx16.update(g16, s16, p16)
    assert all(u.dtype == jnp.bfloat16 for u in jax.tree.leaves(u16))


def test_bf16_master_weights_step(tiny):
    """The full 8B-recipe dtype policy at tiny scale: bf16 master weights,
    bf16 mu / f32 nu, microbatched grads — one step keeps dtypes and
    yields a finite loss."""
    args, _ = tiny
    params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16),
        init_csm_params(jax.random.key(11), args, jnp.float32),
    )
    batch = make_batch(args, B=4, T=8)
    tx = make_optimizer(
        params, learning_rate=1e-3,
        mu_dtype=jnp.bfloat16, nu_dtype=jnp.float32,
    )
    state = init_train_state(params, tx)
    step = make_train_step(
        args, tx, compute_dtype=jnp.bfloat16, grad_microbatches=2
    )
    state, metrics = step(state, jax.random.key(0), batch)
    assert np.isfinite(float(metrics["loss"]))
    assert all(
        p.dtype == jnp.bfloat16 for p in jax.tree.leaves(state.params)
    )
