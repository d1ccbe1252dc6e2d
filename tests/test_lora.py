"""LoRA tests: adapter math, merging, training, save/load, interpolation.

Mirrors the reference LoRA test surface (SURVEY.md §4:
src/csm/training/test_lora.py — adapter creation, forward shape, param
counts, merging; test_lora_comprehensive.py — init matrix, save modes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csm_tpu.models.config import tiny_test_args
from csm_tpu.models.csm import backbone_forward, init_csm_params
from csm_tpu.models.llama import transformer_apply
from csm_tpu.ops.attention import causal_mask_from_positions
from csm_tpu.training.lora import (
    LoRAConfig,
    count_params,
    init_lora_params,
    interpolate_lora,
    load_lora,
    merge_lora,
    parameter_efficiency,
    save_lora,
)
from csm_tpu.training.losses import compute_loss
from csm_tpu.training.optimizer import init_train_state, make_lora_optimizer
from csm_tpu.training.train_step import make_lora_train_step
from test_training import make_batch


@pytest.fixture(scope="module")
def tiny():
    args = tiny_test_args()
    params = init_csm_params(jax.random.key(0), args, jnp.float32)
    return args, params


def _fwd(params, cfg, h, lora=None, scale=0.0):
    B, S, _ = h.shape
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    mask = causal_mask_from_positions(pos, pos[0])
    out, _ = jax.jit(
        transformer_apply, static_argnames=("cfg", "lora_scale")
    )(params, cfg, h, pos, mask, lora=lora, lora_scale=scale)
    return out


def test_init_shapes(tiny):
    args, _ = tiny
    lcfg = LoRAConfig(r=4, target_modules=("q_proj", "v_proj", "down_proj"))
    lora = init_lora_params(jax.random.key(1), args, lcfg)
    bb = args.backbone
    L, E, r = bb.num_layers, bb.embed_dim, 4
    assert lora["backbone"]["wq"]["a"].shape == (L, E, r)
    assert lora["backbone"]["wq"]["b"].shape == (L, r, bb.num_heads * bb.head_dim)
    # GQA: v adapter out dim is the KV width, not the Q width
    assert lora["backbone"]["wv"]["b"].shape == (L, r, bb.num_kv_heads * bb.head_dim)
    assert lora["backbone"]["w2"]["a"].shape == (L, bb.intermediate_dim, r)
    assert (np.asarray(lora["backbone"]["wq"]["b"]) == 0).all()


def test_zero_b_is_identity(tiny):
    """Freshly-initialized adapters (B=0) must not change the forward."""
    args, params = tiny
    lcfg = LoRAConfig(r=4)
    lora = init_lora_params(jax.random.key(1), args, lcfg)
    h = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 6, args.backbone.embed_dim)),
        jnp.float32,
    )
    base = _fwd(params["backbone"], args.backbone, h)
    with_lora = _fwd(params["backbone"], args.backbone, h,
                     lora["backbone"], lcfg.scaling)
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_lora), atol=1e-6)


def test_merge_equals_lowrank_path(tiny):
    """forward(base, adapters) == forward(merge(base, adapters))."""
    args, params = tiny
    lcfg = LoRAConfig(r=4, target_modules=("q_proj", "v_proj", "o_proj"))
    lora = init_lora_params(jax.random.key(2), args, lcfg)
    # give B nonzero values so the adapters actually do something
    lora = jax.tree.map(
        lambda x: x + 0.02 * jax.random.normal(jax.random.key(9), x.shape), lora
    )
    h = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 5, args.backbone.embed_dim)),
        jnp.float32,
    )
    lowrank = _fwd(params["backbone"], args.backbone, h, lora["backbone"], lcfg.scaling)
    merged = merge_lora(params, lora, lcfg)
    merged_out = _fwd(merged["backbone"], args.backbone, h)
    np.testing.assert_allclose(
        np.asarray(lowrank), np.asarray(merged_out), atol=2e-5
    )
    # non-target weights untouched
    np.testing.assert_array_equal(
        np.asarray(merged["backbone"]["w1"]), np.asarray(params["backbone"]["w1"])
    )


def test_target_layers_frozen(tiny):
    args, _ = tiny
    lcfg = LoRAConfig(r=4, target_layers=(1,))
    lora = init_lora_params(jax.random.key(3), args, lcfg)
    a = np.asarray(lora["backbone"]["wq"]["a"])
    assert (a[0] == 0).all() and not (a[1] == 0).all()


def test_parameter_efficiency(tiny):
    args, params = tiny
    lcfg = LoRAConfig(r=4)
    lora = init_lora_params(jax.random.key(4), args, lcfg)
    eff = parameter_efficiency(params, lora)
    assert 0 < eff < 0.2
    assert count_params(lora) > 0


def test_lora_train_step(tiny):
    """Adapter-only training reduces loss; base params never change."""
    args, params = tiny
    lcfg = LoRAConfig(r=8, alpha=16.0)
    lora = init_lora_params(jax.random.key(5), args, lcfg)
    batch = make_batch(args, B=2, T=8)
    tx = make_lora_optimizer(learning_rate=5e-3)
    state = init_train_state(lora, tx)
    step = make_lora_train_step(args, tx, lcfg.scaling, compute_dtype=jnp.float32)

    base_before = np.asarray(params["backbone"]["wq"]).copy()
    losses = []
    for _ in range(6):
        state, metrics = step(state, params, jax.random.key(11), batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    np.testing.assert_array_equal(np.asarray(params["backbone"]["wq"]), base_before)
    # B moved away from zero
    assert np.abs(np.asarray(state.params["backbone"]["wq"]["b"])).max() > 0


def test_save_load_roundtrip(tiny, tmp_path):
    args, _ = tiny
    lcfg = LoRAConfig(r=4, alpha=8.0, target_modules=("q_proj", "v_proj"))
    lora = init_lora_params(jax.random.key(6), args, lcfg)
    path = save_lora(str(tmp_path / "adapter"), lora, lcfg, args)
    lora2, lcfg2, args2 = load_lora(path)
    assert lcfg2 == lcfg
    assert args2 == args
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        lora,
        lora2,
    )


def test_interpolation(tiny):
    args, _ = tiny
    lcfg = LoRAConfig(r=2)
    l1 = init_lora_params(jax.random.key(7), args, lcfg)
    l2 = init_lora_params(jax.random.key(8), args, lcfg)
    mix = interpolate_lora([l1, l2], [3.0, 1.0])
    want = 0.75 * np.asarray(l1["backbone"]["wq"]["a"]) + 0.25 * np.asarray(
        l2["backbone"]["wq"]["a"]
    )
    np.testing.assert_allclose(
        np.asarray(mix["backbone"]["wq"]["a"]), want, rtol=1e-6
    )


def test_lora_in_loss(tiny):
    """compute_loss with adapters differs from base once B is nonzero."""
    args, params = tiny
    lcfg = LoRAConfig(r=4)
    lora = init_lora_params(jax.random.key(9), args, lcfg)
    lora = jax.tree.map(
        lambda x: x + 0.05 * jax.random.normal(jax.random.key(10), x.shape), lora
    )
    batch = make_batch(args, B=2, T=8)
    f = jax.jit(
        lambda p, lo: compute_loss(
            p, args, jax.random.key(0), batch, compute_dtype=jnp.float32,
            lora=lo, lora_scale=lcfg.scaling,
        )[0]
    )
    base = float(jax.jit(
        lambda p: compute_loss(
            p, args, jax.random.key(0), batch, compute_dtype=jnp.float32
        )[0]
    )(params))
    with_lora = float(f(params, lora))
    assert abs(base - with_lora) > 1e-6


def test_lora_dropout_active_in_training_only(tiny):
    """Adapter-input dropout: the forward is key-stochastic with a dropout
    key, and identical to the no-dropout forward without one.  (The full
    loss is always key-stochastic via amortized frame subsampling, so the
    check isolates the transformer forward.)"""
    args, params = tiny
    lcfg = LoRAConfig(r=4, dropout=0.5)
    lora = init_lora_params(jax.random.key(5), args, lcfg)
    # make adapters non-trivial so dropout changes the forward
    lora = jax.tree.map(
        lambda x: x + 0.1 * jax.random.normal(jax.random.key(6), x.shape), lora
    )
    h = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 6, args.backbone.embed_dim)),
        jnp.float32,
    )
    pos = jnp.broadcast_to(jnp.arange(6), (2, 6))
    mask = causal_mask_from_positions(pos, pos[0])
    f = jax.jit(
        lambda k, rate: transformer_apply(
            params["backbone"], args.backbone, h, pos, mask,
            lora=lora["backbone"], lora_scale=lcfg.scaling,
            lora_dropout_rate=rate, lora_dropout_key=k,
        )[0],
        static_argnums=(1,),
    )
    o1 = np.asarray(f(jax.random.key(1), 0.5))
    o2 = np.asarray(f(jax.random.key(2), 0.5))
    assert not np.array_equal(o1, o2)  # dropout noise differs across keys
    # without a key (inference/eval) the forward matches rate=0 exactly
    base = np.asarray(
        jax.jit(
            lambda: transformer_apply(
                params["backbone"], args.backbone, h, pos, mask,
                lora=lora["backbone"], lora_scale=lcfg.scaling,
            )[0]
        )()
    )
    no_key = np.asarray(
        jax.jit(
            lambda: transformer_apply(
                params["backbone"], args.backbone, h, pos, mask,
                lora=lora["backbone"], lora_scale=lcfg.scaling,
                lora_dropout_rate=0.5, lora_dropout_key=None,
            )[0]
        )()
    )
    np.testing.assert_array_equal(no_key, base)
