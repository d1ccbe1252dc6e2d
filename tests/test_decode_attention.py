"""Pallas decode-attention kernel (csm_tpu/ops/decode_attention.py).

Opt-in experiment (CSM_TPU_DECODE_KERNEL=1): measured end-to-end neutral
vs the XLA decode path on the attached rig, kept correct for future
hardware (see BENCHMARKS.md §decode attention).  These tests pin the
kernel's math: parity vs the XLA oracle, partial tail chunks, dead
(fully-masked) rows, and engagement through generate_frame when opted
in.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csm_tpu.ops import flash_attention as fa
from csm_tpu.ops.attention import gqa_attention
from csm_tpu.ops.decode_attention import decode_gqa_attention, decode_supported

pytestmark = pytest.mark.skipif(
    not fa.flash_available(), reason="no TPU backend for Pallas kernels"
)


@pytest.mark.parametrize(
    "B,Hq,Hkv,D,T",
    [(1, 32, 8, 64, 2176),   # backbone decode shape (non-divisible tail)
     (4, 8, 2, 128, 256),    # decoder-like, one chunk
     (2, 32, 8, 64, 512),
     (8, 8, 2, 128, 2048)],
)
def test_matches_xla_oracle(B, Hq, Hkv, D, T):
    rng = np.random.default_rng(B + T)
    q = jnp.asarray(rng.standard_normal((B, 1, Hq, D)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, Hkv, D)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, Hkv, D)) * 0.3, jnp.float32)
    pos = rng.integers(0, T, B)
    mask = jnp.asarray(np.arange(T)[None, None, :] <= pos[:, None, None])
    assert decode_supported(q, k, mask)
    a = np.asarray(jax.jit(decode_gqa_attention)(q, k, v, mask), np.float64)
    b = np.asarray(jax.jit(gqa_attention)(q, k, v, mask), np.float64)
    # the kernel accumulates scores/probs in f32 with HIGHEST dots; the
    # XLA einsum path runs at TPU-default precision — measured the
    # KERNEL closer to a float64 reference (3e-7 vs 8e-4)
    assert np.abs(a - b).max() < 2e-3


def test_fully_masked_rows_are_zero():
    rng = np.random.default_rng(0)
    B, Hq, Hkv, D, T = 2, 32, 8, 64, 256
    q = jnp.asarray(rng.standard_normal((B, 1, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.float32)
    mask = jnp.zeros((B, 1, T), bool).at[1].set(True)
    a = jax.jit(decode_gqa_attention)(q, k, v, mask)
    assert float(jnp.max(jnp.abs(a[0]))) == 0.0
    assert float(jnp.max(jnp.abs(a[1]))) > 0.0


def test_transformer_decode_opt_in_matches_default():
    """With CSM_TPU_DECODE_KERNEL=1 a cached S=1 transformer step runs
    the kernel; output must match the XLA path to float noise.  (The
    tiny TEST model's Hkv*D = 32 < 128 lanes, so this uses a small
    kernel-eligible config.)"""
    from csm_tpu.models.config import TransformerConfig
    from csm_tpu.models.llama import transformer_apply, transformer_init
    from csm_tpu.ops.attention import causal_mask_from_positions
    from csm_tpu.ops.kvcache import init_kv_cache

    cfg = TransformerConfig(num_layers=2, num_heads=4, num_kv_heads=2,
                            embed_dim=256, intermediate_dim=256,
                            max_seq_len=256)
    params = transformer_init(jax.random.key(0), cfg, jnp.float32)
    B = 2
    cache = init_kv_cache(cfg, B, jnp.float32, 256)
    h = jnp.asarray(np.random.default_rng(1).standard_normal((B, 1, 256)) * 0.1,
                    jnp.float32)
    pos = jnp.full((B, 1), 3, jnp.int32)
    kv_pos = jnp.full((B, 256), 2**30, jnp.int32).at[:, :4].set(
        jnp.arange(4, dtype=jnp.int32))
    mask = causal_mask_from_positions(pos, kv_pos)
    apply = jax.jit(
        lambda p, h, c: transformer_apply(p, cfg, h, pos, mask, c,
                                          jnp.asarray(3, jnp.int32))[0]
    )

    base = np.asarray(apply(params, h, cache))
    os.environ["CSM_TPU_DECODE_KERNEL"] = "1"
    try:
        jax.clear_caches()
        opt = np.asarray(apply(params, h, cache))
    finally:
        del os.environ["CSM_TPU_DECODE_KERNEL"]
        jax.clear_caches()
    np.testing.assert_allclose(opt, base, rtol=1e-4, atol=1e-5)
