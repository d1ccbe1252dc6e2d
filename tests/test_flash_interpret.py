"""Flash-kernel math in Pallas INTERPRET mode — platform-independent.

tests/test_flash_attention.py runs the compiled kernels on a real TPU
(and is skipped elsewhere); these run the same kernel bodies through the
Pallas interpreter, so the online-softmax/chunk-split/GQA-stacking math
is covered on any backend — including the mask-free/masked loop-range
split (flash_attention._full_chunk_prefix) and its non-monotone-layout
degradation (zigzag ring segments).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from csm_tpu.ops.attention import causal_mask_from_positions, gqa_attention
from csm_tpu.ops import flash_attention as fa

# On a TPU-attached run the COMPILED kernels are covered by
# tests/test_flash_attention.py, and interpret mode would dispatch
# thousands of tiny ops through the device (painfully slow over a
# tunneled attachment) — these tests exist for every OTHER backend.
pytestmark = pytest.mark.skipif(
    fa.flash_available(), reason="real-kernel tests cover TPU runs"
)

PAD = 1 << 28


@pytest.fixture
def interpret_pallas(monkeypatch):
    """Force every pallas_call in the module under test to interpret."""
    orig = pl.pallas_call

    def patched(*a, **kw):
        kw.setdefault("interpret", True)
        kw.pop("compiler_params", None)  # Mosaic-only knob
        return orig(*a, **kw)

    monkeypatch.setattr(fa.pl, "pallas_call", patched)


def _check(qpos, kvpos, real_q=None, real_kv=None, B=1, Hq=4, Hkv=1, D=64):
    S, T = qpos.shape[1], kvpos.shape[1]
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.float32)
    rq = np.ones((B, S), bool) if real_q is None else real_q

    out, L = fa._flash_fwd(q, k, v, qpos, kvpos, 256)
    ref = gqa_attention(q, k, v, causal_mask_from_positions(qpos, kvpos))
    err = float(jnp.max(jnp.abs(out - ref)[jnp.asarray(rq)]))
    assert err < 2e-5, ("fwd", err)

    g = jnp.asarray(rng.standard_normal(out.shape), jnp.float32)
    g = g * jnp.asarray(rq)[..., None, None]  # dead rows carry no cotangent
    dq, dk, dv = fa._flash_bwd_pallas(q, k, v, qpos, kvpos, out, L, g, 256)

    def reff(q, k, v):
        m = causal_mask_from_positions(qpos, kvpos)
        return jnp.where(jnp.asarray(rq)[..., None, None],
                         gqa_attention(q, k, v, m), 0.0)

    _, vjp = jax.vjp(reff, q, k, v)
    for name, a, b, sel in zip(
        ("dq", "dk", "dv"), (dq, dk, dv), vjp(g), (rq, real_kv, real_kv)
    ):
        d = jnp.abs(a - b)
        if sel is not None:
            d = d[jnp.asarray(sel)]
        assert float(jnp.max(d)) < 5e-4, (name, float(jnp.max(d)))


def test_multichunk_contiguous(interpret_pallas):
    """T=1024 → 2 KV chunks: the mask-free prefix is actually taken."""
    S = T = 1024
    base = jnp.asarray(np.broadcast_to(np.arange(S), (1, S)), jnp.int32)
    _check(base, base)


def test_multichunk_ragged(interpret_pallas):
    """Per-row lengths with PAD_POS sentinels across chunk boundaries."""
    S = T = 1024
    base = np.broadcast_to(np.arange(S), (1, S)).astype(np.int32)
    qpos = np.where(np.arange(S)[None] < 800, base, PAD)
    kvpos = np.where(np.arange(T)[None] < 900, base, PAD)
    _check(
        jnp.asarray(qpos), jnp.asarray(kvpos),
        real_q=np.arange(S)[None] < 800,
        real_kv=np.arange(T)[None] < 900,
    )


def test_lse_cotangent_interpret(interpret_pallas):
    """flash_gqa_attention_with_lse carries gradients through BOTH
    outputs (ring attention's log-space merge differentiates the lse)."""
    B, S, Hq, Hkv, D = 1, 512, 4, 1, 64
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    qpos = jnp.broadcast_to(jnp.arange(S), (B, S)).astype(jnp.int32)
    kvpos = jnp.broadcast_to(jnp.arange(S), (B, S)).astype(jnp.int32)

    def loss_flash(q, k, v):
        out, lse = fa.flash_gqa_attention_with_lse(q, k, v, qpos, kvpos)
        return (out.astype(jnp.float32) ** 2).sum() + (jnp.sin(lse)).sum()

    def loss_ref(q, k, v):
        m = causal_mask_from_positions(qpos, kvpos)
        qt = q.transpose(0, 2, 1, 3)  # (B, Hq, S, D)
        kt = jnp.repeat(k.transpose(0, 2, 1, 3), Hq // Hkv, axis=1)
        vt = jnp.repeat(v.transpose(0, 2, 1, 3), Hq // Hkv, axis=1)
        s = jnp.einsum("bhsd,bhtd->bhst", qt, kt) / np.sqrt(D)
        s = jnp.where(m[:, None, :, :], s, -1e30)
        lse = jax.scipy.special.logsumexp(s, axis=-1)  # (B, Hq, S)
        out = jnp.einsum("bhst,bhtd->bhsd", jax.nn.softmax(s, axis=-1), vt)
        out = out.transpose(0, 2, 1, 3)
        return (out ** 2).sum() + (jnp.sin(lse)).sum()

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3,
            err_msg=name,
        )


def test_zigzag_segments(interpret_pallas):
    """Non-monotone positions (zigzag ring): the split must degrade to
    masked-everything, never to a wrong mask-free skip.  Rows with no
    visible key are undefined in the flash contract (ring discards them
    via lse = −inf), so only rows seeing ≥1 key are compared."""
    S = 512
    seg = np.concatenate([np.arange(0, 256), np.arange(768, 1024)])
    qz = np.broadcast_to(seg, (1, S)).astype(np.int32)
    kz = np.broadcast_to(np.arange(256, 768), (1, S)).astype(np.int32)
    _check(jnp.asarray(qz), jnp.asarray(kz), real_q=qz >= 256)
