"""Pallas GQA flash attention (TPU) with position-based causal masking.

The training / prefill hot op: at S=2048 the XLA path materializes
(B, Hq, S, T) float32 scores in HBM (~0.5 GB per batch row for the 1B
backbone); this kernel keeps scores in VMEM per q-block, reading K/V once
per (batch, kv-head) and writing only the (B, S, Hq, D) output.

Design (per /opt/skills/guides/pallas_guide.md):
  * grid (B, Hq, Sq/BQ); q blocks (BQ, D) stream; each program holds the
    FULL K/V for its kv-head in VMEM (T ≤ 2048+frames ⇒ ≤ ~0.6 MB each in
    bf16) — the kv-head block's index map is constant in the q-block
    coordinate, so Pallas keeps it resident across the inner grid axis
    instead of re-fetching;
  * masking is computed on the fly from integer positions
    (``kv_pos <= q_pos``) — the same PAD_POS sentinel contract as
    csm_tpu.ops.attention.causal_mask_from_positions, with no (S, T)
    mask materialization;
  * scores/softmax in float32 on the MXU (preferred_element_type), output
    cast back to the query dtype;
  * rows whose keys are fully masked (q-block padding) produce zeros via
    a denominator guard.

Differentiation: wrapped in ``jax.custom_vjp`` whose backward recomputes
through the XLA reference attention — flash-memory savings apply to the
forward (inference/prefill); training backward matches XLA exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from csm_tpu.ops.attention import causal_mask_from_positions, gqa_attention

DEFAULT_BLOCK_Q = 256
NEG_INF = -1e30  # python float: jnp constants can't be captured by kernels


def _kernel(qpos_ref, kpos_ref, q_ref, k_ref, v_ref, o_ref, *, scale, block_k):
    """Online-softmax over KV chunks with causal chunk skipping.

    K/V for this program's kv-head are fully VMEM-resident; chunks whose
    minimum key position exceeds the block's maximum query position are
    skipped entirely (≈2x for causal self-attention).  Standard flash
    rescaling erases any contribution accumulated while a row was still
    fully masked (alpha → 0 on the first real chunk).
    """
    BQ = q_ref.shape[2]
    D = q_ref.shape[3]
    T = k_ref.shape[2]
    f32 = jnp.float32
    hi = jax.lax.Precision.HIGHEST

    q = q_ref[0, 0].astype(f32) * scale  # (BQ, D)
    qpos = qpos_ref[0, 0].reshape(BQ, 1)  # (BQ, 1)
    qmax = jnp.max(qpos)

    def chunk(j, carry):
        m, l, acc = carry
        kpos_c = kpos_ref[0, 0, pl.ds(j * block_k, block_k)]  # (BK,)

        def compute(carry):
            m, l, acc = carry
            k = k_ref[0, 0, pl.ds(j * block_k, block_k), :].astype(f32)
            v = v_ref[0, 0, pl.ds(j * block_k, block_k), :].astype(f32)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=f32, precision=hi,
            )  # (BQ, BK)
            s = jnp.where(kpos_c.reshape(1, -1) <= qpos, s, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=f32, precision=hi,
            )
            return m_new, l, acc

        return jax.lax.cond(
            jnp.min(kpos_c) <= qmax, compute, lambda c: c, carry
        )

    m0 = jnp.full((BQ, 1), NEG_INF, f32)
    l0 = jnp.zeros((BQ, 1), f32)
    acc0 = jnp.zeros((BQ, D), f32)
    _, l, acc = jax.lax.fori_loop(0, T // block_k, chunk, (m0, l0, acc0))
    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _pad_to(x, axis, mult, value=0):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _flash_fwd(q, k, v, q_pos, kv_pos, block_q):
    B, S, Hq, D = q.shape
    T, Hkv = k.shape[1], k.shape[2]
    qpk = Hq // Hkv
    scale = 1.0 / (D**0.5)

    BQ = min(block_q, max(128, 1 << (S - 1).bit_length()))
    BK = min(512, max(128, 1 << (T - 1).bit_length()))
    # layouts: (B, H, S, D); pad S to BQ, T to the kv-chunk size
    qt = _pad_to(q.transpose(0, 2, 1, 3), 2, BQ)
    kt = _pad_to(k.transpose(0, 2, 1, 3), 2, BK)
    vt = _pad_to(v.transpose(0, 2, 1, 3), 2, BK)
    # padded kv slots carry a sentinel > any real position => never attended
    kv_pos_p = _pad_to(kv_pos.astype(jnp.int32), 1, BK, value=jnp.int32(1 << 29))
    # padded q rows attend nothing (pos -1): their rows are discarded and
    # they must not defeat the chunk-skip bound (a huge sentinel would)
    q_pos_p = _pad_to(q_pos.astype(jnp.int32), 1, BQ, value=jnp.int32(-1))
    # 3-D so the block's last two dims satisfy the (8, 128) tiling rule
    q_pos_p = q_pos_p[:, None, :]
    kv_pos_p = kv_pos_p[:, None, :]

    S_pad, T_pad = qt.shape[2], kt.shape[2]
    grid = (B, Hq, S_pad // BQ)

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, block_k=BK),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, BQ), lambda b, h, i: (b, 0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, T_pad), lambda b, h, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, BQ, D), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, T_pad, D),
                lambda b, h, i, qpk=qpk: (b, h // qpk, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, T_pad, D),
                lambda b, h, i, qpk=qpk: (b, h // qpk, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, BQ, D), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hq, S_pad, D), q.dtype),
    )(q_pos_p, kv_pos_p, qt, kt, vt)

    return out[:, :, :S, :].transpose(0, 2, 1, 3)  # (B, S, Hq, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def flash_gqa_attention(q, k, v, q_pos, kv_pos, block_q=DEFAULT_BLOCK_Q):
    """Flash GQA attention with positions-derived causal mask.

    Args:
        q: (B, S, Hq, D); k/v: (B, T, Hkv, D); q_pos: (B, S) int;
        kv_pos: (T,) or (B, T) int (PAD_POS sentinel for dead slots).

    Returns (B, S, Hq, D) in q.dtype — numerically equivalent to
    ``gqa_attention(q, k, v, causal_mask_from_positions(q_pos, kv_pos))``.
    """
    if kv_pos.ndim == 1:
        kv_pos = jnp.broadcast_to(kv_pos[None, :], (q.shape[0], kv_pos.shape[0]))
    return _flash_fwd(q, k, v, q_pos, kv_pos, block_q)


def _fwd(q, k, v, q_pos, kv_pos, block_q):
    out = flash_gqa_attention(q, k, v, q_pos, kv_pos, block_q)
    return out, (q, k, v, q_pos, kv_pos)


def _bwd(block_q, res, g):
    q, k, v, q_pos, kv_pos = res
    mask = causal_mask_from_positions(q_pos, kv_pos)

    def ref(q, k, v):
        return gqa_attention(q, k, v, mask)

    _, vjp = jax.vjp(ref, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


flash_gqa_attention.defvjp(_fwd, _bwd)


def flash_available() -> bool:
    """Pallas TPU kernels need a real TPU backend."""
    import os

    if os.environ.get("CSM_TPU_NO_FLASH"):
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


FLASH_MIN_SEQ = 256


def use_flash(seq_len: int) -> bool:
    """Auto policy: flash for long-sequence prefill/training on TPU; the
    XLA path stays for short sequences (exact-parity tests) and decode."""
    return seq_len >= FLASH_MIN_SEQ and flash_available()
