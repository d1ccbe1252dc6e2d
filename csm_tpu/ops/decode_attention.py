"""Pallas decode attention: single-query GQA over a long KV cache (TPU).

Why a kernel: at decode (S = 1) attention is a pure KV-cache stream, yet
the XLA path measures ~56–110 GB/s effective (8× below the chip's
~800 GB/s) at CSM cache lengths — per-head strided reads, an f32 cache
widening, and tiny (G, D) = (4, 64) dots that XLA schedules poorly.  At
the 2048-token headline config that is ~1.3 ms of the 11.7 ms frame;
at an 8 K cache it is the dominant long-context decode cost
(BENCHMARKS.md §long context).

Design — everything is lane-major and dot-shaped so nothing is strided:

  * K and V arrive reshaped (B, T, Hkv·D): merging the two minor dims is
    free in HBM (contiguous) and makes every kernel load a full
    (BT, 512)-lane block;
  * the query arrives BLOCK-DIAGONAL: (B, Hq, Hkv·D) with query head i
    occupying its own group's D-column block and zeros elsewhere, so the
    per-group score dots collapse into ONE (Hq, KD) × (BT, KD)ᵀ MXU
    contraction — zero columns contribute nothing;
  * the p·V product is likewise one (Hq, BT) × (BT, KD) dot, accumulated
    at (Hq, KD) in f32 VMEM scratch; the group-diagonal extraction is
    deferred to the LAST grid step as one (masked) (Hq, KD) × (KD, D)
    projection against a constant tiled identity — no sublane/lane
    slicing anywhere in the kernel;
  * grid (B, T/BT), chunks innermost, online softmax (m, l carried in
    scratch) with the same finite NEG_INF sentinel and fully-masked-row
    guard as the training flash kernel (csm_tpu/ops/flash_attention.py).

int8 KV caches (csm_tpu/ops/kvcache.QuantKV) dequantize inside the
kernel: the int8 payload and per-row scales stream from HBM, the
widen+scale happens on the chunk in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = np.float32(-1e30)  # finite sentinel; exp(x - NEG_INF) stays exact 0


def _pick_bt(T: int) -> int:
    # big chunks: small grid steps measured overhead-bound (48 GB/s at
    # BT=128); a (2048, 512) bf16 block is 2 MB — double-buffered K+V
    # stay well inside VMEM.  The tail chunk may be partial: reads pad
    # with garbage, which the in-kernel t·BT + iota < T guard masks.
    return min(2048, -(-T // 128) * 128)


def _kernel(qbd_ref, k_ref, v_ref, mask_ref, gm_ref, proj_ref, o_ref,
            acc_ref, m_ref, l_ref, *, n_chunks: int, seq_len: int):
    """One KV chunk: online-softmax update of (Hq, KD) accumulators.

    qbd_ref: (1, Hq, KD) block-diagonal scaled queries; k_ref/v_ref:
    (1, BT, KD); mask_ref: (1, 1, BT) bool; gm_ref: (Hq, KD) group mask
    (1 on each row's own D-column block — p·V fills EVERY group's
    columns, so rows must be masked to their block before the final
    projection); proj_ref: (KD, D) tiled identity applied on the last
    step; o_ref: (1, Hq, D); acc_ref: (Hq, KD) f32; m_ref/l_ref:
    (Hq, 1) f32.
    """
    t = pl.program_id(1)
    dtype = qbd_ref.dtype

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    qbd = qbd_ref[0]  # (Hq, KD)
    k2 = k_ref[0]  # (BT, KD)
    v2 = v_ref[0]
    BT = k2.shape[0]
    # partial tail chunk: out-of-bounds block reads return garbage —
    # bound them out with the absolute column index
    col = t * BT + jax.lax.broadcasted_iota(jnp.int32, (1, BT), 1)
    msk = mask_ref[0] & (col < seq_len)  # (1, BT) bool

    s = jax.lax.dot_general(
        qbd, k2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.HIGHEST if dtype == jnp.float32
                   else jax.lax.Precision.DEFAULT),
    )  # (Hq, BT)
    s = jnp.where(msk, s, NEG_INF)

    m_prev, l_prev = m_ref[:], l_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    # finite sentinel: a fully-masked row has s == m_new == NEG_INF and
    # exp(0) == 1 — zero those columns explicitly
    p = jnp.where(msk, jnp.exp(s - m_new), 0.0)  # (Hq, BT) f32
    corr = jnp.exp(m_prev - m_new)
    l_ref[:] = corr * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:] = m_new

    pv = jax.lax.dot_general(
        p.astype(dtype), v2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.HIGHEST if dtype == jnp.float32
                   else jax.lax.Precision.DEFAULT),
    )  # (Hq, KD)
    acc_ref[:] = acc_ref[:] * corr + pv

    @pl.when(t == n_chunks - 1)
    def _():
        l = jnp.maximum(l_ref[:], 1e-30)  # dead rows (PAD slots) → zeros
        # mask each row to its own group's columns, then collapse the
        # (KD, D) tiled identity — one dot, no sublane/lane slicing
        out = ((acc_ref[:] / l) * gm_ref[:].astype(jnp.float32)).astype(dtype)
        o_ref[0] = jax.lax.dot_general(
            out, proj_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.HIGHEST if dtype == jnp.float32
                       else jax.lax.Precision.DEFAULT),
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_t",))
def _decode_attention_kernel(qbd, k2, v2, mask3, gmask, proj, block_t):
    B, Hq, KD = qbd.shape
    T = k2.shape[1]
    D = proj.shape[1]
    BT = block_t
    n_chunks = -(-T // BT)
    kernel = functools.partial(_kernel, n_chunks=n_chunks, seq_len=T)
    return pl.pallas_call(
        kernel,
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((1, Hq, KD), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BT, KD), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BT, KD), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BT), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Hq, KD), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KD, D), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Hq, D), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hq, D), qbd.dtype),
        scratch_shapes=[
            pltpu.VMEM((Hq, KD), jnp.float32),
            pltpu.VMEM((Hq, 1), jnp.float32),
            pltpu.VMEM((Hq, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(qbd, k2, v2, mask3, gmask, proj)


def decode_supported(q, k, mask) -> bool:
    """Shape gate for the decode kernel (caller falls back to XLA)."""
    if q.shape[1] != 1 or q.ndim != 4:
        return False
    B, _, Hq, D = q.shape
    T, Hkv = k.shape[1], k.shape[2]
    if Hq % Hkv or D % 8:
        return False
    if (Hkv * D) % 128:
        return False
    return mask is not None and mask.shape[-1] == T


def decode_gqa_attention(q, k, v, mask) -> jnp.ndarray:
    """Single-step GQA attention over a (possibly int8) KV cache.

    Args:
        q: (B, 1, Hq, D); k/v: (B, T, Hkv, D) float (the caller
           dequantizes QuantKV — XLA fuses that convert into the reshape
           feed); mask: (B, 1, T) or (1, 1, T) bool, True = attend.

    Returns (B, 1, Hq, D) in q.dtype.
    """
    B, _, Hq, D = q.shape
    T, Hkv = k.shape[1], k.shape[2]
    G = Hq // Hkv
    KD = Hkv * D
    BT = _pick_bt(T)

    scale = 1.0 / np.sqrt(D).astype(np.float32)
    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)[:, 0]  # (B, Hq, D)
    onehot = (jnp.arange(Hq)[:, None] // G == jnp.arange(Hkv)[None, :])
    qbd = (qs[:, :, None, :] * onehot[None, :, :, None].astype(q.dtype))
    qbd = qbd.reshape(B, Hq, KD)

    k2 = k.astype(q.dtype).reshape(B, T, KD)
    v2 = v.astype(q.dtype).reshape(B, T, KD)
    mask3 = jnp.broadcast_to(mask, (B, 1, T))

    # (Hq, KD) group mask and the (KD, D) tiled identity it feeds
    gmask = jnp.repeat(onehot, D, axis=1).astype(q.dtype)
    proj = jnp.tile(jnp.eye(D, dtype=q.dtype), (Hkv, 1))

    out = _decode_attention_kernel(qbd, k2, v2, mask3, gmask, proj, BT)
    return out[:, None]  # (B, 1, Hq, D)
