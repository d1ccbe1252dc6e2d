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

Differentiation (round-2): full Pallas backward — the forward also emits
the per-row log-sum-exp ``L = m + log l`` so the backward never
materializes (B, Hq, S, T) scores in HBM either.  Two kernels:

  * dq: grid (B, Hq, Sq/BQ), K/V VMEM-resident per kv-head (as forward);
    per KV chunk recompute ``p = exp(s − L)``, ``ds = p (dO·Vᵀ − D)``,
    accumulate ``dq += ds·K``;
  * dk/dv: grid (B, Hkv, T/BK), the kv-group's Q/dO/L/D VMEM-resident;
    per q chunk accumulate ``dv += pᵀ dO`` and ``dk += dsᵀ q·scale``
    summing over the group's query heads (the GQA reduction).

Causal chunk skipping applies on both sides (a q chunk earlier than the
k block contributes nothing and vice versa).  Gradient parity vs the XLA
reference attention is tested in tests/test_flash_attention.py; set
``CSM_TPU_FLASH_XLA_BWD=1`` to fall back to the XLA-recompute VJP.
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


L_EMPTY = 1e30  # L sentinel for fully-masked rows: exp(s - L_EMPTY) == 0


def _kernel(qpos_ref, kpos_ref, q_ref, k_ref, v_ref, o_ref, l_ref, *, scale, block_k):
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
    m, l, acc = jax.lax.fori_loop(0, T // block_k, chunk, (m0, l0, acc0))
    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    # log-sum-exp per row for the backward: p = exp(s - L)
    L = jnp.where(l > 0, m + jnp.log(jnp.maximum(l, 1e-30)), L_EMPTY)
    l_ref[0, 0] = L  # (BQ, 1)


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

    out, L = pl.pallas_call(
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
        out_specs=(
            pl.BlockSpec(
                (1, 1, BQ, D), lambda b, h, i: (b, h, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                # trailing singleton keeps the (sublane, lane) block dims legal
                (1, 1, BQ, 1), lambda b, h, i: (b, h, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Hq, S_pad, D), q.dtype),
            jax.ShapeDtypeStruct((B, Hq, S_pad, 1), jnp.float32),
        ),
    )(q_pos_p, kv_pos_p, qt, kt, vt)

    # (B, S, Hq, D), (B, Hq, S)
    return out[:, :, :S, :].transpose(0, 2, 1, 3), L[:, :, :S, 0]


def _dq_kernel(
    qpos_ref, kpos_ref, q_ref, k_ref, v_ref, do_ref, l_ref, d_ref, dq_ref,
    *, scale, block_k,
):
    """dq: recompute p = exp(s − L) per KV chunk, dq += ds·K·scale.

    Same residency plan as the forward: K/V for this program's kv-head stay
    in VMEM across the inner (q-block) grid axis; causal chunk skipping via
    the kv-chunk's minimum position vs the q-block's maximum.
    """
    BQ = q_ref.shape[2]
    D = q_ref.shape[3]
    T = k_ref.shape[2]
    f32 = jnp.float32
    hi = jax.lax.Precision.HIGHEST

    qs = q_ref[0, 0].astype(f32) * scale  # (BQ, D)
    do = do_ref[0, 0].astype(f32)  # (BQ, D)
    L = l_ref[0, 0]  # (BQ, 1)
    Dr = d_ref[0, 0]  # (BQ, 1)
    qpos = qpos_ref[0, 0].reshape(BQ, 1)
    qmax = jnp.max(qpos)

    def chunk(j, acc):
        kpos_c = kpos_ref[0, 0, pl.ds(j * block_k, block_k)]  # (BK,)

        def compute(acc):
            k = k_ref[0, 0, pl.ds(j * block_k, block_k), :].astype(f32)
            v = v_ref[0, 0, pl.ds(j * block_k, block_k), :].astype(f32)
            s = jax.lax.dot_general(
                qs, k, (((1,), (1,)), ((), ())),
                preferred_element_type=f32, precision=hi,
            )  # (BQ, BK)
            s = jnp.where(kpos_c.reshape(1, -1) <= qpos, s, NEG_INF)
            p = jnp.exp(s - L)  # masked/empty rows: exp(−huge) == 0
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=f32, precision=hi,
            )  # (BQ, BK)
            ds = p * (dp - Dr)
            return acc + jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())),
                preferred_element_type=f32, precision=hi,
            ) * scale

        return jax.lax.cond(jnp.min(kpos_c) <= qmax, compute, lambda a: a, acc)

    acc0 = jnp.zeros((BQ, D), f32)
    acc = jax.lax.fori_loop(0, T // block_k, chunk, acc0)
    dq_ref[0, 0] = acc.astype(dq_ref.dtype)


def _dkv_kernel(
    qpos_ref, kpos_ref, q_ref, do_ref, l_ref, d_ref, k_ref, v_ref,
    dk_ref, dv_ref, *, scale, block_q, qpk,
):
    """dk/dv for one (batch, kv-head, key-block) program.

    The kv-group's full Q/dO/L/D rows are VMEM-resident (their index maps
    are constant in the key-block grid axis); the GQA reduction over the
    group's ``qpk`` query heads is a static Python loop.  A q chunk whose
    maximum position is below the key block's minimum contributes nothing
    and is skipped (the causal transpose of the forward skip).
    """
    BK = k_ref.shape[2]
    D = k_ref.shape[3]
    S = q_ref.shape[2]
    f32 = jnp.float32
    hi = jax.lax.Precision.HIGHEST

    k = k_ref[0, 0].astype(f32)  # (BK, D)
    v = v_ref[0, 0].astype(f32)
    kpos = kpos_ref[0, 0].reshape(1, BK)
    kmin = jnp.min(kpos)

    def chunk(i, carry):
        qpos_c = qpos_ref[0, 0, pl.ds(i * block_q, block_q)].reshape(block_q, 1)

        def compute(carry):
            dk_acc, dv_acc = carry
            for h in range(qpk):
                qs = q_ref[0, h, pl.ds(i * block_q, block_q), :].astype(f32) * scale
                do = do_ref[0, h, pl.ds(i * block_q, block_q), :].astype(f32)
                L = l_ref[0, h, pl.ds(i * block_q, block_q), :]  # (BQc, 1)
                Dr = d_ref[0, h, pl.ds(i * block_q, block_q), :]  # (BQc, 1)
                s = jax.lax.dot_general(
                    qs, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32, precision=hi,
                )  # (BQc, BK)
                s = jnp.where(kpos <= qpos_c, s, NEG_INF)
                p = jnp.exp(s - L)
                dv_acc = dv_acc + jax.lax.dot_general(
                    p, do, (((0,), (0,)), ((), ())),
                    preferred_element_type=f32, precision=hi,
                )  # pᵀ·dO: (BK, D)
                dp = jax.lax.dot_general(
                    do, v, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32, precision=hi,
                )  # (BQc, BK)
                ds = p * (dp - Dr)
                dk_acc = dk_acc + jax.lax.dot_general(
                    ds, qs, (((0,), (0,)), ((), ())),
                    preferred_element_type=f32, precision=hi,
                )  # dsᵀ·(q·scale): (BK, D)
            return dk_acc, dv_acc

        return jax.lax.cond(jnp.max(qpos_c) >= kmin, compute, lambda c: c, carry)

    z = jnp.zeros((BK, D), f32)
    dk, dv = jax.lax.fori_loop(0, S // block_q, chunk, (z, z))
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _flash_bwd_pallas(q, k, v, q_pos, kv_pos, out, L, g, block_q, g_lse=None):
    """dq/dk/dv via the Pallas kernels.

    ``g_lse`` — optional (B, Hq, S) cotangent of the log-sum-exp output
    (flash_gqa_attention_with_lse): since ∂lse_i/∂s_ij = p_ij, it folds
    into the row term — ds = p·(dP − (D − g_lse))."""
    B, S, Hq, D = q.shape
    T, Hkv = k.shape[1], k.shape[2]
    qpk = Hq // Hkv
    scale = 1.0 / (D**0.5)

    BQ = min(block_q, max(128, 1 << (S - 1).bit_length()))
    BK = min(512, max(128, 1 << (T - 1).bit_length()))

    qt = _pad_to(q.transpose(0, 2, 1, 3), 2, BQ)
    dot = _pad_to(g.transpose(0, 2, 1, 3), 2, BQ)  # dO
    kt = _pad_to(k.transpose(0, 2, 1, 3), 2, BK)
    vt = _pad_to(v.transpose(0, 2, 1, 3), 2, BK)
    # D row-sums: Σ_d dO·O per (B, S, Hq) — cheap elementwise, done in XLA
    Dr = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    if g_lse is not None:  # g_lse is (B, Hq, S); Dr is (B, S, Hq) here
        Dr = Dr - g_lse.astype(jnp.float32).transpose(0, 2, 1)
    Dr = _pad_to(Dr.transpose(0, 2, 1), 2, BQ)[..., None]  # (B, Hq, S_pad, 1)
    Lp = _pad_to(L, 2, BQ, value=L_EMPTY)[..., None]  # padded rows: p == 0
    kv_pos_p = _pad_to(kv_pos.astype(jnp.int32), 1, BK, value=jnp.int32(1 << 29))
    q_pos_p = _pad_to(q_pos.astype(jnp.int32), 1, BQ, value=jnp.int32(-1))
    q_pos_p = q_pos_p[:, None, :]
    kv_pos_p = kv_pos_p[:, None, :]

    S_pad, T_pad = qt.shape[2], kt.shape[2]

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, block_k=BK),
        grid=(B, Hq, S_pad // BQ),
        in_specs=[
            pl.BlockSpec((1, 1, BQ), lambda b, h, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T_pad), lambda b, h, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BQ, D), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, T_pad, D), lambda b, h, i, qpk=qpk: (b, h // qpk, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, T_pad, D), lambda b, h, i, qpk=qpk: (b, h // qpk, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1, BQ, D), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BQ, 1), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BQ, 1), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, BQ, D), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hq, S_pad, D), q.dtype),
    )(q_pos_p, kv_pos_p, qt, kt, vt, dot, Lp, Dr)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, block_q=BQ, qpk=qpk),
        grid=(B, Hkv, T_pad // BK),
        in_specs=[
            pl.BlockSpec((1, 1, S_pad), lambda b, h, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BK), lambda b, h, j: (b, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, qpk, S_pad, D), lambda b, h, j: (b, h, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, qpk, S_pad, D), lambda b, h, j: (b, h, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, qpk, S_pad, 1), lambda b, h, j: (b, h, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, qpk, S_pad, 1), lambda b, h, j: (b, h, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 1, BK, D), lambda b, h, j: (b, h, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BK, D), lambda b, h, j: (b, h, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, BK, D), lambda b, h, j: (b, h, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BK, D), lambda b, h, j: (b, h, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Hkv, T_pad, D), k.dtype),
            jax.ShapeDtypeStruct((B, Hkv, T_pad, D), v.dtype),
        ),
        # the qpk-way unrolled head loop keeps several (BQ, BK) f32
        # temporaries live — needs more than the default 16 MiB scoped
        # VMEM budget (v5e has 128 MiB)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
    )(q_pos_p, kv_pos_p, qt, dot, Lp, Dr, kt, vt)

    return (
        dq[:, :, :S].transpose(0, 2, 1, 3),
        dk[:, :, :T].transpose(0, 2, 1, 3),
        dv[:, :, :T].transpose(0, 2, 1, 3),
    )


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
    out, _ = _flash_fwd(q, k, v, q_pos, kv_pos, block_q)
    return out


def _fwd(q, k, v, q_pos, kv_pos, block_q):
    if kv_pos.ndim == 1:
        kv_pos = jnp.broadcast_to(kv_pos[None, :], (q.shape[0], kv_pos.shape[0]))
    out, L = _flash_fwd(q, k, v, q_pos, kv_pos, block_q)
    return out, (q, k, v, q_pos, kv_pos, out, L)


def _bwd(block_q, res, g):
    import os

    q, k, v, q_pos, kv_pos, out, L = res
    if os.environ.get("CSM_TPU_FLASH_XLA_BWD"):
        # fallback: recompute through the XLA reference attention
        mask = causal_mask_from_positions(q_pos, kv_pos)

        def ref(q, k, v):
            return gqa_attention(q, k, v, mask)

        _, vjp = jax.vjp(ref, q, k, v)
        dq, dk, dv = vjp(g)
        return dq, dk, dv, None, None

    dq, dk, dv = _flash_bwd_pallas(q, k, v, q_pos, kv_pos, out, L, g, block_q)
    return dq, dk, dv, None, None


flash_gqa_attention.defvjp(_fwd, _bwd)


@jax.custom_vjp
def flash_gqa_attention_with_lse(q, k, v, q_pos, kv_pos):
    """Flash attention that also returns the per-row log-sum-exp.

    For split-softmax consumers (ring attention: csm_tpu/parallel/
    ring_attention.py) that merge per-chunk partials and therefore need
    ``lse`` — and need gradients to flow through BOTH outputs.

    Returns (out (B, S, Hq, D) in q.dtype, lse (B, Hq, S) f32 — rows with
    no attendable keys carry L_EMPTY).  kv_pos must be (B, T).
    """
    out, L = _flash_fwd(q, k, v, q_pos, kv_pos, DEFAULT_BLOCK_Q)
    return out, L


def _fwd_lse(q, k, v, q_pos, kv_pos):
    out, L = _flash_fwd(q, k, v, q_pos, kv_pos, DEFAULT_BLOCK_Q)
    return (out, L), (q, k, v, q_pos, kv_pos, out, L)


def _bwd_lse(res, g):
    g_out, g_L = g
    q, k, v, q_pos, kv_pos, out, L = res
    dq, dk, dv = _flash_bwd_pallas(
        q, k, v, q_pos, kv_pos, out, L, g_out, DEFAULT_BLOCK_Q, g_lse=g_L
    )
    return dq, dk, dv, None, None


flash_gqa_attention_with_lse.defvjp(_fwd_lse, _bwd_lse)


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
