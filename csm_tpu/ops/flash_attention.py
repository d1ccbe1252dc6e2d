"""Pallas GQA flash attention (TPU) with position-based causal masking.

The training / prefill hot op: at S=2048 the XLA path materializes
(B, Hq, S, T) float32 scores in HBM (~0.5 GB per batch row for the 1B
backbone); this kernel keeps scores in VMEM per q-block, reading K/V once
per (batch, kv-head) and writing only the (B, S, Hq, D) output.

Design (per /opt/skills/guides/pallas_guide.md):
  * grid (B, Hkv, Sq/BQ): one program covers ALL qpk = Hq/Hkv query heads
    of a kv group, rows stacked into (qpk*BQ, D) operands — at the CSM
    head_dim of 64 the per-head dots are too small to cover program
    overhead, so stacking measures 1.8× fwd / 2.6× fwd+bwd at the
    backbone training shape (scripts/bench_flash_micro.py, v5e);
    each program holds the FULL K/V for its
    kv-head in VMEM (T ≤ 2048+frames ⇒ ≤ ~0.6 MB each in bf16) — the
    kv-head block's index map is constant in the q-block coordinate, so
    Pallas keeps it resident across the inner grid axis instead of
    re-fetching;
  * matmuls run at operand-native MXU precision (``_dot``): bf16 inputs
    take the single-pass bf16×bf16→f32 mode with f32 accumulation;
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

  * dq: grid (B, Hkv, Sq/BQ), head-stacked like the forward, K/V
    VMEM-resident per kv-head; per KV chunk recompute ``p = exp(s − L)``,
    ``ds = p (dO·Vᵀ − D)``, accumulate ``dq += ds·K``;
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


def _dot(a, b, dims):
    """Matmul with f32 accumulation at operand-native MXU speed.

    bf16 operands take the MXU's single-pass bf16×bf16→f32 mode (exact for
    bf16 inputs — casting them to f32 first and running the multi-pass f32
    mode computes the SAME products ~6× slower).  f32 operands keep
    Precision.HIGHEST so the f32 parity oracle stays bit-meaningful."""
    # bf16 gets an EXPLICIT Precision.DEFAULT: None would inherit
    # jax_default_matmul_precision (the test conftest sets "highest",
    # which Mosaic rejects for bf16 operands).
    prec = (
        jax.lax.Precision.HIGHEST
        if a.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    return jax.lax.dot_general(
        a, b, (dims, ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    )


def _stacked_qpos(qpos_ref, qpk, BQ):
    """Query positions for a head-stacked row block: the group's qpk query
    heads share positions, so the (BQ,) block tiles to (qpk*BQ, 1).
    Sublane-axis concatenate — Mosaic can't shape-cast (qpk, BQ) → (R, 1)."""
    qpos = qpos_ref[0, 0].reshape(BQ, 1)
    return jnp.concatenate([qpos] * qpk, axis=0) if qpk > 1 else qpos


def _full_chunk_prefix(kpos_ref, qmin, n_chunks, block_k):
    """Number of LEADING kv chunks fully visible to every row of the q
    block (max key pos <= min query pos): those chunks need no mask
    compare/select — the kernel is VPU-bound, so skipping 2 of the ~8 VPU
    ops per score element on interior chunks is a real win.  Computed as
    a strict prefix (stops at the first non-full chunk) so two plain
    ``fori_loop``s replace a per-chunk branch — per-chunk ``lax.cond``
    selection was measured SLOWER (branches break the chunk pipeline).
    Padding rows (q pos −1) make qmin == −1 ⇒ prefix 0: always correct,
    just unoptimized for blocks containing padding."""

    def count(j, carry):
        in_prefix, n = carry
        kmax = jnp.max(kpos_ref[0, 0, pl.ds(j * block_k, block_k)])
        in_prefix = jnp.logical_and(in_prefix, kmax <= qmin)
        return in_prefix, n + in_prefix.astype(jnp.int32)

    _, n_full = jax.lax.fori_loop(
        0, n_chunks, count, (jnp.bool_(True), jnp.int32(0))
    )
    return n_full


def _kernel(qpos_ref, kpos_ref, q_ref, k_ref, v_ref, o_ref, l_ref, *, scale, block_k):
    """Online-softmax over KV chunks with causal chunk skipping.

    One program handles ALL qpk query heads of one kv group (rows stacked:
    the q block is (qpk, BQ, D) flattened to (qpk*BQ, D)) — 1/qpk-th the
    programs and qpk× larger MXU ops vs a per-q-head grid, and K/V are
    fetched once per group.  K/V for the group are fully VMEM-resident.
    The chunk loop is SPLIT: a leading run of fully-visible chunks runs
    mask-free (no compare/select VPU work), then the diagonal/masked tail
    applies the position mask, with chunks past the block's maximum query
    position skipped entirely (≈2x for causal self-attention).
    Standard flash rescaling erases any contribution accumulated while a
    row was still fully masked (alpha → 0 on the first real chunk).
    """
    qpk, BQ, D = q_ref.shape[2], q_ref.shape[3], q_ref.shape[4]
    T = k_ref.shape[2]
    R = qpk * BQ
    f32 = jnp.float32

    q = q_ref[0, 0].reshape(R, D)  # operand-native dtype; scale post-dot
    qpos = _stacked_qpos(qpos_ref, qpk, BQ)  # (R, 1)
    qmax = jnp.max(qpos)
    qmin = jnp.min(qpos)
    n_chunks = T // block_k

    def accumulate(j, carry, masked):
        m, l, acc = carry
        k = k_ref[0, 0, pl.ds(j * block_k, block_k), :]
        v = v_ref[0, 0, pl.ds(j * block_k, block_k), :]
        s = _dot(q, k, ((1,), (1,))) * scale  # (R, BK) f32
        if masked:
            kpos_c = kpos_ref[0, 0, pl.ds(j * block_k, block_k)]
            s = jnp.where(kpos_c.reshape(1, -1) <= qpos, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + _dot(p.astype(v.dtype), v, ((1,), (0,)))
        return m_new, l, acc

    def chunk_masked(j, carry):
        kpos_c = kpos_ref[0, 0, pl.ds(j * block_k, block_k)]  # (BK,)
        return jax.lax.cond(
            jnp.min(kpos_c) <= qmax,
            lambda c: accumulate(j, c, masked=True),
            lambda c: c,
            carry,
        )

    n_full = _full_chunk_prefix(kpos_ref, qmin, n_chunks, block_k)
    m0 = jnp.full((R, 1), NEG_INF, f32)
    l0 = jnp.zeros((R, 1), f32)
    acc0 = jnp.zeros((R, D), f32)
    carry = jax.lax.fori_loop(
        0, n_full, lambda j, c: accumulate(j, c, masked=False), (m0, l0, acc0)
    )
    m, l, acc = jax.lax.fori_loop(n_full, n_chunks, chunk_masked, carry)
    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).reshape(qpk, BQ, D).astype(
        o_ref.dtype
    )
    # log-sum-exp per row for the backward: p = exp(s - L)
    L = jnp.where(l > 0, m + jnp.log(jnp.maximum(l, 1e-30)), L_EMPTY)
    l_ref[0, 0] = L.reshape(qpk, BQ, 1)


def _pad_to(x, axis, mult, value=0):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _blocks(S, T, block_q):
    BQ = min(block_q, max(128, 1 << (S - 1).bit_length()))
    BK = min(512, max(128, 1 << (T - 1).bit_length()))
    # Long context: the scoped-VMEM stack holds the T-resident K/V copy
    # plus ~8 (qpk·BQ, BK) f32 softmax temporaries; at T≈8.7k and BQ=256
    # that sums to ~17 MiB > the 16 MiB default limit (raising the limit
    # slows the Mosaic compile ~20×, see the pallas_call NOTE).  BQ=128
    # measures within 3% of BQ=256 (BENCHMARKS.md), so shrink the query
    # block instead.
    if T > 6144:
        BQ = min(BQ, 128)
    return BQ, BK


def _grouped_layout(q, k, v, q_pos, kv_pos, BQ, BK):
    """Shared fwd/bwd layout prep: head-grouped tensors + padded positions.

    Returns qt (B, Hkv, qpk, S_pad, D), kt/vt (B, Hkv, T_pad, D), and
    (q_pos_p, kv_pos_p) as (B, 1, len) int32.  GQA query heads h with the
    same h // qpk are adjacent in the (B, Hq, ...) layout, so the group
    reshape is free."""
    B, S, Hq, D = q.shape
    T, Hkv = k.shape[1], k.shape[2]
    qpk = Hq // Hkv
    qt = _pad_to(q.transpose(0, 2, 1, 3), 2, BQ)
    S_pad = qt.shape[2]
    qt = qt.reshape(B, Hkv, qpk, S_pad, D)
    kt = _pad_to(k.transpose(0, 2, 1, 3), 2, BK)
    vt = _pad_to(v.transpose(0, 2, 1, 3), 2, BK)
    # padded kv slots carry a sentinel > any real position => never attended
    kv_pos_p = _pad_to(kv_pos.astype(jnp.int32), 1, BK, value=jnp.int32(1 << 29))
    # padded q rows attend nothing (pos -1): their rows are discarded and
    # they must not defeat the chunk-skip bound (a huge sentinel would)
    q_pos_p = _pad_to(q_pos.astype(jnp.int32), 1, BQ, value=jnp.int32(-1))
    # 3-D so the block's last two dims satisfy the (8, 128) tiling rule
    return qt, kt, vt, q_pos_p[:, None, :], kv_pos_p[:, None, :]


def _flash_fwd(q, k, v, q_pos, kv_pos, block_q):
    B, S, Hq, D = q.shape
    T, Hkv = k.shape[1], k.shape[2]
    qpk = Hq // Hkv
    scale = 1.0 / (D**0.5)

    BQ, BK = _blocks(S, T, block_q)
    qt, kt, vt, q_pos_p, kv_pos_p = _grouped_layout(q, k, v, q_pos, kv_pos, BQ, BK)
    S_pad, T_pad = qt.shape[3], kt.shape[2]
    grid = (B, Hkv, S_pad // BQ)

    out, L = pl.pallas_call(
        functools.partial(_kernel, scale=scale, block_k=BK),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, BQ), lambda b, g, i: (b, 0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, T_pad), lambda b, g, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, qpk, BQ, D), lambda b, g, i: (b, g, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, T_pad, D), lambda b, g, i: (b, g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, T_pad, D), lambda b, g, i: (b, g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 1, qpk, BQ, D), lambda b, g, i: (b, g, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                # trailing singleton keeps the (sublane, lane) block dims legal
                (1, 1, qpk, BQ, 1), lambda b, g, i: (b, g, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Hkv, qpk, S_pad, D), q.dtype),
            jax.ShapeDtypeStruct((B, Hkv, qpk, S_pad, 1), jnp.float32),
        ),
        # NOTE: no raised vmem_limit_bytes here — BQ≤256 fits the 16 MiB
        # default, and raising the limit was measured to slow the Mosaic
        # compile of this kernel from ~30 s to >10 min (BQ=512 needs it
        # and is not worth that cold-start tax; BQ=256 times within 3%).
    )(q_pos_p, kv_pos_p, qt, kt, vt)

    out = out.reshape(B, Hq, S_pad, D)
    L = L.reshape(B, Hq, S_pad, 1)
    # (B, S, Hq, D), (B, Hq, S)
    return out[:, :, :S, :].transpose(0, 2, 1, 3), L[:, :, :S, 0]


def _dq_kernel(
    qpos_ref, kpos_ref, q_ref, k_ref, v_ref, do_ref, l_ref, d_ref, dq_ref,
    *, scale, block_k,
):
    """dq: recompute p = exp(s − L) per KV chunk, dq += ds·K·scale.

    Head-stacked like the forward: one program covers the kv group's qpk
    query heads; K/V stay VMEM-resident across the inner (q-block) grid
    axis; causal chunk skipping via the kv-chunk's minimum position vs the
    q-block's maximum.
    """
    qpk, BQ, D = q_ref.shape[2], q_ref.shape[3], q_ref.shape[4]
    T = k_ref.shape[2]
    R = qpk * BQ
    f32 = jnp.float32

    q = q_ref[0, 0].reshape(R, D)  # native dtype; scale folded in post-dot
    do = do_ref[0, 0].reshape(R, D)
    L = l_ref[0, 0].reshape(R, 1)
    Dr = d_ref[0, 0].reshape(R, 1)
    qpos = _stacked_qpos(qpos_ref, qpk, BQ)  # (R, 1)
    qmax = jnp.max(qpos)
    qmin = jnp.min(qpos)
    n_chunks = T // block_k

    def accumulate(j, acc, masked):
        k = k_ref[0, 0, pl.ds(j * block_k, block_k), :]
        v = v_ref[0, 0, pl.ds(j * block_k, block_k), :]
        s = _dot(q, k, ((1,), (1,))) * scale  # (R, BK) f32
        if masked:
            kpos_c = kpos_ref[0, 0, pl.ds(j * block_k, block_k)]
            s = jnp.where(kpos_c.reshape(1, -1) <= qpos, s, NEG_INF)
        p = jnp.exp(s - L)  # masked/empty rows: exp(−huge) == 0
        dp = _dot(do, v, ((1,), (1,)))  # (R, BK) f32
        ds = p * (dp - Dr)
        return acc + _dot(ds.astype(k.dtype), k, ((1,), (0,))) * scale

    def chunk_masked(j, acc):
        kpos_c = kpos_ref[0, 0, pl.ds(j * block_k, block_k)]  # (BK,)
        return jax.lax.cond(
            jnp.min(kpos_c) <= qmax,
            lambda a: accumulate(j, a, masked=True),
            lambda a: a,
            acc,
        )

    # fully-visible leading chunks run mask-free (see _full_chunk_prefix)
    n_full = _full_chunk_prefix(kpos_ref, qmin, n_chunks, block_k)
    acc0 = jnp.zeros((R, D), f32)
    acc = jax.lax.fori_loop(
        0, n_full, lambda j, a: accumulate(j, a, masked=False), acc0
    )
    acc = jax.lax.fori_loop(n_full, n_chunks, chunk_masked, acc)
    dq_ref[0, 0] = acc.reshape(qpk, BQ, D).astype(dq_ref.dtype)


def _dkv_kernel(
    qpos_ref, kpos_ref, q_ref, do_ref, l_ref, d_ref, k_ref, v_ref,
    dk_ref, dv_ref, *, scale, block_q, qpk,
):
    """dk/dv for one (batch, kv-head, key-block) program.

    The kv-group's full Q/dO/L/D rows are VMEM-resident (their index maps
    are constant in the key-block grid axis); the GQA reduction over the
    group's ``qpk`` query heads happens inside the matmuls — per q chunk
    the group's heads are stacked into one (qpk*BQc, ·) operand, so
    ``dv += pᵀ·dO`` / ``dk += dsᵀ·q`` sum over heads automatically.  A q
    chunk whose maximum position is below the key block's minimum
    contributes nothing and is skipped (the causal transpose of the
    forward skip).
    """
    BK = k_ref.shape[2]
    D = k_ref.shape[3]
    S = q_ref.shape[3]
    R = qpk * block_q
    f32 = jnp.float32

    k = k_ref[0, 0]  # (BK, D) native dtype
    v = v_ref[0, 0]
    kpos = kpos_ref[0, 0].reshape(1, BK)
    kmin = jnp.min(kpos)
    kmax = jnp.max(kpos)
    n_chunks = S // block_q

    def accumulate(i, carry, masked):
        dk_acc, dv_acc = carry
        q = q_ref[0, 0, :, pl.ds(i * block_q, block_q), :].reshape(R, D)
        do = do_ref[0, 0, :, pl.ds(i * block_q, block_q), :].reshape(R, D)
        L = l_ref[0, 0, :, pl.ds(i * block_q, block_q), :].reshape(R, 1)
        Dr = d_ref[0, 0, :, pl.ds(i * block_q, block_q), :].reshape(R, 1)
        s = _dot(q, k, ((1,), (1,))) * scale  # (R, BK) f32
        if masked:
            qpos_c = qpos_ref[0, 0, pl.ds(i * block_q, block_q)]
            qpos_2d = qpos_c.reshape(block_q, 1)
            qpos_s = (
                jnp.concatenate([qpos_2d] * qpk, axis=0) if qpk > 1 else qpos_2d
            )
            s = jnp.where(kpos <= qpos_s, s, NEG_INF)
        p = jnp.exp(s - L)
        dv_acc = dv_acc + _dot(
            p.astype(do.dtype), do, ((0,), (0,))
        )  # pᵀ·dO: (BK, D), summed over the group's heads
        dp = _dot(do, v, ((1,), (1,)))  # (R, BK) f32
        ds = p * (dp - Dr)
        dk_acc = dk_acc + _dot(
            ds.astype(q.dtype), q, ((0,), (0,))
        ) * scale  # dsᵀ·q·scale: (BK, D)
        return dk_acc, dv_acc

    def chunk_masked(i, carry):
        qpos_c = qpos_ref[0, 0, pl.ds(i * block_q, block_q)]  # (BQc,)
        return jax.lax.cond(
            jnp.max(qpos_c) >= kmin,
            lambda c: accumulate(i, c, masked=True),
            lambda c: c,
            carry,
        )

    # Causal transpose of the forward's prefix split: q chunks whose
    # MINIMUM position is >= the key block's max are fully visible and
    # form a SUFFIX (q positions ascend; padding rows carry −1 so a
    # padded tail chunk conservatively stays in the masked run).
    def count(t, carry):
        in_suffix, n = carry
        i = n_chunks - 1 - t
        qmin_c = jnp.min(qpos_ref[0, 0, pl.ds(i * block_q, block_q)])
        in_suffix = jnp.logical_and(in_suffix, qmin_c >= kmax)
        return in_suffix, n + in_suffix.astype(jnp.int32)

    _, n_suffix = jax.lax.fori_loop(
        0, n_chunks, count, (jnp.bool_(True), jnp.int32(0))
    )
    split = n_chunks - n_suffix
    z = jnp.zeros((BK, D), f32)
    carry = jax.lax.fori_loop(0, split, chunk_masked, (z, z))
    dk, dv = jax.lax.fori_loop(
        split, n_chunks, lambda i, c: accumulate(i, c, masked=False), carry
    )
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

    BQ, BK = _blocks(S, T, block_q)
    qt, kt, vt, q_pos_p, kv_pos_p = _grouped_layout(q, k, v, q_pos, kv_pos, BQ, BK)
    S_pad, T_pad = qt.shape[3], kt.shape[2]
    dot = _pad_to(g.transpose(0, 2, 1, 3), 2, BQ).reshape(B, Hkv, qpk, S_pad, D)
    # D row-sums: Σ_d dO·O per (B, S, Hq) — cheap elementwise, done in XLA
    Dr = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    if g_lse is not None:  # g_lse is (B, Hq, S); Dr is (B, S, Hq) here
        Dr = Dr - g_lse.astype(jnp.float32).transpose(0, 2, 1)
    Dr = _pad_to(Dr.transpose(0, 2, 1), 2, BQ).reshape(B, Hkv, qpk, S_pad, 1)
    # padded rows: p == 0
    Lp = _pad_to(L, 2, BQ, value=L_EMPTY).reshape(B, Hkv, qpk, S_pad, 1)

    grp_q = pl.BlockSpec(
        (1, 1, qpk, BQ, D), lambda b, g, i: (b, g, 0, i, 0), memory_space=pltpu.VMEM
    )
    grp_q1 = pl.BlockSpec(
        (1, 1, qpk, BQ, 1), lambda b, g, i: (b, g, 0, i, 0), memory_space=pltpu.VMEM
    )
    grp_kv = pl.BlockSpec(
        (1, 1, T_pad, D), lambda b, g, i: (b, g, 0, 0), memory_space=pltpu.VMEM
    )

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, block_k=BK),
        grid=(B, Hkv, S_pad // BQ),
        in_specs=[
            pl.BlockSpec((1, 1, BQ), lambda b, g, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T_pad), lambda b, g, i: (b, 0, 0), memory_space=pltpu.VMEM),
            grp_q, grp_kv, grp_kv, grp_q, grp_q1, grp_q1,
        ],
        out_specs=grp_q,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, qpk, S_pad, D), q.dtype),
    )(q_pos_p, kv_pos_p, qt, kt, vt, dot, Lp, Dr)
    dq = dq.reshape(B, Hq, S_pad, D)

    # dkv: the group's FULL q/do/L/D rows are resident (constant in j)
    full_q = pl.BlockSpec(
        (1, 1, qpk, S_pad, D), lambda b, g, j: (b, g, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    full_q1 = pl.BlockSpec(
        (1, 1, qpk, S_pad, 1), lambda b, g, j: (b, g, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    kv_blk = pl.BlockSpec(
        (1, 1, BK, D), lambda b, g, j: (b, g, j, 0), memory_space=pltpu.VMEM
    )
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, block_q=BQ, qpk=qpk),
        grid=(B, Hkv, T_pad // BK),
        in_specs=[
            pl.BlockSpec((1, 1, S_pad), lambda b, g, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BK), lambda b, g, j: (b, 0, j), memory_space=pltpu.VMEM),
            full_q, full_q, full_q1, full_q1, kv_blk, kv_blk,
        ],
        out_specs=(kv_blk, kv_blk),
        out_shape=(
            jax.ShapeDtypeStruct((B, Hkv, T_pad, D), k.dtype),
            jax.ShapeDtypeStruct((B, Hkv, T_pad, D), v.dtype),
        ),
        # the head-stacked chunk keeps several (qpk·BQ, BK) f32
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
