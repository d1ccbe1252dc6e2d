"""Ring attention: sequence-parallel exact attention over a mesh axis.

Long-context extension beyond the reference (SURVEY.md §5.7 — the
reference caps context at 2048 tokens, src/csm/generator.py:118's
max_seq_len): shards the SEQUENCE over a ``seq`` mesh axis so context
length scales with device count, with exact (not windowed) causal
attention.

Design (the TPU way — "How to Scale Your Model" ring-attention recipe):

  * each device holds S/n query rows and T/n key/value rows;
  * n ring steps: attend the local queries to the resident KV chunk,
    then rotate the KV chunk (+ its positions) to the ICI neighbor with
    ``jax.lax.ppermute`` — compute overlaps the permute since XLA
    schedules the DMA asynchronously;
  * partial results merge in log-space: each chunk yields a normalized
    output plus its row log-sum-exp; the running pair combines exactly
    (the same split-softmax identity the flash kernel uses per block);
  * causal masking falls out of the SAME position contract as the rest
    of the stack (``kv_pos <= q_pos``, PAD_POS sentinel for dead slots)
    — nothing about the ring is order-sensitive, so rotation needs no
    causal bookkeeping, only the position compare;
  * per-chunk attention uses the Pallas flash kernel on TPU
    (csm_tpu/ops/flash_attention.py) and an XLA fallback elsewhere, so
    each device also never materializes its (S/n, T/n) score tile in HBM
    when the kernel path is active.

The ring step count equals the axis size (static), so the loop is a
``lax.scan`` — reverse-mode differentiable out of the box.  Gradients
recompute chunk attention (O(T/n) extra FLOPs per step) rather than
storing score tiles.

Known trade-off (documented in docs/architecture.md): with a contiguous
sequence split, causal attention gives device 0 the least work and
device n-1 the most — a zigzag/striped layout rebalances this and can be
layered on later without changing the merge math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from csm_tpu.ops.attention import causal_mask_from_positions

SEQ_AXIS = "seq"

_NEG_INF = float("-inf")


def _xla_chunk_attention(q, k, v, q_pos, kv_pos):
    """(out, lse) for one KV chunk; out normalized per-chunk, f32.

    lse[b, s, h] = log Σ_j exp(s_ij); −inf for fully-masked rows (whose
    out rows are zero) — the merge-friendly convention.
    """
    B, S, Hq, D = q.shape
    T, Hkv = k.shape[1], k.shape[2]
    G = Hq // Hkv
    f32 = jnp.float32
    scale = 1.0 / (D**0.5)

    qf = q.astype(f32) * scale
    kf = jnp.repeat(k.astype(f32), G, axis=2)  # (B, T, Hq, D)
    vf = jnp.repeat(v.astype(f32), G, axis=2)
    s = jnp.einsum("bshd,bthd->bsht", qf, kf)  # (B, S, Hq, T)
    mask = causal_mask_from_positions(q_pos, kv_pos)  # (B, S, T)
    s = jnp.where(mask[:, :, None, :], s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.exp(s - m_safe)
    l = jnp.sum(p, axis=-1, keepdims=True)  # (B, S, Hq, 1)
    out = jnp.einsum("bsht,bthd->bshd", p, vf) / jnp.maximum(l, 1e-30)
    lse = jnp.where(l[..., 0] > 0, m_safe[..., 0] + jnp.log(jnp.maximum(l[..., 0], 1e-30)), _NEG_INF)
    return out, lse


def _flash_chunk_attention(q, k, v, q_pos, kv_pos):
    """Pallas-kernel chunk attention normalized to the merge convention.

    Uses the custom-VJP entry point (NOT the raw pallas forward) so the
    ring differentiates on TPU — the lse cotangent from the log-space
    merge flows into the kernel backward."""
    from csm_tpu.ops.flash_attention import L_EMPTY, flash_gqa_attention_with_lse

    out, L = flash_gqa_attention_with_lse(q, k, v, q_pos, kv_pos)
    lse = jnp.transpose(L, (0, 2, 1))  # (B, S, Hq)
    lse = jnp.where(lse > L_EMPTY / 2, _NEG_INF, lse)
    return out.astype(jnp.float32), lse


def _chunk_attention(q, k, v, q_pos, kv_pos):
    from csm_tpu.ops.flash_attention import flash_available

    if flash_available():
        return _flash_chunk_attention(q, k, v, q_pos, kv_pos)
    return _xla_chunk_attention(q, k, v, q_pos, kv_pos)


def ring_attention(q, k, v, q_pos, kv_pos, *, axis_name: str = SEQ_AXIS):
    """Exact GQA causal attention with KV rotating around ``axis_name``.

    Call INSIDE shard_map; every array is the local shard:
        q: (B, S/n, Hq, D); k/v: (B, T/n, Hkv, D);
        q_pos: (B, S/n) int; kv_pos: (B, T/n) int (PAD_POS for dead slots).

    Returns the local (B, S/n, Hq, D) output in q.dtype — numerically the
    single-device ``gqa_attention`` with the positions-derived causal mask.
    """
    n = jax.lax.axis_size(axis_name)
    fwd = [(j, (j + 1) % n) for j in range(n)]

    def step(carry, j):
        acc, lse, k_c, v_c, kpos_c = carry
        o_i, lse_i = _chunk_attention(q, k_c, v_c, q_pos, kpos_c.astype(jnp.int32))
        lse_new = jnp.logaddexp(lse, lse_i)
        # exp(−inf − (−inf)) guards: fully-masked-so-far rows stay zero
        a_old = jnp.where(jnp.isfinite(lse_new), jnp.exp(lse - lse_new), 0.0)
        a_new = jnp.where(jnp.isfinite(lse_new), jnp.exp(lse_i - lse_new), 0.0)
        acc = acc * a_old[..., None] + o_i * a_new[..., None]

        def rotate(ops):
            return tuple(jax.lax.ppermute(x, axis_name, fwd) for x in ops)

        # the last step's rotation would be discarded — skip the ICI traffic
        k_c, v_c, kpos_c = jax.lax.cond(
            j < n - 1, rotate, lambda ops: ops, (k_c, v_c, kpos_c)
        )
        return (acc, lse_new, k_c, v_c, kpos_c), None

    B, S, Hq, D = q.shape
    acc0 = jnp.zeros((B, S, Hq, D), jnp.float32)
    lse0 = jnp.full((B, S, Hq), _NEG_INF, jnp.float32)
    (acc, _, _, _, _), _ = jax.lax.scan(
        step, (acc0, lse0, k, v, kv_pos), jnp.arange(n)
    )
    return acc.astype(q.dtype)


def make_sp_mesh(devices=None, seq_parallel: int | None = None) -> Mesh:
    """A (data, seq) mesh; ``seq_parallel`` defaults to all devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    sp = seq_parallel or n
    if n % sp != 0:
        raise ValueError(f"{n} devices not divisible by seq_parallel={sp}")
    arr = np.asarray(devices).reshape(n // sp, sp)
    return Mesh(arr, ("data", SEQ_AXIS))


def zigzag_perm(S: int, n: int) -> np.ndarray:
    """Zigzag sequence layout: device d holds chunks (d, 2n-1-d) of 2n.

    A contiguous causal split gives device 0 the least attention work and
    device n-1 the most (~2x at large n); pairing an early chunk with its
    mirror-image late chunk equalizes every device's masked-score count.
    Masking is position-based throughout this module, so a layout is just
    a permutation of the sequence dim — the ring math is unchanged.

    Returns perm with ``x[:, perm]`` laid out so an even S/n split puts
    chunks (d, 2n-1-d) on device d.  S must divide by 2n.
    """
    if S % (2 * n):
        raise ValueError(f"S={S} must divide by 2*seq={2 * n} for zigzag")
    c = S // (2 * n)
    chunks = np.arange(S).reshape(2 * n, c)
    order = []
    for d in range(n):
        order.append(chunks[d])
        order.append(chunks[2 * n - 1 - d])
    return np.concatenate(order)


def sharded_ring_attention(mesh: Mesh, q, k, v, q_pos, kv_pos,
                           layout: str = "contiguous"):
    """shard_map wrapper: global arrays in, global out, sequence over
    ``seq`` (batch over ``data`` when the mesh has one).

    q: (B, S, Hq, D); k/v: (B, T, Hkv, D); q_pos: (B, S); kv_pos: (B, T)
    or (T,).  S and T must divide by the ``seq`` axis size.

    ``layout`` — "contiguous" or "zigzag" (balanced causal work per
    device; requires S == T and S % (2*seq) == 0).  The permutation is
    applied at the global level (GSPMD reshards) and undone on the
    output, so results are identical either way.
    """
    if kv_pos.ndim == 1:
        kv_pos = jnp.broadcast_to(kv_pos[None, :], (q.shape[0], kv_pos.shape[0]))
    kv_pos = kv_pos.astype(jnp.int32)

    perm = None
    if layout == "zigzag":
        S, T = q.shape[1], k.shape[1]
        if S != T:
            raise ValueError("zigzag layout requires S == T")
        perm = jnp.asarray(zigzag_perm(S, mesh.shape[SEQ_AXIS]))
        q, k, v = q[:, perm], k[:, perm], v[:, perm]
        q_pos, kv_pos = q_pos[:, perm], kv_pos[:, perm]
    elif layout != "contiguous":
        raise ValueError(f"unknown layout {layout!r}")

    data = "data" if "data" in mesh.axis_names else None
    qspec = P(data, SEQ_AXIS, None, None)
    pspec = P(data, SEQ_AXIS)
    f = jax.shard_map(
        functools.partial(ring_attention, axis_name=SEQ_AXIS),
        mesh=mesh,
        in_specs=(qspec, qspec, qspec, pspec, pspec),
        out_specs=qspec,
        check_vma=False,
    )
    out = f(q, k, v, q_pos, kv_pos)
    if perm is not None:
        inv = jnp.zeros_like(perm).at[perm].set(jnp.arange(perm.shape[0]))
        out = out[:, inv]
    return out
