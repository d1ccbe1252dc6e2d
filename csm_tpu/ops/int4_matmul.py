"""Pallas fused-dequant matmul for grouped int4 weights (TPU).

Why a kernel: XLA fuses int8→bf16 converts into matmul operand loads,
but a 4-bit nibble unpack (shift/mask + interleave) is NOT fused — the
unpacked weights materialize in HBM and the "int4" path runs slower than
bf16 (measured, scripts/bench_int4_probe.py).  Single-stream decode is
weight-bandwidth-bound (BENCHMARKS.md), so streaming 0.5 B/weight needs
the unpack to happen in VMEM, which only a custom kernel can do.

Format (csm_tpu/utils/quantize.quantize_weight_int4): offset-binary
nibbles (u = q + 8, q ∈ [-7,7]) packed SPLIT-HALF WITHIN EACH GROUP
along the input axis — packed row g·gs/2 + r holds input row g·gs + r in
the low nibble and input row g·gs + gs/2 + r in the high nibble, with
per-(group, out-channel) bf16 scales.  The packing is chosen so the
kernel never interleaves or reshapes: per group it dots the two
contiguous half-group x slices against the unpacked lo/hi planes and
removes the +8 offset with a rank-1 correction,

    x @ W = Σ_g  s_g ⊙ (x_lo·(U&15) + x_hi·(U>>4) − 8·Σ_k x_g[k])

which costs ~1.5 VPU ops per weight (one mask OR one shift per nibble,
plus the convert) — inside the VPU budget at HBM line rate.

The kernel contracts a TRANSPOSED x (K, M): group slices then run along
sublanes (offset multiples of gs/2 ≥ 32), never along lanes.  The grid
is (N/BN,); each program keeps its full (K/2, BN) packed block plus the
whole x column in VMEM and loops the groups with an f32 accumulator.

Decode shapes (M ≤ ~64 rows) use the kernel; larger M (prefill,
training-shape) fall back to an XLA dequant matmul — at those shapes the
op is MXU-bound, so materializing bf16 weights once per layer is free.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from csm_tpu.utils.quantize import dequantize_weight_int4

# Above this many rows the XLA dequant path wins (MXU-bound regime).
MAX_KERNEL_ROWS = 64


def _pick_bn(N: int):
    for bn in (512, 256, 128):
        if N % bn == 0:
            return bn
    return None  # kernel can't tile this out dim -> XLA fallback


def _kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_blocks: int,
            groups_per_block: int):
    """One K-block × N-block step: acc += Σ_g s_g ⊙ (x_g · W4_g).

    Grid (N/BN, K/BK), K-blocks innermost.  The packed block unpacks with
    ONE hardware sub-byte bitcast — uint8 (BK/2, BN) → int4 (BK, BN) in
    exactly the stored element order (adjacent input rows, low nibble
    first) — then each group runs an MXU dot and its scale multiplies the
    (M, BN) RESULT, so per-weight VPU work is just the int4→bf16 convert.
    (A mask/shift arithmetic unpack measured VPU-bound at ~2.5 simple
    ops/weight — slower than reading int8; scaling the unpacked weights
    instead of the dot results added another op/weight and was slower
    still.  Both variants are in git history.)

    The f32 accumulator lives in VMEM scratch across the K steps; Pallas
    double-buffers the packed-weight DMAs across the grid.

    x_ref: (BK, M) transposed activation block; w_ref: (BK/2, BN) packed
    uint8; s_ref: (gpb, 1, BN) group scales (3D so the per-group row is a
    leading-dim slice, free of the sublane-divisibility rule);
    o_ref, acc_ref: (M, BN).
    """
    kb = pl.program_id(1)
    dtype = x_ref.dtype
    gs = x_ref.shape[0] // groups_per_block

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    u4 = pltpu.bitcast(w_ref[:], jnp.int4)  # (BK, BN) int4, natural order
    dims = (((0,), (0,)), ((), ()))
    acc = acc_ref[:]
    for i in range(groups_per_block):
        wg = u4[i * gs:(i + 1) * gs, :].astype(dtype)
        t = jax.lax.dot_general(x_ref[i * gs:(i + 1) * gs, :], wg, dims,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.DEFAULT)
        acc = acc + t * s_ref[i].astype(jnp.float32)
    acc_ref[:] = acc

    @pl.when(kb == n_blocks - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


# target bytes per packed-weight DMA; K-blocks span whole groups
_TARGET_BLOCK_BYTES = 256 * 1024


@functools.partial(jax.jit, static_argnames=("block_n",))
def _int4_matmul_kernel(x, w4p, scale4, block_n=None):
    M, K = x.shape
    K2, N = w4p.shape
    G = scale4.shape[0]
    gs = K // G
    gsh = gs // 2
    BN = block_n or _pick_bn(N)
    gpb = max(1, min(G, (2 * _TARGET_BLOCK_BYTES) // (gs * BN)))
    while G % gpb:
        gpb -= 1
    BK = gpb * gs
    n_blocks = G // gpb
    xt = x.T  # (K, M): group slices run along sublanes in the kernel
    kernel = functools.partial(_kernel, n_blocks=n_blocks,
                               groups_per_block=gpb)
    return pl.pallas_call(
        kernel,
        grid=(N // BN, n_blocks),
        in_specs=[
            pl.BlockSpec((BK, M), lambda j, kb: (kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BK // 2, BN), lambda j, kb: (kb, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb, 1, BN), lambda j, kb: (kb, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, BN), lambda j, kb: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((M, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(xt, w4p, scale4.reshape(G, 1, N))


def _xla_reference(x, q):
    """Dequant-then-matmul (exact same math; for prefill / parity tests)."""
    w = dequantize_weight_int4(q, x.dtype)
    return x @ w


@jax.custom_vjp
def int4_matmul(x: jnp.ndarray, q: dict) -> jnp.ndarray:
    """(..., K) @ grouped-int4 (K, N) → (..., x.dtype).

    Leading dims are flattened to M rows; decode-sized M runs the Pallas
    fused-dequant kernel, larger M the XLA dequant path (MXU-bound).
    Set CSM_TPU_NO_INT4_KERNEL=1 to force the XLA path everywhere.

    Differentiable in ``x`` (custom VJP: dx = g · Wᵀ through the XLA
    dequant — the int4-base LoRA mode trains float adapters against a
    frozen int4 base, so the weights themselves never need gradients;
    their cotangents are zeros/float0).
    """
    return _int4_matmul_impl(x, q)


def _int4_matmul_impl(x: jnp.ndarray, q: dict) -> jnp.ndarray:
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    G = q["scale4"].shape[0]
    gs = K // G
    use_kernel = (
        M <= MAX_KERNEL_ROWS
        and _pick_bn(q["w4p"].shape[-1]) is not None
        and gs % 2 == 0 and (gs // 2) % 32 == 0  # uint8 sublane tile
        and os.environ.get("CSM_TPU_NO_INT4_KERNEL") != "1"
        and (jax.default_backend() != "cpu"
             # AOT-lowering for a TPU topology from a CPU-only driver
             # (the 8B fit proof in __graft_entry__) must trace the SAME
             # program the chip runs
             or os.environ.get("CSM_TPU_FORCE_INT4_KERNEL") == "1")
    )
    if use_kernel:
        y = _int4_matmul_kernel(x2, q["w4p"], q["scale4"])
    else:
        y = _xla_reference(x2, q)
    return y.reshape(*lead, y.shape[-1])


def _int4_matmul_fwd(x, q):
    return _int4_matmul_impl(x, q), q


def _int4_matmul_bwd(q, g):
    w = dequantize_weight_int4(q, g.dtype)
    dx = g @ w.T
    dq = jax.tree.map(
        lambda v: jnp.zeros(v.shape, jax.dtypes.float0)
        if not jnp.issubdtype(v.dtype, jnp.floating)
        else jnp.zeros_like(v),
        q,
    )
    return dx, dq


int4_matmul.defvjp(_int4_matmul_fwd, _int4_matmul_bwd)
