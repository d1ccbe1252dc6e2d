"""Probe: can the B=1 backbone decode projections stream weights faster
than the ~600 GB/s the XLA fused-layout scan sustains?

BENCHMARKS.md per-frame breakdown: the backbone incremental step reads
1.95 GB of weights at ~600 GB/s effective (scripts/bench_qkv_fusion.py)
while the decoder scan streams near the 819 GB/s HBM peak.  Two
hypotheses for the gap, each isolated by a variant here:

  A. scan-boundary pipeline bubbles — ``lax.scan`` over layers drains
     the prefetch pipeline at each iteration boundary (16 boundaries per
     frame).  Variant ``unrolled`` keeps identical math/layout but
     replaces the scan with a Python-unrolled loop over PER-LAYER weight
     buffers (no dynamic-slice feeding, no loop carry).
  B. XLA matvec codegen — the M=1 matmul may not stream at line rate.
     Variant ``pallas`` replaces each matvec in the unrolled loop with a
     Pallas kernel: grid over output-column blocks, weights DMA'd
     HBM→VMEM in ~2 MiB blocks (double-buffered by the Pallas grid
     pipeline), one MXU dot per block.

All variants run the same 16-layer body (fused qkv + gate/up layout,
attention stood in by a cheap reduction — this probe times WEIGHT
STREAMING, not attention).  Chained timing, one fetch at the end
(tunnel-safe; see csm_tpu/utils/transport.py).

Usage: python scripts/bench_matvec_pallas.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

from csm_tpu.utils.transport import warm_transport  # noqa: E402

E, I = 2048, 8192
QD, KVD = 2048, 512
L = 16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------- kernel
def _matvec_kernel(x_ref, w_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n",))
def matvec_pallas(x, w, block_n=None):
    """y = x @ w for x (1, K): weights streamed in (K, block_n) VMEM
    blocks, pipelined across a 1-D grid over output columns."""
    K, N = w.shape
    if block_n is None:
        # ~2 MiB per weight block: big enough to amortize DMA setup,
        # small enough to double-buffer in 16 MiB VMEM.
        block_n = max(128, min(N, (2 << 20) // (K * w.dtype.itemsize)))
        block_n = block_n // 128 * 128
    assert N % block_n == 0, (N, block_n)
    return pl.pallas_call(
        _matvec_kernel,
        interpret=os.environ.get("CSM_PROBE_INTERPRET", "0") == "1",
        grid=(N // block_n,),
        in_specs=[
            pl.BlockSpec((1, K), lambda i: (0, 0)),
            pl.BlockSpec((K, block_n), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((1, block_n), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, N), x.dtype),
    )(x, w)


# ---------------------------------------------------------------- bodies
def _body(h, wqkv, wo, w13, w2, mv):
    qkv = mv(h, wqkv)
    q = qkv[:, :QD]
    a = q + jnp.sum(qkv[:, QD:])  # attention stand-in (cheap)
    h = h + mv(a, wo)
    g13 = mv(h, w13)
    g = jax.nn.silu(g13[:, :I]) * (g13[:, I:])
    return h + mv(g, w2)


def scan_fn(x, stacked):
    def body(h, lp):
        return _body(h, lp["wqkv"], lp["wo"], lp["w13"], lp["w2"],
                     jnp.matmul), None
    h, _ = jax.lax.scan(body, x, stacked)
    return h


def unrolled_fn(x, per_layer, mv):
    h = x
    for lp in per_layer:
        h = _body(h, lp["wqkv"], lp["wo"], lp["w13"], lp["w2"], mv)
    return h


def timed(fn, x, n=50, tag=""):
    t0 = time.time()
    out = fn(x)
    log(f"  [{tag}] dispatch+compile: {time.time()-t0:.1f}s")
    float(jnp.sum(out))
    t0 = time.time()
    for _ in range(n):
        out = fn(out)
    float(jnp.sum(out))
    return (time.time() - t0) / n


def main():
    warm_transport(verbose=True)

    shapes = {"wqkv": (E, QD + 2 * KVD), "wo": (QD, E),
              "w13": (E, 2 * I), "w2": (I, E)}
    bytes_per_layer = sum(a * b * 2 for a, b in shapes.values())
    log(f"weights: {L} x {bytes_per_layer/2**20:.1f} MiB = "
        f"{L*bytes_per_layer/2**30:.2f} GiB")

    @jax.jit
    def init(key):
        ks = jax.random.split(key, len(shapes))
        return {
            n: jax.random.normal(k, (L,) + s, jnp.bfloat16) * 0.02
            for (n, s), k in zip(shapes.items(), ks)
        }

    stacked = init(jax.random.key(0))
    jax.block_until_ready(stacked["w2"])
    # Per-layer buffers: separate arrays (device-side copies of the
    # slices), so the unrolled variants feed dense standalone operands.
    unstack = jax.jit(
        lambda t: [{n: t[n][i] for n in t} for i in range(L)]
    )
    per_layer = unstack(stacked)
    jax.block_until_ready(per_layer[-1]["w2"])

    x0 = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, E)) * 0.02, jnp.bfloat16
    )

    scan_c = jax.jit(lambda x: scan_fn(x, stacked))
    unroll_xla = jax.jit(lambda x: unrolled_fn(x, per_layer, jnp.matmul))
    unroll_pl = jax.jit(lambda x: unrolled_fn(x, per_layer, matvec_pallas))
    # Static slices of the STACKED arrays — the drop-in integration shape
    # (no weight-layout change): does XLA read through the slice without
    # a copy, and at what rate?
    def unrolled_sliced(x, w):
        return unrolled_fn(
            x, [{n: w[n][i] for n in shapes} for i in range(L)], jnp.matmul
        )

    unroll_sl = jax.jit(lambda x: unrolled_sliced(x, stacked))

    # parity first (same weights, same math)
    t0 = time.time()
    ref = np.asarray(scan_c(x0), np.float32)
    log(f"scan compile+run: {time.time()-t0:.1f}s")
    for tag, fn in (("unrolled", unroll_xla), ("sliced", unroll_sl),
                    ("pallas", unroll_pl)):
        if tag in os.environ.get("CSM_PROBE_SKIP", ""):
            continue
        t0 = time.time()
        got = np.asarray(fn(x0), np.float32)
        err = float(np.max(np.abs(got - ref)))
        log(f"parity {tag}: max|Δ|={err:.3e} ({time.time()-t0:.1f}s)")
        assert err < 1e-2, (tag, err)

    report = {}
    for tag, fn in (("scan_xla(baseline)", scan_c),
                    ("unrolled_xla", unroll_xla),
                    ("unrolled_xla_sliced", unroll_sl),
                    ("unrolled_pallas", unroll_pl)):
        if any(s and s in tag for s in
               os.environ.get("CSM_PROBE_SKIP", "").split(",")):
            continue
        ms = timed(fn, x0, tag=tag) * 1e3
        gbs = L * bytes_per_layer / (ms / 1e3) / 1e9
        report[tag] = {"ms": round(ms, 3), "eff_GBps": round(gbs, 1)}
        log(f"{tag}: {ms:.3f} ms ({gbs:.0f} GB/s effective)")

    print(report)


if __name__ == "__main__":
    main()
