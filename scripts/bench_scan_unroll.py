"""Does unrolling the decode layer scan raise effective HBM bandwidth?

The fused decode projection scan sustains ~592 GB/s vs the chip's
819 GB/s peak (scripts/bench_qkv_fusion.py).  Hypothesis: `lax.scan`
iteration boundaries limit cross-layer weight prefetch — XLA may not
overlap layer L+1's first weight DMA with layer L's tail compute.
`unroll=k` gives the scheduler k layers of visibility.

Usage: python scripts/bench_scan_unroll.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
from csm_tpu.utils.transport import warm_transport

def log(*a): print(*a, file=sys.stderr, flush=True)

def timed(fn, x, n=50, tag=""):
    out = fn(x)
    float(jnp.sum(out[0]))
    t0 = time.time()
    for _ in range(n):
        out = fn(out)
    float(jnp.sum(out[0]))
    return (time.time() - t0) / n

def main():
    warm_transport()
    E, I = 2048, 8192
    qd, kvd = 2048, 512
    L = 16

    @jax.jit
    def init(key):
        ks = jax.random.split(key, 4)
        return {
            "wqkv": jax.random.normal(ks[0], (L, E, qd + 2 * kvd), jnp.bfloat16) * 0.02,
            "wo": jax.random.normal(ks[1], (L, qd, E), jnp.bfloat16) * 0.02,
            "w13": jax.random.normal(ks[2], (L, E, 2 * I), jnp.bfloat16) * 0.02,
            "w2": jax.random.normal(ks[3], (L, I, E), jnp.bfloat16) * 0.02,
        }

    fus = init(jax.random.key(0))
    jax.block_until_ready(fus["w2"])
    total_bytes = sum(int(np.prod(v.shape)) * 2 for v in fus.values())
    log(f"weights: {total_bytes/2**30:.2f} GiB")
    x0 = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, E)) * 0.02, jnp.bfloat16)

    def make(unroll):
        @jax.jit
        def scan_fus(x, w):
            def body(h, lp):
                qkv = h @ lp["wqkv"]
                q, k, v = qkv[:, :qd], qkv[:, qd:qd + kvd], qkv[:, qd + kvd:]
                a = q + jnp.sum(k) + jnp.sum(v)
                h = h + a @ lp["wo"]
                g13 = h @ lp["w13"]
                g = jax.nn.silu(g13[:, :I]) * g13[:, I:]
                return h + g @ lp["w2"], None
            h, _ = jax.lax.scan(body, x, w, unroll=unroll)
            return h
        return lambda x: scan_fus(x, fus)

    for unroll in (1, 2, 4, 8, 16):
        ms = timed(make(unroll), x0, tag=f"unroll={unroll}") * 1e3
        gbs = total_bytes / (ms / 1e3) / 1e9
        log(f"unroll={unroll}: {ms:.3f} ms ({gbs:.0f} GB/s effective)")

if __name__ == "__main__":
    main()
