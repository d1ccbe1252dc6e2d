"""Probe: does XLA/TPU stream int4 weights at half the int8 bytes?

Decode is weight-bandwidth-bound (BENCHMARKS.md): bf16 -> int8 measured
~1.7x on the scanned matvec chain.  jnp.int4 exists in this JAX; if the
int4->bf16 convert fuses into the matmul operand load the same way, the
projection stream halves again.  This probe times the CSM-1B decode
projection scan (fused layout shapes) at bf16 / int8 / int4 and prints
effective GB/s from the *ideal* byte count of each format, so a number
well below the int8 line means the convert did NOT fuse (XLA widened the
weights in HBM first).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
from csm_tpu.utils.transport import warm_transport

def log(*a): print(*a, file=sys.stderr, flush=True)

E, I, L = 2048, 8192, 16
qd, kvd = 2048, 512
SHAPES = {"wqkv": (E, qd + 2 * kvd), "wo": (qd, E), "w13": (E, 2 * I), "w2": (I, E)}


def timed(fn, *a, n=3):
    r = fn(*a); jax.block_until_ready(r)
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        r = fn(*a)
        jax.block_until_ready(r)
        best = min(best, time.time() - t0)
    return best


def main():
    warm_transport(verbose=True)

    @jax.jit
    def init(k):
        ks = jax.random.split(k, len(SHAPES))
        out = {}
        for kk, (name, sh) in zip(ks, SHAPES.items()):
            w = jax.random.normal(kk, (L,) + sh, jnp.float32) * 0.02
            amax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)
            s8 = jnp.maximum(amax, 1e-8) / 127.0
            s4 = jnp.maximum(amax, 1e-8) / 7.0
            out[name] = {
                "bf16": w.astype(jnp.bfloat16),
                "w8": jnp.clip(jnp.round(w / s8), -127, 127).astype(jnp.int8),
                "s8": s8.astype(jnp.bfloat16),
                "w4": jnp.clip(jnp.round(w / s4), -7, 7).astype(jnp.int4),
                "s4": s4.astype(jnp.bfloat16),
            }
        return out

    W = init(jax.random.key(0))
    jax.block_until_ready(W["w2"]["w8"])

    x0 = jnp.asarray(np.random.default_rng(0).standard_normal((1, E)) * 0.1,
                     jnp.bfloat16)

    def make_scan(kind):
        def body(h, lp):
            def mm(name, x):
                if kind == "bf16":
                    return x @ lp[name]["bf16"]
                wq = lp[name]["w8"] if kind == "int8" else lp[name]["w4"]
                s = lp[name]["s8"] if kind == "int8" else lp[name]["s4"]
                return (x @ wq.astype(x.dtype)) * s[0]
            a = mm("wqkv", h)[:, :qd]  # qd == E: stands in for attention out
            h = h + mm("wo", a)
            g13 = mm("w13", h)
            g = jax.nn.silu(g13[:, :I]) * g13[:, I:]
            return h + mm("w2", g), None
        @jax.jit
        def run(x, w):
            h, _ = jax.lax.scan(body, x, w)
            return h
        return run

    n_weights = sum(sh[0] * sh[1] for sh in SHAPES.values()) * L
    for kind, bpw in (("bf16", 2.0), ("int8", 1.0), ("int4", 0.5)):
        fn = make_scan(kind)
        dt = timed(fn, x0, W)
        gbs = n_weights * bpw / dt / 1e9
        log(f"{kind}: {dt*1e3:.3f} ms  ({gbs:.0f} GB/s effective at "
            f"{bpw} B/weight ideal)")


if __name__ == "__main__":
    main()
