"""Would fusing wq/wk/wv (and w1/w3) into single matmuls speed the decode step?

The B=1 S=1 backbone step runs at ~470 GB/s effective vs the 819 GB/s HBM
peak (BENCHMARKS.md per-frame breakdown).  Hypothesis: part of the gap is
per-matmul overhead — 7 matvecs per layer x 16 layers = 112 small dispatches
inside the layer scan.  Fusing qkv (2048->3072) and gate/up (2048->16384)
drops that to 4 per layer without changing bytes read.

This microbenchmark times a 16-layer scan of JUST the projection matvecs
(no attention/norms) in both layouts, plus single matvecs of each size to
expose the per-op overhead floor.

Usage: python scripts/bench_qkv_fusion.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

from csm_tpu.utils.transport import warm_transport  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, x, n=50, tag=""):
    """Chained timing (tunnel-safe): each call consumes the previous
    output; one scalar fetch at the end forces the whole chain."""
    t0 = time.time()
    out = fn(x)
    log(f"  [{tag}] dispatch+compile: {time.time()-t0:.1f}s")
    t0 = time.time()
    float(jnp.sum(out[0]))
    log(f"  [{tag}] first fetch: {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(n):
        out = fn(out)
    float(jnp.sum(out[0]))
    return (time.time() - t0) / n


def main():
    warm_transport(verbose=True)
    E, I = 2048, 8192
    qd, kvd = 2048, 512
    L = 16

    # init ON DEVICE: pushing ~1.5 GiB of host arrays through the
    # tunneled transport takes >15 min; a jitted init takes <1 s
    @jax.jit
    def init(key):
        shapes = {
            "wq": (L, E, qd), "wk": (L, E, kvd), "wv": (L, E, kvd),
            "wo": (L, qd, E), "w1": (L, E, I), "w3": (L, E, I),
            "w2": (L, I, E),
        }
        ks = dict(zip(shapes, jax.random.split(key, len(shapes))))
        sep = {
            n: jax.random.normal(ks[n], s, jnp.bfloat16) * 0.02
            for n, s in shapes.items()
        }
        fus = {
            "wqkv": jnp.concatenate(
                [sep["wq"], sep["wk"], sep["wv"]], axis=-1
            ),
            "wo": sep["wo"],
            "w13": jnp.concatenate([sep["w1"], sep["w3"]], axis=-1),
            "w2": sep["w2"],
        }
        return sep, fus

    sep, fus = init(jax.random.key(0))
    jax.block_until_ready(sep["w2"])
    bytes_per_layer = sum(int(np.prod(v.shape[1:])) * 2 for v in sep.values())
    log(f"weights: {L} layers x {bytes_per_layer/2**20:.1f} MiB = "
        f"{L*bytes_per_layer/2**30:.2f} GiB")

    x0 = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, E)) * 0.02, jnp.bfloat16
    )

    # weights are jit ARGUMENTS, not closures: closed-over device arrays
    # are baked into the program as constants (slow const handling at
    # trace/compile time; see csm_tpu/utils/transport.py module notes)
    @jax.jit
    def scan_sep_w(x, w):
        def body(h, lp):
            q = h @ lp["wq"]
            k = h @ lp["wk"]
            v = h @ lp["wv"]
            # stand-in for attention output: q + broadcast of k,v sums
            a = q + jnp.sum(k) + jnp.sum(v)
            h = h + a @ lp["wo"]
            g = jax.nn.silu(h @ lp["w1"]) * (h @ lp["w3"])
            return h + g @ lp["w2"], None
        h, _ = jax.lax.scan(body, x, w)
        return h

    @jax.jit
    def scan_fus_w(x, w):
        def body(h, lp):
            qkv = h @ lp["wqkv"]
            q, k, v = qkv[:, :qd], qkv[:, qd:qd + kvd], qkv[:, qd + kvd:]
            a = q + jnp.sum(k) + jnp.sum(v)
            h = h + a @ lp["wo"]
            g13 = h @ lp["w13"]
            g = jax.nn.silu(g13[:, :I]) * g13[:, I:]
            return h + g @ lp["w2"], None
        h, _ = jax.lax.scan(body, x, w)
        return h

    def scan_sep(x):
        return scan_sep_w(x, sep)

    def scan_fus(x):
        return scan_fus_w(x, fus)

    report = {}
    for name, fn in (("separate(7/layer)", scan_sep), ("fused(4/layer)", scan_fus)):
        ms = timed(fn, x0, tag=name) * 1e3
        gbs = L * bytes_per_layer / (ms / 1e3) / 1e9
        report[name] = {"ms": round(ms, 3), "eff_GBps": round(gbs, 1)}
        log(f"{name}: {ms:.3f} ms ({gbs:.0f} GB/s effective)")

    # per-op floor: single matvec of each size, chained
    @jax.jit
    def one_w(x, w):
        y = x @ w
        # fold back to x's shape so the chain types match
        return x + jnp.sum(y) * 1e-9

    for shape in ((E, kvd), (E, qd), (E, I), (E, 2 * I)):
        w = jax.jit(
            lambda s=shape: jax.random.normal(
                jax.random.key(2), s, jnp.bfloat16
            ) * 0.02
        )()

        def one(x, w=w):
            return one_w(x, w)

        ms = timed(one, x0, tag=str(shape)) * 1e3
        gbs = shape[0] * shape[1] * 2 / (ms / 1e3) / 1e9
        log(f"matvec {shape}: {ms*1e3:.1f} us ({gbs:.0f} GB/s)")
        report[f"matvec{shape}"] = {"us": round(ms * 1e3, 1), "eff_GBps": round(gbs, 1)}

    print(jax.tree_util.tree_map(lambda x: x, report))


if __name__ == "__main__":
    main()
