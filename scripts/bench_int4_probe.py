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


def _pack_nibbles(w8):
    """(..., in, out) int8 in [-7,7] -> (..., in//2, out) uint8 packed."""
    lo = w8[..., 0::2, :] & 0x0F
    hi = w8[..., 1::2, :] & 0x0F
    return (lo | (hi << 4)).astype(jnp.uint8)


def _unpack_nibbles(p, dtype):
    """Inverse of _pack_nibbles -> (..., in, out) dtype (sign-extended)."""
    i8 = p.astype(jnp.int8)
    lo = (i8 << 4) >> 4          # arithmetic shift sign-extends the nibble
    hi = i8 >> 4
    st = jnp.stack([lo, hi], axis=-2)  # (..., in//2, 2, out)
    sh = p.shape[:-2] + (2 * p.shape[-2], p.shape[-1])
    return st.reshape(sh).astype(dtype)


def timed(fn, x, w, n=50):
    """Chained timing (tunnel-safe): each call consumes the previous
    output; one scalar fetch at the end forces the whole chain."""
    out = fn(x, w)
    float(jnp.sum(out))  # compile + first fetch
    t0 = time.time()
    for _ in range(n):
        out = fn(out, w)
    float(jnp.sum(out))
    return (time.time() - t0) / n


def main():
    warm_transport(verbose=True)

    @jax.jit
    def init(k):
        ks = jax.random.split(k, len(SHAPES))
        out = {}
        from csm_tpu.utils.quantize import quantize_weight_int4

        for kk, (name, sh) in zip(ks, SHAPES.items()):
            w = jax.random.normal(kk, (L,) + sh, jnp.float32) * 0.02
            q4 = quantize_weight_int4(w)
            amax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)
            s8 = jnp.maximum(amax, 1e-8) / 127.0
            s4 = jnp.maximum(amax, 1e-8) / 7.0
            out[name] = {
                "bf16": w.astype(jnp.bfloat16),
                "w8": jnp.clip(jnp.round(w / s8), -127, 127).astype(jnp.int8),
                "s8": s8.astype(jnp.bfloat16),
                # packed nibbles: byte i holds rows 2i (low) and 2i+1
                # (high) of the input axis — jnp.int4 itself cannot cross
                # a jit boundary on this backend (device_put recursion)
                "w4p": _pack_nibbles(jnp.clip(jnp.round(w / s4), -7, 7)
                                     .astype(jnp.int8)),
                "s4": s4.astype(jnp.bfloat16),
                "w4k": q4["w4p"], "s4k": q4["scale4"],
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
                if kind == "int8":
                    return (x @ lp[name]["w8"].astype(x.dtype)) * lp[name]["s8"][0]
                if kind == "int4_kernel":
                    from csm_tpu.ops.int4_matmul import int4_matmul
                    return int4_matmul(
                        x, {"w4p": lp[name]["w4k"], "scale4": lp[name]["s4k"]})
                w = _unpack_nibbles(lp[name]["w4p"], x.dtype)
                return (x @ w) * lp[name]["s4"][0]
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

    KEYS = {"bf16": ("bf16",), "int8": ("w8", "s8"), "int4": ("w4p", "s4"),
            "int4_kernel": ("w4k", "s4k")}
    n_weights = sum(sh[0] * sh[1] for sh in SHAPES.values()) * L
    for kind, bpw in (("bf16", 2.0), ("int8", 1.0), ("int4", 0.5),
                      ("int4_kernel", 0.5)):
        fn = make_scan(kind)
        # pass ONLY the format under test: unused scan xs are not always
        # DCE'd and their per-iteration slices pollute the bandwidth
        w_kind = {n: {k: W[n][k] for k in KEYS[kind]} for n in SHAPES}
        dt = timed(fn, x0, w_kind)
        gbs = n_weights * bpw / dt / 1e9
        log(f"{kind}: {dt*1e3:.3f} ms  ({gbs:.0f} GB/s effective at "
            f"{bpw} B/weight ideal)")


if __name__ == "__main__":
    main()
