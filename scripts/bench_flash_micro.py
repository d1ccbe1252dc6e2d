"""Flash-attention kernel microbenchmark (fwd + bwd), backbone shapes.

Times ONE attention op at the CSM-1B training shape (B=2, S=2048,
32 q-heads / 8 kv-heads, D=64) in bf16 against the analytic causal FLOPs
(2·B·Hq·S²/2·D MACs per QKᵀ/AV matmul pair), reporting achieved TFLOP/s
and % of the v5e bf16 peak.  Compares the Pallas kernel with the XLA
reference path.  Usage: python scripts/bench_flash_micro.py [--seq 2048]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

from csm_tpu.ops import flash_attention as fa  # noqa: E402
from csm_tpu.ops.attention import causal_mask_from_positions, gqa_attention  # noqa: E402
from csm_tpu.training.benchmarks import peak_tflops_per_device  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, q, *rest, n=20):
    """Chained timing: each call's q input is the previous call's output
    (same shape), so dispatches are neither identical nor reorderable —
    under the axon tunnel repeated identical dispatches mis-measure.
    One scalar fetch at the end forces completion of the whole chain."""
    out = fn(q, *rest)
    leaf = out[0] if isinstance(out, tuple) else out
    float(jnp.sum(leaf[0, 0, 0]))
    t0 = time.time()
    for _ in range(n):
        out = fn(leaf, *rest)
        leaf = out[0] if isinstance(out, tuple) else out
    float(jnp.sum(leaf[0, 0, 0]))
    return (time.time() - t0) / n


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    S = 2048
    for i, a in enumerate(argv):
        if a == "--seq":
            S = int(argv[i + 1])
    B, Hq, Hkv, D = 2, 32, 8, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.bfloat16)
    qpos = jnp.broadcast_to(jnp.arange(S), (B, S)).astype(jnp.int32)
    kvpos = jnp.arange(S, dtype=jnp.int32)

    # causal attention FLOPs: QK^T + AV, each 2·B·Hq·(S²/2)·D
    flops_fwd = 2 * 2 * B * Hq * (S * S / 2) * D
    peak = peak_tflops_per_device() * 1e12

    flash = jax.jit(lambda q, k, v: fa.flash_gqa_attention(q, k, v, qpos, kvpos))
    dt = timed(flash, q, k, v)
    log(f"flash fwd  (B={B} S={S} Hq={Hq} D={D}): {dt * 1e3:.2f} ms  "
        f"{flops_fwd / dt / 1e12:.1f} TF/s ({100 * flops_fwd / dt / peak:.0f}% peak)")

    mask = causal_mask_from_positions(qpos, kvpos)
    ref = jax.jit(lambda q, k, v: gqa_attention(q, k, v, mask))
    dt_ref = timed(ref, q, k, v)
    log(f"xla   fwd: {dt_ref * 1e3:.2f} ms  {flops_fwd / dt_ref / 1e12:.1f} TF/s "
        f"({100 * flops_fwd / dt_ref / peak:.0f}% peak)")

    # fwd+bwd: backward does dq (2 matmuls + recompute s) + dkv (4 matmuls)
    # ≈ 2.5x the forward matmul work
    flops_fb = flops_fwd * 3.5
    grad = jax.jit(jax.grad(
        lambda q, k, v: (fa.flash_gqa_attention(q, k, v, qpos, kvpos)
                         .astype(jnp.float32) ** 2).sum(),
        argnums=(0, 1, 2),
    ))
    dt_g = timed(grad, q, k, v)
    log(f"flash fwd+bwd: {dt_g * 1e3:.2f} ms  {flops_fb / dt_g / 1e12:.1f} TF/s "
        f"({100 * flops_fb / dt_g / peak:.0f}% peak)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
