"""Long-context measurement on the real chip (VERDICT round-2 item #6).

Measures, at CSM-1B size with ``csm_1b_args(max_seq_len=8192)``:
  * prefill latency of a 4096- and 8192-token prompt bucket through the
    Pallas flash-attention path (models/generation.py buckets);
  * steady-state decode frames/s at those cache lengths (decode reads
    the WHOLE cache row each step — RTF degrades with max_seq_len; this
    quantifies the long-context tax).

Usage: python scripts/bench_longcontext.py [--buckets 4096,8192]
Writes one summary line per config to stderr and a JSON dict to stdout.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

from csm_tpu.models.config import csm_1b_args  # noqa: E402
from csm_tpu.utils.transport import warm_transport  # noqa: E402
from csm_tpu.models.csm import init_csm_params  # noqa: E402
from csm_tpu.models.generation import generate_audio_tokens  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    warm_transport(verbose=True)
    buckets = [4096, 8192]
    kv_dtype = None
    for a in argv:
        if a.startswith("--buckets"):
            buckets = [int(x) for x in a.split("=", 1)[1].split(",")]
        if a == "--kv-int8":
            kv_dtype = jnp.int8

    args = csm_1b_args(max_seq_len=max(buckets) + 1024)
    K = args.audio_num_codebooks
    params = jax.jit(lambda k: init_csm_params(k, args, jnp.bfloat16))(
        jax.random.key(0)
    )
    jax.block_until_ready(params["audio_head"])
    rng = np.random.default_rng(0)
    report = {"max_seq_len": args.backbone.max_seq_len,
              "kv_dtype": "int8" if kv_dtype is not None else "bf16",
              "configs": []}

    for S_pad in buckets:
        T = S_pad - 8  # prompt nearly fills the bucket
        toks = np.zeros((1, S_pad, K + 1), np.int32)
        msk = np.zeros((1, S_pad, K + 1), bool)
        toks[0, :T, -1] = rng.integers(1, args.text_vocab_size, T)
        msk[0, :T, -1] = True
        lens = jnp.full((1,), T, jnp.int32)
        td, md = jnp.asarray(toks), jnp.asarray(msk)

        for max_frames, tag in ((1, "prefill"), (126, "decode")):
            # prompt/lens are jit ARGUMENTS: closed-over device arrays
            # become embedded constants (slow const handling on the
            # tunneled rig; csm_tpu/utils/transport.py module notes)
            gen_arg = jax.jit(
                lambda p, k, t, m, ln, mf=max_frames: generate_audio_tokens(
                    p, args, k, t, m, ln, max_frames=mf,
                    temperature=0.9, topk=50, kv_dtype=kv_dtype,
                )
            )

            def gen(p, k):
                return gen_arg(p, k, td, md, lens)

            t0 = time.time()
            int(jnp.sum(gen(params, jax.random.key(0)).frames))
            compile_s = time.time() - t0
            # distinct keys + a per-run host fetch: identical dispatches
            # (and block_until_ready on dispatch chains) mis-measure on
            # the tunneled rig
            t0 = time.time()
            n_rep = 3 if tag == "prefill" else 1
            res = None
            for i in range(n_rep):
                res = gen(params, jax.random.key(i + 1))
                int(jnp.sum(res.frames))
            dt = (time.time() - t0) / n_rep
            nf = int(np.asarray(res.num_frames)[0])
            row = {
                "bucket": S_pad,
                "stage": tag,
                "prompt_tokens": T,
                "compile_plus_first_s": round(compile_s, 1),
                "wall_s": round(dt, 3),
            }
            if tag == "prefill":
                row["prefill_tokens_per_s"] = round(T / dt, 1)
                log(f"bucket {S_pad}: prefill {dt * 1000:.0f} ms "
                    f"({T / dt:.0f} tok/s), compile+first {compile_s:.1f}s")
            else:
                dec_dt = dt  # includes one prefill; subtract measured prefill
                pre = next(
                    (c["wall_s"] for c in report["configs"]
                     if c["bucket"] == S_pad and c["stage"] == "prefill"), 0.0
                )
                frames_s = max(nf - 1, 1) / max(dec_dt - pre, 1e-9)
                row["frames"] = nf
                row["decode_frames_per_s"] = round(frames_s, 1)
                row["decode_rtf"] = round(frames_s / 12.5, 2)
                log(f"bucket {S_pad}: {nf} frames, decode "
                    f"{frames_s:.1f} f/s (RTF {frames_s / 12.5:.2f}), "
                    f"compile+first {compile_s:.1f}s")
            report["configs"].append(row)

    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
