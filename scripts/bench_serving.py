"""One-window serving benchmark protocol.

Produces the ENTIRE serving table — weight dtype (bf16 / int8 /
int8+int8KV) x slot counts x scheduler (sync / pipelined) — in a single
process/session with median-of-N and a spread column, so every number in
README/BENCHMARKS traces to ONE measurement window (this rig's serving
numbers vary +-20% BETWEEN windows; same-window comparisons only).

Usage:
  python scripts/bench_serving.py                 # full protocol table
  python scripts/bench_serving.py 8 32            # only these slot counts
  python scripts/bench_serving.py --quick         # 1 repeat (smoke)
  python scripts/bench_serving.py --int8 --kv-int8 --pipelined 32
                                                  # legacy single-config mode

Writes the markdown table to stdout and a JSON artifact to
scripts/out/bench_serving.json (configs, medians, spreads, timestamps).
"""
import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
from csm_tpu.models.config import csm_1b_args
from csm_tpu.serving import BatchedServer, StreamRequest
from csm_tpu.utils.transport import warm_transport_async


def log(*a):
    print(*a, file=sys.stderr, flush=True)


warm_transport_async(verbose=True)
args = csm_1b_args()
from csm_tpu.models.csm import init_csm_params

params = jax.jit(lambda k: init_csm_params(k, args, jnp.bfloat16))(jax.random.key(0))
jax.block_until_ready(params["audio_head"])
K = args.audio_num_codebooks
rng = np.random.default_rng(0)


def req(rid, T=48, max_frames=63):
    tokens = np.zeros((T, K + 1), np.int32)
    mask = np.zeros((T, K + 1), bool)
    tokens[:, -1] = rng.integers(1, args.text_vocab_size, T)
    mask[:, -1] = True
    return StreamRequest(tokens, mask, max_frames=max_frames, request_id=rid)


def run_is_poisoned(step_wall):
    """A mid-run relay stall shows as ONE chunk taking seconds while the
    rest take ~0.1 s — such a run measures the tunnel, not the scheduler.
    Criterion: any chunk > 5x the run's median chunk AND > 0.5 s absolute
    (round-4 verdict Weak #1: discard these instead of medianing them in).
    """
    if len(step_wall) < 4:
        return False
    med = statistics.median(step_wall)
    worst = max(step_wall)
    return worst > 5.0 * med and worst > 0.5


def measure(n_slots, weight_dtype, kv_dtype, pipelined, repeats):
    """Median frames/s over ``repeats`` CLEAN runs of one server config
    (2x-oversubscribed ~5 s utterances, chunk 8).

    Stall-poisoned runs (per-chunk heartbeat outlier) are DISCARDED and
    re-measured, up to ``repeats + 4`` total attempts; if the window
    can't produce ``repeats`` clean runs, the cell is flagged
    unmeasurable-this-window instead of shipping a relay artifact.
    Returns (median, spread_pct, clean_rates, n_poisoned, measurable).
    """
    server = BatchedServer(
        params, args, n_slots=n_slots, max_seq_len=1024,
        temperature=0.9, topk=50, chunk_size=8,
        weight_dtype=weight_dtype, kv_dtype=kv_dtype, pipelined=pipelined,
    )
    server.warmup()  # every program: buckets, full batch, compaction sizes
    rates, poisoned = [], 0
    for _ in range(repeats + 4):
        server.reset()
        reqs = [req(i) for i in range(n_slots * 2)]
        results, stats = server.run(reqs)
        assert len(results) == len(reqs)
        if run_is_poisoned(stats["step_wall"]):
            poisoned += 1
            log(f"    poisoned run discarded (worst chunk "
                f"{max(stats['step_wall']):.2f}s vs median "
                f"{statistics.median(stats['step_wall']):.3f}s)")
            continue
        rates.append(stats["frames_per_s"])
        if len(rates) >= repeats:
            break
    del server
    gc.collect()
    measurable = len(rates) >= max(1, repeats - 1)
    if not rates:
        return float("nan"), float("nan"), [], poisoned, False
    med = statistics.median(rates)
    spread = (
        (max(rates) - min(rates)) / med * 100 if len(rates) > 1 else 0.0
    )
    return med, spread, rates, poisoned, measurable


argv = sys.argv[1:]
slot_args = [int(a) for a in argv if not a.startswith("--")]

if any(a in argv for a in ("--int8", "--kv-int8", "--pipelined")):
    # legacy single-config mode (kept for targeted A/Bs)
    wdtype = "int8" if "--int8" in argv else "bf16"
    kvdtype = "int8" if "--kv-int8" in argv else "bf16"
    pipelined = "--pipelined" in argv
    for n_slots in slot_args or (1, 8, 16, 32, 64):
        med, spread, rates, npoison, ok = measure(
            n_slots, wdtype, kvdtype, pipelined, 3)
        log(f"slots={n_slots}: median {med:.1f} frames/s "
            f"(spread {spread:.1f}%, runs {[round(r, 1) for r in rates]}, "
            f"{npoison} poisoned{'' if ok else ', UNMEASURABLE'})")
    sys.exit(0)

repeats = 1 if "--quick" in argv else 3
CONFIGS = [
    ("bf16", "bf16", "bf16"),
    ("int8", "int8", "bf16"),
    ("int8+int8KV", "int8", "int8"),
]
slot_counts = slot_args or [1, 8, 16, 32, 64]

t_start = time.time()
rows = {}  # (cfg, slots, sched) -> (median, spread)
artifact = {
    "protocol": "one-window serving table",
    "utterance_frames": 63, "oversubscription": 2, "chunk_size": 8,
    "repeats": repeats, "results": [],
}
for cfg_name, wdtype, kvdtype in CONFIGS:
    for n_slots in slot_counts:
        for sched, pipelined in (("sync", False), ("pipelined", True)):
            med, spread, rates, npoison, ok = measure(
                n_slots, wdtype, kvdtype, pipelined, repeats)
            rows[(cfg_name, n_slots, sched)] = (med, spread, ok)
            log(f"{cfg_name} slots={n_slots} {sched}: {med:.1f} f/s "
                f"(spread {spread:.1f}%, {npoison} poisoned"
                f"{'' if ok else ', UNMEASURABLE'})")
            artifact["results"].append({
                "config": cfg_name, "weight_dtype": wdtype,
                "kv_dtype": kvdtype, "n_slots": n_slots, "sched": sched,
                "median_frames_per_s": round(med, 1) if ok else None,
                "spread_pct": round(spread, 1) if ok else None,
                "runs": [round(r, 1) for r in rates],
                "poisoned_runs": npoison,
                "measurable": ok,
                # the number a LISTENER experiences at full occupancy
                "per_stream_frames_per_s": round(med / n_slots, 2) if ok else None,
            })
artifact["wall_s"] = round(time.time() - t_start, 1)

print("\n## Serving throughput — one window, median of "
      f"{repeats} (spread = (max-min)/median)\n")
print("| slots | " + " | ".join(
    f"{c} sync | {c} pipelined" for c, _, _ in CONFIGS) + " |")
print("|---" * (1 + 2 * len(CONFIGS)) + "|")
for n_slots in slot_counts:
    cells = []
    for cfg_name, _, _ in CONFIGS:
        for sched in ("sync", "pipelined"):
            med, spread, ok = rows[(cfg_name, n_slots, sched)]
            if not ok:
                cells.append("unmeasurable*")
                continue
            # per-stream rate beside the aggregate: < 12.5 f/s means a
            # full server delivers SUB-REAL-TIME audio per listener
            per = med / n_slots
            flag = "" if per >= 12.5 else " ⚠"
            cells.append(f"{med:.1f} ±{spread:.0f}% ({per:.1f}/str{flag})")
    print(f"| {n_slots} | " + " | ".join(cells) + " |")
print("\n(/str = aggregate / slots, the per-listener rate at full "
      "occupancy; ⚠ = below the 12.5 f/s real-time line; "
      "*unmeasurable = the window couldn't produce enough stall-free "
      "runs — see scripts/bench_serving_slo.py for the SLO protocol)")
print(f"\n(window: {artifact['wall_s']}s total; "
      f"~5 s utterances, 2x oversubscribed, chunk 8)")

os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)), "out"),
            exist_ok=True)
out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "out", "bench_serving.json")
with open(out_path, "w") as f:
    json.dump(artifact, f, indent=2)
log(f"wrote {out_path}")
