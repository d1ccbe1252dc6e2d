"""Per-stream SLO serving protocol — the number a listener experiences.

Round-4 verdict Missing #3 / Next #1: aggregate frames/s hides whether
every LIVE stream receives real-time audio.  This protocol measures, per
stream, under open-loop Poisson arrivals:

  * TTFA — arrival → first frame delivery (queue wait included);
  * delivered frame rate — frames after the first chunk over the
    delivery interval (what the listener's buffer sees);
  * inter-chunk gap p99 — delivery smoothness.

SLO: delivered rate >= 12.5 f/s AND TTFA <= 250 ms (frame-level; the
streaming Mimi decode adds ~2 ms/chunk at 61x RT, BENCHMARKS.md §Mimi).
**Capacity** = max target concurrency N (arrival rate N / utterance
length) where >= 95% of streams meet the SLO.  The reference's own
framing is latency (~380 ms to first audio on an A100-class GPU,
/root/reference/docs/reference/sesame_csm/inference.md:53-78); the
reference has no serving stack at all.

Runs poisoned by a tunnel-relay stall (one chunk >5x the run median and
>0.5 s) are discarded and re-run — same criterion as
scripts/bench_serving.py.

Usage:
  python scripts/bench_serving_slo.py                   # full protocol
  python scripts/bench_serving_slo.py --quick           # short smoke
  python scripts/bench_serving_slo.py --configs int8+int8KV:pipelined
  python scripts/bench_serving_slo.py --duration 60 --ladder 16,32,48,64

Writes markdown to stdout + scripts/out/bench_serving_slo.json.
"""
import argparse
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

UTTER_FRAMES = 63  # ~5 s of audio
FRAME_RATE = 12.5
SLO_RATE = 12.5       # delivered frames/s a listener needs
SLO_TTFA = 0.250      # seconds to first frame
SLO_PASS_PCT = 95.0   # % of streams that must meet the SLO


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def pctl(xs, q):
    return float(np.percentile(np.asarray(xs, np.float64), q)) if xs else float("nan")


def make_req(args, rng, rid, on_frames):
    K = args.audio_num_codebooks
    T = 48
    tokens = np.zeros((T, K + 1), np.int32)
    mask = np.zeros((T, K + 1), bool)
    tokens[:, -1] = rng.integers(1, args.text_vocab_size, T)
    mask[:, -1] = True
    return StreamRequest(tokens, mask, max_frames=UTTER_FRAMES,
                         request_id=rid, on_frames=on_frames)


def run_open_loop(server, args, concurrency, duration_s, seed=0):
    """One open-loop session at target concurrency N: Poisson arrivals at
    rate N / utterance_s for ``duration_s``.  Returns per-stream records
    + heartbeat info."""
    rng = np.random.default_rng(seed)
    lam = concurrency / (UTTER_FRAMES / FRAME_RATE)
    sched, t = [], 0.0
    while t < duration_s:
        t += float(rng.exponential(1.0 / lam))
        sched.append(t)
    streams = {}

    def make_cb(rid):
        def cb(_request_id, new_frames, done):
            now = time.time()
            st = streams[rid]
            n = int(new_frames.shape[0])
            if n:
                if st["first"] is None:
                    st["first"] = now
                    st["first_n"] = n
                else:
                    st["gaps"].append(now - st["last"])
                st["last"] = now
                st["frames"] += n
        return cb

    queue = []
    step_wall = []
    t0 = time.time()
    i = 0
    while i < len(sched) or queue or server.active.any():
        now = time.time() - t0
        while i < len(sched) and sched[i] <= now:
            streams[i] = dict(
                arrival=t0 + sched[i], first=None, last=None,
                frames=0, first_n=0, gaps=[],
            )
            queue.append(make_req(args, rng, i, make_cb(i)))
            i += 1
        while queue and server.submit(queue[0]) is not None:
            queue.pop(0)
        if server.active.any():
            ts = time.time()
            server.step()
            step_wall.append(time.time() - ts)
        elif not queue and i < len(sched):
            time.sleep(max(0.0, sched[i] - (time.time() - t0)))
    return streams, step_wall


def poisoned(step_wall):
    if len(step_wall) < 8:
        return False
    med = statistics.median(step_wall)
    worst = max(step_wall)
    return worst > 5.0 * med and worst > 0.5


def summarize(streams):
    ttfa, rates, gaps, incomplete, ok = [], [], [], 0, 0
    for st in streams.values():
        if (st["first"] is None or st["frames"] < UTTER_FRAMES
                or st["last"] <= st["first"]):
            incomplete += 1
            continue
        t_first = st["first"] - st["arrival"]
        # sustained delivery rate the listener's buffer refills at:
        # frames delivered AFTER the first callback over the delivery
        # interval (the first callback's frames arrive at t_first)
        r = (st["frames"] - st["first_n"]) / (st["last"] - st["first"])
        ttfa.append(t_first)
        rates.append(r)
        gaps.extend(st["gaps"])
        if t_first <= SLO_TTFA and r >= SLO_RATE:
            ok += 1
    n = len(ttfa)
    return {
        "streams": n,
        "incomplete": incomplete,
        "slo_pass_pct": round(100.0 * ok / max(n, 1), 1),
        "ttfa_p50_ms": round(pctl(ttfa, 50) * 1e3, 1),
        "ttfa_p99_ms": round(pctl(ttfa, 99) * 1e3, 1),
        "rate_p5": round(pctl(rates, 5), 2),
        "rate_p50": round(pctl(rates, 50), 2),
        "gap_p99_ms": round(pctl(gaps, 99) * 1e3, 1),
    }


def eval_config(params, args, name, wdtype, kvdtype, pipelined, ladder,
                duration_s, max_retries=2, max_seq=1024):
    rows = []
    capacity = 0
    fails = 0
    for n in ladder:
        server = BatchedServer(
            params, args, n_slots=n, max_seq_len=max_seq,
            temperature=0.9, topk=50, chunk_size=8, ramp_chunk=2,
            weight_dtype=wdtype, kv_dtype=kvdtype, pipelined=pipelined,
        )
        server.warmup()
        row = None
        for attempt in range(max_retries + 1):
            server.reset(seed=attempt)
            streams, step_wall = run_open_loop(
                server, args, n, duration_s, seed=attempt)
            if poisoned(step_wall) and attempt < max_retries:
                log(f"    N={n}: poisoned run (worst chunk "
                    f"{max(step_wall):.2f}s), retrying")
                continue
            row = summarize(streams)
            row.update({"target_concurrency": n,
                        "poisoned_retries": attempt,
                        "stall_poisoned": poisoned(step_wall)})
            break
        del server
        gc.collect()
        rows.append(row)
        passed = (row["slo_pass_pct"] >= SLO_PASS_PCT
                  and not row["stall_poisoned"])
        log(f"  {name} N={n}: pass {row['slo_pass_pct']}% "
            f"ttfa p50/p99 {row['ttfa_p50_ms']}/{row['ttfa_p99_ms']}ms "
            f"rate p5 {row['rate_p5']} gap p99 {row['gap_p99_ms']}ms"
            + (" [POISONED]" if row["stall_poisoned"] else ""))
        if passed:
            capacity = n
            fails = 0
        else:
            fails += 1
            if fails >= 2:
                break
    return capacity, rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--duration", type=float, default=40.0)
    ap.add_argument("--ladder", type=str, default="8,16,24,32,48,64")
    ap.add_argument("--out", type=str, default=None,
                    help="artifact path (default scripts/out/"
                         "bench_serving_slo.json)")
    ap.add_argument("--configs", type=str, default=None,
                    help="comma list of name:sched, e.g. "
                         "'int8+int8KV:pipelined,bf16:sync'")
    a = ap.parse_args()

    warm_transport_async(verbose=True)
    from csm_tpu.models.csm import init_csm_params

    global UTTER_FRAMES
    max_seq = 1024
    if os.environ.get("CSM_SLO_TINY"):
        # protocol-logic smoke mode (tests/test_bench_protocols.py)
        from csm_tpu.models.config import tiny_test_args

        args = tiny_test_args()
        UTTER_FRAMES = 30
        max_seq = 128
        params = init_csm_params(jax.random.key(0), args, jnp.float32)
    else:
        args = csm_1b_args()
        params = jax.jit(
            lambda k: init_csm_params(k, args, jnp.bfloat16))(jax.random.key(0))
    jax.block_until_ready(params["audio_head"])

    all_cfgs = {
        "bf16": ("bf16", "bf16"),
        "int8": ("int8", "bf16"),
        "int8+int8KV": ("int8", "int8"),
    }
    duration = 12.0 if a.quick else a.duration
    ladder = [int(x) for x in a.ladder.split(",")]
    if a.quick:
        ladder = ladder[:2]
    combos = []
    if a.configs:
        for spec in a.configs.split(","):
            cname, sched = spec.split(":")
            combos.append((cname, sched))
    else:
        combos = [(c, s) for c in all_cfgs
                  for s in (("pipelined",) if a.quick
                            else ("sync", "pipelined"))]

    t0 = time.time()
    artifact = {
        "protocol": "per-stream SLO (open-loop Poisson)",
        "slo": {"rate_frames_per_s": SLO_RATE, "ttfa_s": SLO_TTFA,
                "pass_pct": SLO_PASS_PCT},
        "utterance_frames": UTTER_FRAMES, "duration_s": duration,
        "chunk_size": 8, "ramp_chunk": 2, "configs": [],
    }
    for cname, sched in combos:
        wdtype, kvdtype = all_cfgs[cname]
        log(f"config {cname} {sched}:")
        cap, rows = eval_config(
            params, args, f"{cname}/{sched}", wdtype, kvdtype,
            sched == "pipelined", ladder, duration, max_seq=max_seq)
        artifact["configs"].append({
            "config": cname, "sched": sched,
            "capacity_streams": cap, "rows": rows,
        })
    artifact["wall_s"] = round(time.time() - t0, 1)

    print("\n## Per-stream SLO capacity — one window "
          f"(SLO: >= {SLO_RATE} f/s delivered, TTFA <= "
          f"{int(SLO_TTFA * 1e3)} ms, {SLO_PASS_PCT:.0f}% of streams)\n")
    print("| config | sched | capacity (concurrent real-time streams) | "
          "at capacity: TTFA p50/p99 ms | rate p5 f/s | gap p99 ms |")
    print("|---|---|---|---|---|---|")
    for c in artifact["configs"]:
        at = next((r for r in reversed(c["rows"])
                   if r["target_concurrency"] <= c["capacity_streams"]), None)
        cells = (f"{at['ttfa_p50_ms']}/{at['ttfa_p99_ms']}",
                 f"{at['rate_p5']}", f"{at['gap_p99_ms']}") if at else ("-",) * 3
        print(f"| {c['config']} | {c['sched']} | {c['capacity_streams']} | "
              + " | ".join(cells) + " |")
    print(f"\n(window: {artifact['wall_s']}s; Poisson arrivals at "
          f"N/{UTTER_FRAMES / FRAME_RATE:.1f}s, ~5 s utterances)")

    if a.out:
        path = a.out
    else:
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")
        os.makedirs(out, exist_ok=True)
        path = os.path.join(out, "bench_serving_slo.json")
    with open(path, "w") as f:
        json.dump(artifact, f, indent=2)
    log(f"wrote {path}")


if __name__ == "__main__":
    main()
