"""``csm-serve`` — batch/offline serving CLI over the continuous-batching
server.

Beyond-reference surface (the reference serves one utterance per process;
its only server is the watermarking demo, src/csm/watermarking/server.py):
reads a JSONL request file, serves every request through ONE
``BatchedServer`` (continuous frame-level batching, csm_tpu/serving.py),
writes one wav per request, prints aggregate stats.

Request lines: {"id": str|int, "text": "...", "speaker": 0,
                "max_audio_length_ms": 10000, "context": [
                  {"audio": "path.wav", "text": "...", "speaker": 1}, ...],
                "prefix": "voice-a"}   # optional: a --prefix preset name —
                  the preset's context KV is reused from the startup
                  registration instead of re-prefilled per request

Example:
    csm-serve --requests reqs.jsonl --output-dir out/ \
        --model-path ckpt.pt --mimi-path mimi.safetensors \
        --n-slots 16 --weight-dtype auto
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from csm_tpu.cli.common import add_tiny_test_flag, build_generator


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Serve CSM TTS requests (TPU)")
    p.add_argument("--model-path", type=str, default=None)
    p.add_argument("--flavor", choices=("1b", "8b", "tiny"), default="1b",
                   help="Model shape for --model-path checkpoints: 1b "
                        "(default), 8b (the original CSM's internal "
                        "scale; loads leaf-streamed — requires "
                        "--weight-dtype int8|int4 on one chip), or tiny "
                        "(file-format test fixture shape)")
    p.add_argument("--mimi-path", type=str, default=None)
    p.add_argument("--adapter", action="append", default=None,
                   metavar="NAME=PATH",
                   help="load a LoRA adapter dir under NAME (repeatable): "
                        "multi-LoRA serving — requests pick an adapter "
                        "with their JSON 'adapter' field; omitted = base "
                        "model. One server serves every speaker's "
                        "fine-tune (csm-finetune-lora-multi output)")
    p.add_argument("--lora-path", type=str, default=None,
                   help="LoRA adapter directory: merged into the base at "
                        "load (serve a fine-tune from the lora-only artifact)")
    p.add_argument("--prefix", action="append", default=None,
                   metavar="NAME=FILE.json",
                   help="register a shared context prefix (repeatable): "
                        "FILE.json holds {\"context\": [{audio, text, "
                        "speaker}, ...]} (or a bare list). The context is "
                        "Mimi-encoded and run through the backbone ONCE at "
                        "startup; requests opt in with a JSON "
                        "'prefix': NAME field and then carry only their "
                        "own text (+ any extra context) — admission seeds "
                        "the slot's KV from the cached prefix instead of "
                        "re-prefilling the preset on every request")
    p.add_argument("--requests", type=str, default=None,
                   help="JSONL file of requests ('-' = stdin); required "
                        "unless --http")
    p.add_argument("--output-dir", type=str, default="served")
    p.add_argument("--n-slots", type=int, default=8,
                   help="Concurrent decode slots (HBM-bound; 64 fits CSM-1B "
                        "on a v5e chip)")
    p.add_argument("--max-seq-len", type=int, default=2048)
    p.add_argument("--window", type=int, default=None,
                   help="Sliding-window KV size (columns) for UNBOUNDED "
                        "sessions: each stream keeps its prompt as a "
                        "never-evicted anchor and ring-writes decode "
                        "frames over the rest, so requests are not "
                        "capped by max_seq_len and decode cost stays "
                        "flat no matter how long the stream runs")
    p.add_argument("--chunk-size", type=int, default=8,
                   help="Decode frames per host round-trip")
    p.add_argument("--ramp-chunk", type=int, default=None,
                   help="Short decode chunk (< chunk-size) for the step "
                        "right after an admission: first audio streams "
                        "after this many frames instead of a full chunk "
                        "(cuts time-to-first-audio for --stream/--http "
                        "clients at one extra round-trip per admission)")
    p.add_argument("--pipelined", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="Keep one decode chunk in flight: dispatch chunk "
                        "N+1 before fetching chunk N, so the chip never "
                        "idles on the host round-trip (+11-22%% measured "
                        "at every slot count; results land one chunk "
                        "later, freed slots re-admit one chunk later). "
                        "ON by default; --no-pipelined restores the "
                        "strictly synchronous scheduler")
    p.add_argument("--kv-dtype", choices=("bf16", "int8"), default="bf16",
                   help="KV-cache storage: int8 quantizes K/V at write "
                        "(half the decode cache HBM stream, 2x slot "
                        "capacity per GiB)")
    p.add_argument("--weight-dtype",
                   choices=("bf16", "int8", "int8-decoder", "int4", "auto"),
                   default="bf16",
                   help="int8 halves weight reads (faster at every measured "
                        "slot count); int8-decoder quantizes only the "
                        "acoustic decoder (c0 logits stay bit-identical to "
                        "bf16); bf16 is the quality-conservative default")
    p.add_argument("--temperature", type=float, default=0.9)
    p.add_argument("--topk", type=int, default=50)
    p.add_argument("--no-watermark", action="store_true")
    p.add_argument("--watermark-ckpt", type=str, default=None)
    p.add_argument("--follow", action="store_true",
                   help="Daemon mode (requires --requests -): admit JSONL "
                        "requests from stdin AS THEY ARRIVE (continuous "
                        "batching admits each at the next frame boundary), "
                        "write each wav the moment its request finishes, "
                        "exit on stdin EOF once everything drains.")
    p.add_argument("--http", type=str, default=None, metavar="[HOST:]PORT",
                   help="HTTP daemon (stdlib, no extra deps): POST "
                        "/generate with the same JSON schema as a request "
                        "line returns audio/wav; concurrent requests share "
                        "the continuous-batching decode. GET /health for "
                        "stats; POST /shutdown for orderly exit. Default "
                        "host 127.0.0.1.")
    p.add_argument("--http-queue", type=int, default=64,
                   help="Admission-queue bound for --http: requests beyond "
                        "n_slots active + this many queued get an immediate "
                        "503 instead of unbounded buffering (backpressure; "
                        "0 = unbounded).")
    p.add_argument("--warmup", action="store_true",
                   help="compile every serving program (all prompt "
                        "buckets, decode, registered prefixes) BEFORE "
                        "accepting traffic — daemons otherwise pay each "
                        "program's first compile on its first live request "
                        "(minutes on a cold persistent cache)")
    p.add_argument("--stream", action="store_true",
                   help="Stream per-request audio while decoding: each "
                        "request's frames are Mimi-decoded incrementally "
                        "(carried codec state, O(chunk) per chunk) and its "
                        "wav is written the moment the request finishes — "
                        "not after the whole batch.  Reports per-request "
                        "first-audio latency.  Watermarking is skipped in "
                        "stream mode (it operates on complete utterances).")
    add_tiny_test_flag(p)
    return p


class _ChunkedDecodeSink:
    """Shared ``on_frames`` machinery: buffer token frames, stream-decode
    fixed ``chunk``-frame blocks through a per-request carried-state Mimi
    decoder (csm_tpu/codec/streaming.py), dispatch ASYNCHRONOUSLY (codec
    decode overlaps the server's next token chunk), and hand each
    (device_audio, keep_samples) pair to a subclass hook."""

    def __init__(self, decoder, chunk):
        self.decoder, self.chunk = decoder, max(1, chunk)
        self.frames = []  # buffered (K,) token rows
        self.decoded = 0

    def _decode(self, n, pad_to=None):
        import numpy as np

        block = np.stack(self.frames[self.decoded : self.decoded + n])
        if pad_to and block.shape[0] < pad_to:  # final remnant only
            block = np.concatenate(
                [block, np.zeros((pad_to - block.shape[0], block.shape[1]),
                                 block.dtype)]
            )
        audio = self.decoder.decode_chunk_async(block.T)
        self.decoded += n
        self._emit(audio, n * self.decoder.cfg.samples_per_frame)

    def _emit(self, device_audio, keep):  # pragma: no cover - abstract
        raise NotImplementedError

    def _finish(self):
        raise NotImplementedError

    def __call__(self, rid, new, done):
        self.frames.extend(new)
        while len(self.frames) - self.decoded >= self.chunk:
            self._decode(self.chunk)
        if done:
            rem = len(self.frames) - self.decoded
            if rem:
                self._decode(rem, pad_to=self.chunk)
            self._finish()


class _StreamSink(_ChunkedDecodeSink):
    """``--stream`` to disk: collect decoded chunks, time first audio,
    write the wav the moment the request finishes.  Only the FIRST chunk
    blocks (it times first-audio); the rest are fetched at wav-write
    time."""

    def __init__(self, rid, decoder, chunk, out_path, sample_rate, t0):
        super().__init__(decoder, chunk)
        self.rid = rid
        self.out_path, self.sample_rate, self.t0 = out_path, sample_rate, t0
        self.audio = []
        self.first_audio_s = None
        self.done_s = None

    def _emit(self, device_audio, keep):
        import time as _t

        self.audio.append((device_audio, keep))
        if self.first_audio_s is None:
            import jax

            jax.block_until_ready(device_audio)
            self.first_audio_s = _t.time() - self.t0

    def _finish(self):
        import time as _t

        import numpy as np

        from csm_tpu.data.audio import save_wav

        self.done_s = _t.time() - self.t0
        audio = (
            np.concatenate(
                [np.asarray(a, np.float32)[:keep] for a, keep in self.audio]
            )
            if self.audio
            else np.zeros(0, np.float32)
        )
        save_wav(self.out_path, audio, self.sample_rate)


class _HttpStreamSink(_ChunkedDecodeSink):
    """``--http --stream``: enqueue (device_audio, keep) pairs for the
    HTTP handler thread, which converts to s16le PCM and writes a
    close-delimited response — the serving thread never blocks on codec
    decode, and audio reaches the client while the request is still
    decoding."""

    def __init__(self, decoder, chunk):
        import queue

        super().__init__(decoder, chunk)
        self.q: "queue.Queue" = queue.Queue()

    def _emit(self, device_audio, keep):
        self.q.put((device_audio, keep))

    def _finish(self):
        self.q.put(None)

    @staticmethod
    def to_pcm(item) -> bytes:
        import numpy as np

        device_audio, keep = item
        audio = np.asarray(device_audio, np.float32)[:keep]
        return np.clip(audio * 32767.0, -32768, 32767).astype("<i2").tobytes()


def load_requests(path: str):
    f = sys.stdin if path == "-" else open(path)
    reqs = []
    for line in f:
        line = line.strip()
        if line:
            reqs.append(json.loads(line))
    if f is not sys.stdin:
        f.close()
    return reqs


class _StdinPoller:
    """Drain whatever COMPLETE lines stdin has right now, without blocking.

    Reads the raw fd with os.read (never sys.stdin.readline: a multi-line
    write() would land in Python's internal buffer where select() can't
    see it, stranding every line after the first; and a partial line
    would block the whole serving loop).  Partial trailing lines stay in
    ``self.buf`` until their newline (or EOF) arrives."""

    def __init__(self, fd: int = 0):
        self.fd = fd
        self.buf = b""
        self.eof = False

    def poll(self):
        """Returns (lines, eof)."""
        import select

        while not self.eof and select.select([self.fd], [], [], 0.0)[0]:
            chunk = os.read(self.fd, 65536)
            if chunk == b"":
                self.eof = True
                break
            self.buf += chunk
        *complete, rest = self.buf.split(b"\n")
        if self.eof and rest:
            complete.append(rest)  # unterminated final line
            rest = b""
        self.buf = rest
        lines = []
        for raw in complete:
            line = raw.decode("utf-8", errors="replace").strip()
            if line:
                lines.append(line)
        return lines, self.eof


def _serve_follow(args, server, to_stream_request, attach_sink, emit_result,
                  drop_sink=lambda rid: None, register_prefix_file=None):
    """Daemon loop: poll stdin for new JSONL requests, admit them at frame
    boundaries (continuous batching), emit each result the moment it
    finishes; exit at EOF once pending + active drain."""
    import json as _json

    pending = []
    n_served = 0
    total_frames = 0  # counts only: a daemon must not retain results
    eof = False
    n_seen = 0
    in_flight = set()  # request ids (duplicate-id guard)
    poller = _StdinPoller()
    t0 = time.time()
    while True:
        if not eof:
            lines, eof = poller.poll()
            for line in lines:
                try:
                    r = _json.loads(line)
                except ValueError as e:
                    print(f"  bad request line skipped: {e}", file=sys.stderr)
                    continue
                if isinstance(r, dict) and (
                        "load_adapter" in r or "unload_adapter" in r
                        or "register_prefix" in r
                        or "unregister_prefix" in r):
                    # hot reload: {"load_adapter": {"name","path"}} /
                    # {"unload_adapter": NAME} / {"register_prefix":
                    # {"name","path"[,"adapter"]}} /
                    # {"unregister_prefix": NAME}
                    try:
                        if "load_adapter" in r:
                            spec = r["load_adapter"]
                            aid = server.add_adapter(spec["name"],
                                                     spec["path"])
                            print(f"  adapter {spec['name']!r} loaded "
                                  f"(id {aid})", file=sys.stderr)
                        elif "unload_adapter" in r:
                            server.remove_adapter(r["unload_adapter"])
                            print(f"  adapter {r['unload_adapter']!r} "
                                  f"unloaded", file=sys.stderr)
                        elif "register_prefix" in r:
                            spec = r["register_prefix"]
                            register_prefix_file(spec["name"], spec["path"],
                                                 spec.get("adapter"))
                        else:
                            server.unregister_prefix(r["unregister_prefix"])
                            print(f"  prefix {r['unregister_prefix']!r} "
                                  f"unregistered", file=sys.stderr)
                    except Exception as e:  # daemon survives bad specs
                        print(f"  reload op failed: {e!r}", file=sys.stderr)
                    continue
                if isinstance(r, dict) and "cancel" in r:
                    # {"cancel": ID}: abort an in-flight request — the
                    # slot frees on device at the next chunk boundary
                    cid = r["cancel"]
                    n_before = len(pending)
                    pending = [p for p in pending if p.request_id != cid]
                    res = server.cancel(cid)
                    if res is not None or len(pending) != n_before:
                        in_flight.discard(cid)
                        if res is not None:
                            emit_result(res)  # partial wav + sink cleanup
                        print(f"  cancelled {cid!r}"
                              + (f" after {res.n_steps} frames" if res else
                                 " (not yet admitted)"),
                              file=sys.stderr)
                    else:
                        print(f"  cancel {cid!r}: not in flight",
                              file=sys.stderr)
                    continue
                try:
                    sr = to_stream_request(n_seen, r)
                except Exception as e:
                    # a daemon must outlive ANY malformed request
                    rid = r.get("id", n_seen) if isinstance(r, dict) else n_seen
                    print(f"  bad request {rid!r} skipped: {e!r}",
                          file=sys.stderr)
                    sr = None
                n_seen += 1
                if sr is None:
                    continue
                if sr.request_id in in_flight:
                    # two in-flight requests with one id would share a sink
                    # and a wav path; reject the latecomer loudly
                    print(f"  duplicate in-flight id {sr.request_id!r} "
                          f"rejected", file=sys.stderr)
                    continue
                in_flight.add(sr.request_id)
                if args.stream:
                    attach_sink(sr, time.time())  # latency from ARRIVAL
                pending.append(sr)
        while pending:
            try:
                if server.submit(pending[0]) is None:
                    break  # no free slot; retry next tick
            except ValueError as e:
                # e.g. its adapter was unloaded while it sat pending —
                # fail THIS request, not the daemon
                sr = pending.pop(0)
                print(f"  request {sr.request_id!r} dropped at submit: {e}",
                      file=sys.stderr)
                in_flight.discard(sr.request_id)
                if sr.on_frames is not None:  # close + release its sink
                    import numpy as np

                    sr.on_frames(sr.request_id,
                                 np.zeros((0, 0), np.int32), True)
                    drop_sink(sr.request_id)
                continue
            pending.pop(0)
        done = server.step()
        for res in done:
            emit_result(res)
            in_flight.discard(res.request_id)
            n_served += 1
            total_frames += res.n_steps
        idle = not server.active.any() and not pending
        if idle:
            if eof:
                break
            time.sleep(0.02)  # nothing in flight; wait for stdin
    wall = time.time() - t0
    stats = {
        "total_frames": total_frames,
        "frames_per_s": total_frames / max(wall, 1e-9),
        "aggregate_rtf": total_frames / 12.5 / max(wall, 1e-9),
    }
    return n_served, stats, wall


def _make_http_handler(server, inbox, stop, stats_box, sample_rate,
                       cancel_q):
    """Build the request-handler class for ``_serve_http``.

    Module-level factory (not a closure inside ``_serve_http``) so the
    admission/overload protocol — 404/400/413/**503 when the bounded
    inbox is full** — is unit-testable without a live server
    (tests/test_cli.py)."""
    import json as _json
    import queue
    import threading
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        timeout = 120  # socket timeout: a stalled client can't pin a thread
        max_body = 16 * 1024 * 1024  # request JSON cap (context is paths)

        def log_message(self, fmt, *a):  # quiet access log
            pass

        def _json_reply(self, code, obj):
            body = _json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/metrics":
                # Prometheus text exposition (no deps): scrapeable by any
                # standard monitoring stack
                lines = []
                for name, typ, val in (
                    ("csm_serve_slots", "gauge", server.n_slots),
                    ("csm_serve_active_slots", "gauge",
                     int(server.active.sum())),
                    ("csm_serve_queue_depth", "gauge", inbox.qsize()),
                    ("csm_serve_requests_total", "counter",
                     stats_box.get("served", 0)),
                    ("csm_serve_frames_total", "counter",
                     stats_box.get("frames", 0)),
                    ("csm_serve_cancelled_total", "counter",
                     stats_box.get("cancelled", 0)),
                    ("csm_serve_uptime_seconds", "gauge",
                     time.time() - stats_box.get("t0", time.time())),
                ):
                    lines.append(f"# TYPE {name} {typ}")
                    lines.append(f"{name} {val}")
                body = ("\n".join(lines) + "\n").encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if self.path != "/health":
                return self._json_reply(
                    404, {"error": "GET /health or /metrics"})
            self._json_reply(200, {
                "status": "ok", "n_slots": server.n_slots,
                "active": int(server.active.sum()),
                "adapters": sorted(server._adapter_id),
                "prefixes": sorted(server._prefixes),
                **{k: v for k, v in stats_box.items() if k != "t0"},
            })

        def do_POST(self):
            if self.path == "/shutdown":
                stop.set()
                return self._json_reply(200, {"status": "shutting down"})
            if self.path in ("/adapters", "/prefixes"):
                # hot (un)load: {"name","path"} loads, {"name",
                # "unload":true} unloads.  /prefixes additionally takes
                # an optional "adapter" (prefill the preset under it).
                # Executed on the DRIVE thread (it owns the server) via
                # the same inbox as /generate.
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    req = _json.loads(self.rfile.read(n))
                    assert isinstance(req, dict) and "name" in req
                except Exception:
                    return self._json_reply(
                        400, {"error": 'body must be {"name", "path"} or '
                                       '{"name", "unload": true}'})
                done = threading.Event()
                holder: dict = {}
                op = {"/adapters": "adapter", "/prefixes": "prefix"}
                inbox.put(((op[self.path], req), done, holder))
                done.wait()
                code = 200 if "error" not in holder else 400
                return self._json_reply(
                    code, holder.get("json", holder))
            if self.path != "/generate":
                return self._json_reply(
                    404, {"error": "POST /generate, /adapters or "
                                   "/prefixes"})
            try:
                n = int(self.headers.get("Content-Length", "0"))
                if not 0 <= n <= self.max_body:
                    return self._json_reply(413, {"error": "body too large"})
                req = _json.loads(self.rfile.read(n))
                if not isinstance(req, dict):
                    raise ValueError("request body must be a JSON object")
            except (ValueError, OSError) as e:
                return self._json_reply(400, {"error": f"bad request: {e}"})
            done = threading.Event()
            holder: dict = {}
            try:
                inbox.put_nowait((req, done, holder))
            except queue.Full:  # backpressure: bounded admission queue
                return self._json_reply(
                    503, {"error": "server overloaded, retry later"}
                )
            done.wait()
            if "error" in holder:
                return self._json_reply(400, {"error": holder["error"]})
            if "pcm_queue" in holder:  # --stream: close-delimited PCM
                self.send_response(200)
                self.send_header(
                    "Content-Type",
                    f"audio/L16;rate={sample_rate};channels=1",
                )
                self.end_headers()
                q = holder["pcm_queue"]
                while True:
                    item = q.get()
                    if item is None:
                        break
                    # device→PCM conversion happens HERE, off the serving
                    # thread — codec decode overlaps the next token chunk
                    try:
                        self.wfile.write(_HttpStreamSink.to_pcm(item))
                        self.wfile.flush()
                    except OSError:  # client hung up mid-stream: free the
                        cancel_q.put(holder.get("request_id"))  # slot now
                        return
                self.close_connection = True
                return
            wav = holder["wav"]
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(wav)))
            self.send_header("X-Frames", str(holder["frames"]))
            self.end_headers()
            self.wfile.write(wav)

    return Handler


def _serve_http(args, server, to_stream_request, finish_audio,
                make_stream_sink=None, sample_rate=24_000,
                register_prefix_file=None):
    """HTTP daemon: handler threads enqueue requests and block on a
    per-request event; the MAIN thread is the only one driving the
    BatchedServer (admit at frame boundaries, decode chunks, fulfill
    waiters with in-memory wav bytes).  Continuous batching means
    concurrent POSTs decode together.

    With ``make_stream_sink`` (``--stream``), responses are s16le PCM
    streamed close-delimited as decode chunks complete — first audio
    reaches the client while its request is still decoding.

    Overloaded (inbox at ``--http-queue`` bound) POSTs get an immediate
    503; if the drive loop dies, every blocked handler is fulfilled with
    an error before the exception propagates."""
    import queue
    import threading
    from http.server import ThreadingHTTPServer

    host, _, port = args.http.rpartition(":")
    host = host or "127.0.0.1"
    inbox: "queue.Queue" = queue.Queue(maxsize=getattr(args, "http_queue", 0))
    cancel_q: "queue.Queue" = queue.Queue()  # rids of hung-up stream clients
    stop = threading.Event()
    stats_box = {"served": 0, "frames": 0, "cancelled": 0, "t0": time.time()}
    Handler = _make_http_handler(server, inbox, stop, stats_box, sample_rate,
                                 cancel_q)
    httpd = ThreadingHTTPServer((host, int(port)), Handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    # graceful drain on SIGTERM/SIGINT (the orchestrator's stop signal):
    # finish in-flight requests, refuse nothing mid-decode, then exit —
    # same path as POST /shutdown
    import signal

    def _drain(signum, frame):
        print(f"signal {signum}: draining in-flight requests...", flush=True)
        stop.set()

    prev_handlers = {
        s: signal.signal(s, _drain) for s in (signal.SIGTERM, signal.SIGINT)
    }
    print(f"Serving on http://{host}:{port} (POST /generate, GET /health, "
          f"GET /metrics, POST /shutdown; SIGTERM drains)", flush=True)

    waiters = {}  # request_id -> (done_event, holder)
    pending = []
    n_seen = 0
    t0 = time.time()
    total_frames = 0
    n_served = 0
    def admit(req, done, holder):
        nonlocal n_seen
        if isinstance(req, tuple) and req[0] in ("adapter", "prefix"):
            kind, spec = req
            try:
                if spec.get("unload"):
                    if kind == "adapter":
                        server.remove_adapter(spec["name"])
                    else:
                        server.unregister_prefix(spec["name"])
                    holder["json"] = {"status": "unloaded",
                                      "name": spec["name"]}
                elif kind == "adapter":
                    aid = server.add_adapter(spec["name"], spec["path"])
                    holder["json"] = {"status": "loaded",
                                      "name": spec["name"], "id": aid}
                else:
                    pre = register_prefix_file(
                        spec["name"], spec["path"], spec.get("adapter"))
                    holder["json"] = {"status": "loaded",
                                      "name": spec["name"],
                                      "frames": pre.length,
                                      "bucket": pre.bucket}
            except Exception as e:
                holder["error"] = repr(e)
            done.set()
            return
        try:
            sr = to_stream_request(n_seen, req)
            if sr is None:  # validation-rejected (e.g. prompt too long)
                holder["error"] = "request rejected (see server log)"
                done.set()
        except Exception as e:  # network-facing: a daemon must outlive
            holder["error"] = repr(e)  # ANY malformed request
            done.set()
            sr = None
        if sr is not None:
            sr.request_id = n_seen  # unique key even if ids collide
            holder["request_id"] = n_seen  # handlers cancel by this key
            if make_stream_sink is not None:
                sink = make_stream_sink()
                sr.on_frames = sink
                holder["pcm_queue"] = sink.q
                done.set()  # handler starts streaming immediately
            waiters[n_seen] = (done, holder)
            pending.append(sr)
        n_seen += 1

    try:
        while not (stop.is_set() and not pending and not server.active.any()
                   and inbox.empty()):
            try:
                # block briefly for the first arrival, then DRAIN the inbox —
                # k simultaneous clients admit into one k-slot decode, not
                # one per chunk
                admit(*inbox.get(
                    timeout=0.02 if (pending or server.active.any()) else 0.25
                ))
                while True:
                    admit(*inbox.get_nowait())
            except queue.Empty:
                pass
            # hung-up stream clients: kill the slot on device (no decode
            # work wasted on an audience of zero) / drop from pending
            while True:
                try:
                    rid = cancel_q.get_nowait()
                except queue.Empty:
                    break
                if rid is None or rid not in waiters:
                    continue
                pending[:] = [p for p in pending if p.request_id != rid]
                server.cancel(rid)  # no-op if it was still pending
                waiters.pop(rid, None)
                stats_box["cancelled"] += 1
            while pending:
                try:
                    if server.submit(pending[0]) is None:
                        break  # no free slot; retry next tick
                except ValueError as e:
                    # e.g. its adapter was unloaded while it sat pending —
                    # fail THIS request, not the daemon
                    sr = pending.pop(0)
                    dw = waiters.pop(sr.request_id, None)
                    if dw is not None:
                        done, holder = dw
                        if "pcm_queue" in holder:  # stream already replied
                            holder["pcm_queue"].put(None)
                        holder.setdefault("error", str(e))
                        done.set()
                    continue
                pending.pop(0)
            for res in server.step():
                done, holder = waiters.pop(res.request_id)
                if "pcm_queue" not in holder:  # streamed: sink already closed
                    holder["wav"] = finish_audio(res)
                    holder["frames"] = res.frames.shape[0]
                    done.set()
                total_frames += res.frames.shape[0]
                n_served += 1
                stats_box["served"] = n_served
                stats_box["frames"] = total_frames
    finally:
        # if the drive loop dies (device error in step/submit), every
        # blocked handler thread gets an error reply instead of hanging
        # until process exit
        for done, holder in waiters.values():
            if "pcm_queue" in holder:  # streamed: handler blocks on q.get()
                holder["pcm_queue"].put(None)
            if not done.is_set():
                holder.setdefault("error", "server loop terminated")
                done.set()
        waiters.clear()
        httpd.shutdown()
        for s, h in prev_handlers.items():  # restore (tests call in-process)
            signal.signal(s, h)
    # close the shutdown race: a /generate that slipped into the inbox
    # after the final emptiness check gets an error reply, not a hang
    while True:
        try:
            _, done, holder = inbox.get_nowait()
        except queue.Empty:
            break
        holder["error"] = "server shutting down"
        done.set()
    wall = time.time() - t0
    stats = {
        "total_frames": total_frames,
        "frames_per_s": total_frames / max(wall, 1e-9),
        "aggregate_rtf": total_frames / 12.5 / max(wall, 1e-9),
    }
    print(f"HTTP served {n_served} requests in {wall:.2f}s: "
          f"{total_frames} frames")
    return n_served, stats, wall


def main(argv=None) -> int:
    from csm_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    args = build_parser().parse_args(argv)
    from csm_tpu.serving import BatchedServer, StreamRequest

    if args.http:
        if args.follow:
            print("--http is exclusive with --follow", file=sys.stderr)
            return 2
        if args.requests is not None:
            print("--http is exclusive with --requests (requests arrive "
                  "over HTTP)", file=sys.stderr)
            return 2
        raw = []
        mode = " --stream (PCM streaming)" if args.stream else ""
        print(f"Loading model... (--http {args.http}{mode})")
    elif args.follow:
        if args.requests != "-":
            print("--follow requires --requests - (stdin)", file=sys.stderr)
            return 2
        raw = []
        print("Loading model... (--follow: requests from stdin)")
    elif args.requests is None:
        print("--requests is required (or use --http)", file=sys.stderr)
        return 2
    else:
        raw = load_requests(args.requests)
        if not raw:
            print("no requests", file=sys.stderr)
            return 1
        print(f"Loading model... ({len(raw)} requests)")
    t0 = time.time()
    generator = build_generator(args)
    if args.tiny_test:
        args.max_seq_len = min(args.max_seq_len, generator.max_seq_len)
    wmark = None
    if not args.no_watermark:
        from csm_tpu.watermarking import load_watermarker, watermark

        w = load_watermarker(args.watermark_ckpt)
        wmark = lambda audio, sr: watermark(w, audio, sr)  # noqa: E731
    print(f"Model ready in {time.time() - t0:.1f}s")

    from csm_tpu.generator import MS_PER_FRAME, Segment

    def to_stream_request(i, r):
        ctx = []
        for c in r.get("context", []):
            from csm_tpu.data.audio import load_audio

            ctx.append(Segment(
                speaker=int(c["speaker"]), text=c["text"],
                audio=load_audio(c["audio"], generator.sample_rate),
            ))
        prefix = r.get("prefix")
        pb = 0
        if prefix is not None:
            pre = server._prefixes.get(prefix)
            if pre is None:
                print(f"  skipping {r.get('id', i)}: unknown prefix "
                      f"{prefix!r} (registered: "
                      f"{sorted(server._prefixes)})", file=sys.stderr)
                return None
            pb = pre.bucket
        adapter = r.get("adapter")
        if adapter is not None and adapter not in server._adapter_id:
            # validate HERE, not at server.submit: a ValueError from the
            # drive loop's deferred submit would kill the whole daemon
            print(f"  skipping {r.get('id', i)}: unknown adapter "
                  f"{adapter!r} (loaded: {sorted(server._adapter_id)})",
                  file=sys.stderr)
            return None
        # with a prefix, the request's own tokens hold only its extra
        # context + text; the preset's frames live in the cached KV
        tokens, mask = generator._build_prompt(
            r["text"], int(r.get("speaker", 0)), ctx
        )
        budget_ms = float(r.get("max_audio_length_ms", 10_000))
        # mirror BatchedServer.submit's check: the ROUNDED-UP prompt bucket
        # plus the frame budget must fit max_seq_len
        from csm_tpu.models.generation import PROMPT_BUCKETS, bucket_length

        cache_len = args.window or args.max_seq_len
        try:
            bucket = bucket_length(
                tokens.shape[0],
                tuple(b for b in PROMPT_BUCKETS if b <= cache_len),
            )
        except ValueError:
            bucket = cache_len  # prompt exceeds every bucket
        if args.window is not None:
            # sliding-window serving: the budget is NOT seq-len-capped —
            # the ring evicts; the prompt just has to leave a ring
            if pb + bucket + 2 * args.chunk_size + 2 > args.window:
                print(f"  skipping {r.get('id', i)}: prompt "
                      f"({tokens.shape[0]} frames, bucket {pb + bucket} "
                      f"incl. prefix) leaves no decode ring in window "
                      f"{args.window}", file=sys.stderr)
                return None
            max_frames = max(1, int(budget_ms / MS_PER_FRAME))
        else:
            if pb + bucket + 1 > args.max_seq_len:
                print(f"  skipping {r.get('id', i)}: prompt "
                      f"({tokens.shape[0]} frames, bucket {pb + bucket} "
                      f"incl. prefix) leaves no room in max_seq_len "
                      f"{args.max_seq_len}", file=sys.stderr)
                return None
            max_frames = max(1, min(
                int(budget_ms / MS_PER_FRAME),
                args.max_seq_len - pb - bucket,
            ))
        return StreamRequest(tokens, mask, max_frames=max_frames,
                             request_id=r.get("id", i),
                             adapter=adapter, prefix=prefix)

    adapters = None
    if args.adapter:
        adapters = {}
        for spec in args.adapter:
            if "=" not in spec:
                print(f"--adapter must be NAME=PATH, got {spec!r}",
                      file=sys.stderr)
                return 2
            name, path = spec.split("=", 1)
            adapters[name] = path
    ramp_chunk = args.ramp_chunk
    if ramp_chunk is None and (args.stream or args.http) and args.chunk_size > 2:
        # streaming clients care about time-to-first-audio: default to a
        # 2-frame post-admission ramp (measured sane point; explicit
        # --ramp-chunk overrides, chunk sizes <= 2 ramp nothing)
        ramp_chunk = 2
    server = BatchedServer(
        generator.params, generator.args, n_slots=args.n_slots,
        max_seq_len=args.max_seq_len, temperature=args.temperature,
        topk=args.topk, compute_dtype=generator.compute_dtype,
        chunk_size=args.chunk_size, ramp_chunk=ramp_chunk,
        weight_dtype=args.weight_dtype,
        kv_dtype=args.kv_dtype, adapters=adapters,
        pipelined=args.pipelined, window=args.window,
    )
    def register_prefix_file(name, path, adapter=None):
        """Mimi-encode + backbone-prefill a preset context JSON file
        (``{"context": [{"audio", "text", "speaker"}, ...]}``) into the
        server's prefix cache."""
        from csm_tpu.data import frames as fr
        from csm_tpu.data.audio import load_audio

        with open(path) as f:
            ctx = json.load(f)
        if isinstance(ctx, dict):
            ctx = ctx.get("context", [])
        t0p = time.time()
        parts = [generator._segment_frames(Segment(
            speaker=int(c["speaker"]), text=c["text"],
            audio=load_audio(c["audio"], generator.sample_rate),
        )) for c in ctx]
        tokens, mask = fr.concat_frames(parts)
        pre = server.register_prefix(name, tokens, mask, adapter=adapter)
        print(f"  prefix {name!r}: {pre.length} frames "
              f"(bucket {pre.bucket}) cached in "
              f"{time.time() - t0p:.2f}s", file=sys.stderr)
        return pre

    if args.prefix:
        for spec in args.prefix:
            if "=" not in spec:
                print(f"--prefix must be NAME=FILE.json, got {spec!r}",
                      file=sys.stderr)
                return 2
            name, path = spec.split("=", 1)
            register_prefix_file(name, path)
    if args.warmup:
        print("Warming serving programs...", flush=True)
        dt = server.warmup(verbose=True)
        print(f"Warmup done in {dt:.1f}s", flush=True)
    os.makedirs(args.output_dir, exist_ok=True)
    from csm_tpu.data.audio import save_wav

    if args.stream and wmark is not None:
        print("--stream: skipping watermark (whole-utterance op); "
              "watermark the written wavs with csm-verify's encoder "
              "if needed", file=sys.stderr)
        wmark = None

    sinks = {}

    def attach_sink(sr_req, t_ref):
        """Stream mode: per-request carried-state decoder + wav writer.
        ``t_ref`` anchors first-audio timing (serve start in batch mode,
        request arrival in --follow mode)."""
        out = os.path.join(args.output_dir, f"{sr_req.request_id}.wav")
        sink = _StreamSink(
            sr_req.request_id, generator.mimi.stream_decoder(),
            args.chunk_size, out, generator.sample_rate, t_ref,
        )
        sinks[sr_req.request_id] = sink
        sr_req.on_frames = sink

    def emit_result(res):
        out = os.path.join(args.output_dir, f"{res.request_id}.wav")
        if args.stream:
            # pop: a long-running --follow daemon must not retain every
            # request's decoded audio + carried decoder state
            sink = sinks.pop(res.request_id)
            print(f"  {out}: {res.frames.shape[0]} frames "
                  f"({res.frames.shape[0] * MS_PER_FRAME / 1000:.2f}s) "
                  f"first audio +{(sink.first_audio_s or 0) * 1000:.0f} ms, "
                  f"done +{(sink.done_s or 0):.2f} s")
            return
        audio = generator.mimi.decode(res.frames.T)
        if wmark is not None and audio.shape[0]:
            audio, _ = wmark(audio, generator.sample_rate)
        save_wav(out, audio, generator.sample_rate)
        print(f"  {out}: {res.frames.shape[0]} frames "
              f"({res.frames.shape[0] * MS_PER_FRAME / 1000:.2f}s)")

    if args.http:
        from csm_tpu.data.audio import wav_bytes

        def finish_audio(res):
            audio = generator.mimi.decode(res.frames.T)
            if wmark is not None and audio.shape[0]:
                audio, _ = wmark(audio, generator.sample_rate)
            return wav_bytes(audio, generator.sample_rate)

        make_sink = None
        if args.stream:
            make_sink = lambda: _HttpStreamSink(  # noqa: E731
                generator.mimi.stream_decoder(), args.chunk_size
            )
        n_served, stats, wall = _serve_http(
            args, server, to_stream_request, finish_audio,
            make_stream_sink=make_sink, sample_rate=generator.sample_rate,
            register_prefix_file=register_prefix_file,
        )
        print(f"Served {n_served} requests in {wall:.2f}s: "
              f"{stats['total_frames']} frames, "
              f"aggregate RTF {stats['aggregate_rtf']:.2f} "
              f"(weights {server.weight_dtype}, {args.n_slots} slots)")
        return 0
    if args.follow:
        n_served, stats, wall = _serve_follow(
            args, server, to_stream_request, attach_sink, emit_result,
            drop_sink=lambda rid: sinks.pop(rid, None),
            register_prefix_file=register_prefix_file,
        )
    else:
        requests = []
        seen_ids = set()
        for i, r in enumerate(raw):
            sr = to_stream_request(i, r)
            if sr is None:
                continue
            if sr.request_id in seen_ids:  # one sink + wav path per id
                print(f"  duplicate id {sr.request_id!r} rejected",
                      file=sys.stderr)
                continue
            seen_ids.add(sr.request_id)
            requests.append(sr)
        if not requests:
            print("no servable requests", file=sys.stderr)
            return 1
        t0 = time.time()
        if args.stream:
            for sr_req in requests:
                attach_sink(sr_req, t0)
        results, stats = server.run(requests)
        wall = time.time() - t0
        for res in results:
            emit_result(res)
        n_served = len(results)

    print(f"Served {n_served} requests in {wall:.2f}s: "
          f"{stats['total_frames']} frames, "
          f"{stats['frames_per_s']:.1f} frames/s decode, "
          f"aggregate RTF {stats['aggregate_rtf']:.2f} "
          f"(weights {server.weight_dtype}, {args.n_slots} slots)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
