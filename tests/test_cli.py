"""CLI tests: arg surfaces + tiny end-to-end runs.

Mirrors the reference's CLI smoke tests with mocked models
(src/csm/training/test_finetune.py:31-79,215) — here the --tiny-test
fixture path replaces mocking (real code, tiny weights)."""

import json
import os

import numpy as np
import pytest

from rig import scaled

from csm_tpu.cli import (
    benchmark_lora as cli_bench_lora,
    benchmark_tpu as cli_bench_tpu,
    finetune_lora as cli_lora,
    finetune_lora_multi as cli_multi,
    generate as cli_generate,
    serve as cli_serve,
    train as cli_train,
    verify as cli_verify,
)
from csm_tpu.data.audio import load_wav, save_wav


def make_training_dir(tmp_path, n=2, seconds=2.0, speaker_dir="data"):
    d = tmp_path / speaker_dir
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        t = np.arange(int(seconds * 24_000)) / 24_000
        audio = (0.1 * np.sin(2 * np.pi * (200 + 50 * i) * t)).astype(np.float32)
        save_wav(str(d / f"utt{i}.wav"), audio, 24_000)
        (d / f"utt{i}.txt").write_text(f"this is test utterance number {i} okay")
    return str(d)


def test_parsers_build():
    """Every CLI builds its parser (arg-surface sanity)."""
    cli_generate.build_parser().format_help()
    cli_train.build_parser().format_help()
    cli_lora.build_parser().format_help()
    cli_multi.build_parser().format_help()


def test_generate_tiny(tmp_path):
    out = str(tmp_path / "out.wav")
    rc = cli_generate.main([
        "--text", "hello tiny world", "--voice", "warm",
        "--output", out, "--max-audio-length-ms", "400",
        "--no-watermark", "--tiny-test", "--seed", "3",
    ])
    assert rc == 0
    audio, sr = load_wav(out)
    assert sr == 24_000
    assert audio.shape[0] <= 5 * 1920


def test_train_tiny(tmp_path):
    data = make_training_dir(tmp_path)
    out = str(tmp_path / "train_out")
    rc = cli_train.main([
        "--audio-dir", data, "--output-dir", out,
        "--batch-size", "1", "--epochs", "1", "--val-split", "0",
        "--save-every", "1000000", "--tiny-test",
    ])
    assert rc == 0
    assert os.path.isdir(os.path.join(out, "checkpoints", "final"))


def test_finetune_lora_tiny(tmp_path):
    data = make_training_dir(tmp_path)
    out = str(tmp_path / "lora_out")
    rc = cli_lora.main([
        "--audio-dir", data, "--output-dir", out,
        "--batch-size", "1", "--epochs", "1", "--val-split", "0",
        "--lora-r", "4", "--save-mode", "both",
        "--save-every", "1000000", "--tiny-test",
    ])
    assert rc == 0
    assert os.path.isdir(os.path.join(out, "adapter_lora"))
    assert os.path.isdir(os.path.join(out, "adapter_full"))


def test_finetune_lora_multi_tiny(tmp_path):
    d0 = make_training_dir(tmp_path, speaker_dir="sp0")
    d1 = make_training_dir(tmp_path, speaker_dir="sp1")
    cfg = [
        {"name": "alice", "speaker_id": 0, "audio_dir": d0, "transcript_dir": d0},
        {"name": "bob", "speaker_id": 1, "audio_dir": d1, "transcript_dir": d1,
         "lora_r": 2},
    ]
    cfg_path = tmp_path / "speakers.json"
    cfg_path.write_text(json.dumps(cfg))
    out = str(tmp_path / "multi_out")
    rc = cli_multi.main([
        "--speakers-config", str(cfg_path), "--output-dir", out,
        "--batch-size", "1", "--epochs", "1", "--val-split", "0",
        "--lora-r", "4", "--save-every", "1000000", "--tiny-test",
    ])
    assert rc == 0
    summary = json.loads(open(os.path.join(out, "summary.json")).read())
    assert {s["name"] for s in summary} == {"alice", "bob"}
    assert summary[1]["name"] == "bob"


def test_speakers_config_validation(tmp_path):
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps([{"name": "x", "speaker_id": 0}]))
    with pytest.raises(ValueError, match="missing field"):
        cli_multi.load_speaker_configs(str(bad))


def test_verify_cli(tmp_path):
    wav = str(tmp_path / "a.wav")
    save_wav(wav, np.random.default_rng(0).standard_normal(24_000).astype(np.float32) * 0.1, 24_000)
    # random-weight watermark models: just exercise the path; exit code 0/1
    rc = cli_verify.main([wav])
    assert rc in (0, 1)


def test_benchmark_tpu_cli(tmp_path, capsys):
    out = str(tmp_path / "bench.json")
    rc = cli_bench_tpu.main([
        "--steps", "2", "--gen-frames", "4", "--seq-len", "16", "--output", out,
    ])
    assert rc == 0
    data = json.loads(open(out).read())
    for k in ("model_init_s", "train_step_s", "gen_frames_per_s", "ckpt_save_s"):
        assert k in data


def test_benchmark_lora_cli(tmp_path):
    out = str(tmp_path / "lora_bench.md")
    rc = cli_bench_lora.main([
        "--ranks", "4", "--module-sets", "q_proj,v_proj",
        "--steps", "2", "--seq-lens", "16", "--output", out,
    ])
    assert rc == 0
    md = open(out).read()
    assert "LoRA Benchmark Report" in md
    assert os.path.exists(str(tmp_path / "lora_bench.json"))


def test_serve_tiny(tmp_path):
    """csm-serve: JSONL requests in, one wav per request out, through the
    continuous-batching server (int8 auto policy at this slot count)."""
    lines = [
        json.dumps(
            {"id": f"r{i}", "text": f"utterance {i}", "speaker": i % 2,
             "max_audio_length_ms": 400}
        )
        for i in range(3)
    ]
    # huge budget: must clamp against the ROUNDED-UP prompt bucket, not crash
    lines.append(json.dumps(
        {"id": "big", "text": "clamp me", "speaker": 0,
         "max_audio_length_ms": 100_000}))
    # prompt bucket leaves no frame room: skipped with a warning, not fatal
    lines.append(json.dumps(
        {"id": "huge", "text": "x" * 400, "speaker": 0,
         "max_audio_length_ms": 400}))
    reqs = tmp_path / "reqs.jsonl"
    reqs.write_text("\n".join(lines))
    out = tmp_path / "served"
    rc = cli_serve.main([
        "--requests", str(reqs), "--output-dir", str(out),
        "--n-slots", "2", "--chunk-size", "2", "--weight-dtype", "auto",
        "--no-watermark", "--tiny-test",
    ])
    assert rc == 0
    for i in range(3):
        audio, sr = load_wav(str(out / f"r{i}.wav"))
        assert sr == 24_000 and audio.shape[0] <= 5 * 1920
    assert os.path.exists(str(out / "big.wav"))
    assert not os.path.exists(str(out / "huge.wav"))


def test_generate_stream_tiny(tmp_path):
    out = str(tmp_path / "stream.wav")
    rc = cli_generate.main([
        "--text", "stream hello", "--speaker", "2",
        "--output", out, "--max-audio-length-ms", "400",
        "--chunk-frames", "2", "--stream",
        "--no-watermark", "--tiny-test", "--seed", "5",
    ])
    assert rc == 0
    audio, sr = load_wav(out)
    assert sr == 24_000 and audio.shape[0] <= 5 * 1920


def test_serve_stream_matches_batch(tmp_path):
    """csm-serve --stream: wavs written via per-request incremental Mimi
    decode (carried codec state) match the non-streamed batch decode."""
    lines = [
        json.dumps(
            {"id": f"s{i}", "text": f"stream utterance {i}", "speaker": i % 2,
             "max_audio_length_ms": 480}
        )
        for i in range(3)
    ]
    reqs = tmp_path / "reqs.jsonl"
    reqs.write_text("\n".join(lines))
    common = ["--requests", str(reqs), "--n-slots", "2", "--chunk-size", "2",
              "--no-watermark", "--tiny-test"]
    out_b = tmp_path / "batch"
    assert cli_serve.main(common + ["--output-dir", str(out_b)]) == 0
    out_s = tmp_path / "stream"
    assert cli_serve.main(common + ["--output-dir", str(out_s), "--stream"]) == 0
    for i in range(3):
        a, sr_a = load_wav(str(out_b / f"s{i}.wav"))
        b, sr_b = load_wav(str(out_s / f"s{i}.wav"))
        assert sr_a == sr_b == 24_000
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_serve_prefix_preset(tmp_path):
    """csm-serve --prefix: a shared voice-preset context is Mimi-encoded
    and prefilled ONCE at startup; requests opting in with "prefix" carry
    only their own text.  Unknown prefix names are skipped, not fatal."""
    t = np.arange(int(1.0 * 24_000)) / 24_000
    ctx_wav = tmp_path / "ctx.wav"
    save_wav(str(ctx_wav), (0.1 * np.sin(2 * np.pi * 220 * t)).astype(
        np.float32), 24_000)
    preset = tmp_path / "voice.json"
    preset.write_text(json.dumps({"context": [
        {"audio": str(ctx_wav), "text": "hi", "speaker": 1},
    ]}))
    lines = [
        json.dumps({"id": "p0", "text": "with preset", "speaker": 0,
                    "max_audio_length_ms": 400, "prefix": "warm"}),
        json.dumps({"id": "plain", "text": "no preset", "speaker": 0,
                    "max_audio_length_ms": 400}),
        json.dumps({"id": "bad", "text": "x", "speaker": 0,
                    "max_audio_length_ms": 400, "prefix": "nope"}),
    ]
    reqs = tmp_path / "reqs.jsonl"
    reqs.write_text("\n".join(lines))
    out = tmp_path / "served"
    rc = cli_serve.main([
        "--requests", str(reqs), "--output-dir", str(out),
        "--prefix", f"warm={preset}",
        "--n-slots", "2", "--chunk-size", "2",
        "--no-watermark", "--tiny-test",
    ])
    assert rc == 0
    for rid in ("p0", "plain"):
        audio, sr = load_wav(str(out / f"{rid}.wav"))
        assert sr == 24_000 and audio.shape[0] > 0
    assert not os.path.exists(str(out / "bad.wav"))


def test_stdin_poller_multi_line_and_partial():
    """--follow input handling: several JSONL lines arriving in ONE
    write() must all surface immediately (buffered readline strands all
    but the first), a partial trailing line must wait (not block), and
    an unterminated final line must flush at EOF."""
    import os as _os

    from csm_tpu.cli.serve import _StdinPoller

    r, w = _os.pipe()
    try:
        p = _StdinPoller(fd=r)
        _os.write(w, b'{"id":"a"}\n{"id":"b"}\n{"id":"c"')
        lines, eof = p.poll()
        assert lines == ['{"id":"a"}', '{"id":"b"}'] and not eof
        lines, eof = p.poll()  # partial line must not block or emit
        assert lines == [] and not eof
        _os.write(w, b'}\n')
        lines, eof = p.poll()
        assert lines == ['{"id":"c"}'] and not eof
        _os.write(w, b'{"id":"d"}')  # unterminated, then EOF
        _os.close(w)
        w = None
        lines, eof = p.poll()
        assert lines == ['{"id":"d"}'] and eof
    finally:
        _os.close(r)
        if w is not None:
            _os.close(w)


@pytest.mark.slow
def test_serve_follow_admits_incrementally(tmp_path):
    """csm-serve --follow: requests piped to stdin are admitted as they
    arrive (daemon mode), each wav lands when its request finishes, and
    the process exits cleanly on EOF."""
    import subprocess
    import sys
    import time as _time

    out = tmp_path / "followed"
    proc = subprocess.Popen(
        [sys.executable, "-m", "csm_tpu.cli.serve",
         "--requests", "-", "--follow", "--output-dir", str(out),
         "--tiny-test", "--no-watermark", "--n-slots", "2",
         "--chunk-size", "2"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    try:
        # "fa" twice in ONE write: both lines poll together, so the
        # second is still in flight when seen -> duplicate-id rejection
        proc.stdin.write(
            json.dumps({"id": "fa", "text": "first",
                        "max_audio_length_ms": 400}) + "\n"
            + json.dumps({"id": "fa", "text": "duplicate id",
                          "max_audio_length_ms": 400}) + "\n")
        proc.stdin.flush()
        _time.sleep(1.0)  # second request arrives later
        proc.stdin.write(json.dumps(
            {"id": "fb", "text": "second arrives later",
             "max_audio_length_ms": 400}) + "\n")
        # communicate() flushes + closes stdin (EOF) and drains stdout
        stdout = proc.communicate(timeout=scaled(900))[0]
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, stdout
    for rid in ("fa", "fb"):
        audio, sr = load_wav(str(out / f"{rid}.wav"))
        assert sr == 24_000 and audio.shape[0] <= 5 * 1920
    assert "duplicate in-flight id 'fa' rejected" in stdout, stdout
    assert "Served 2 requests" in stdout, stdout


@pytest.mark.slow
def test_serve_http_endpoint(tmp_path):
    """csm-serve --http: concurrent POST /generate requests share the
    continuous-batching decode and each gets a playable wav back;
    /health reports stats; /shutdown exits cleanly."""
    import io
    import json as _json
    import socket
    import subprocess
    import sys
    import threading
    import time as _time
    import urllib.error
    import urllib.request
    import wave

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    base = f"http://127.0.0.1:{port}"
    proc = subprocess.Popen(
        [sys.executable, "-m", "csm_tpu.cli.serve",
         "--http", f"127.0.0.1:{port}", "--tiny-test", "--no-watermark",
         "--n-slots", "2", "--chunk-size", "2"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    try:
        for _ in range(scaled(600)):  # model load + compile
            _time.sleep(1)
            assert proc.poll() is None, proc.communicate()[0]
            try:
                h = _json.loads(urllib.request.urlopen(
                    base + "/health", timeout=2).read())
                assert h["status"] == "ok" and h["n_slots"] == 2
                break
            except OSError:
                continue
        else:
            raise AssertionError("server never became healthy")

        results = {}

        def post(name, text):
            body = _json.dumps({"text": text,
                                "max_audio_length_ms": 400}).encode()
            req = urllib.request.Request(
                base + "/generate", data=body,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=scaled(600)) as r:
                results[name] = (r.status, r.headers["Content-Type"],
                                 int(r.headers["X-Frames"]), r.read())

        threads = [
            threading.Thread(target=post, args=(n, f"request {n}"))
            for n in ("a", "b")
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=scaled(900))
        assert set(results) == {"a", "b"}
        for status, ctype, n_frames, wav in results.values():
            assert status == 200 and ctype == "audio/wav"
            assert 1 <= n_frames <= 5
            with wave.open(io.BytesIO(wav)) as w:
                assert w.getframerate() == 24_000
                assert w.getnframes() == n_frames * 1920

        # malformed request -> 400, server stays up
        req = urllib.request.Request(
            base + "/generate", data=b'{"no_text": 1}',
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req, timeout=60)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400

        urllib.request.urlopen(
            urllib.request.Request(base + "/shutdown", data=b""), timeout=60)
        stdout = proc.communicate(timeout=scaled(120))[0]
        assert proc.returncode == 0, stdout
        assert "Served 2 requests" in stdout, stdout
    finally:
        if proc.poll() is None:
            proc.kill()


def test_serve_http_stream(tmp_path):
    """csm-serve --http --stream: the response is s16le PCM streamed as
    decode chunks complete (close-delimited), one 1920-sample frame per
    80 ms of audio."""
    import json as _json
    import socket
    import subprocess
    import sys
    import time as _time
    import urllib.request

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    base = f"http://127.0.0.1:{port}"
    proc = subprocess.Popen(
        [sys.executable, "-m", "csm_tpu.cli.serve",
         "--http", f"127.0.0.1:{port}", "--stream", "--tiny-test",
         "--no-watermark", "--n-slots", "2", "--chunk-size", "2"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    try:
        for _ in range(scaled(600)):
            _time.sleep(1)
            assert proc.poll() is None, proc.communicate()[0]
            try:
                urllib.request.urlopen(base + "/health", timeout=2)
                break
            except OSError:
                continue
        else:
            raise AssertionError("server never became healthy")

        body = _json.dumps({"text": "stream me please",
                            "max_audio_length_ms": 400}).encode()
        req = urllib.request.Request(
            base + "/generate", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=scaled(600)) as r:
            assert r.status == 200
            assert r.headers["Content-Type"].startswith("audio/L16")
            chunks = []
            while True:
                c = r.read(3840)
                if not c:
                    break
                chunks.append(c)
        pcm = b"".join(chunks)
        frame_bytes = 1920 * 2
        assert len(pcm) % frame_bytes == 0
        assert 1 <= len(pcm) // frame_bytes <= 5
        assert len(chunks) >= 1

        urllib.request.urlopen(
            urllib.request.Request(base + "/shutdown", data=b""), timeout=60)
        stdout = proc.communicate(timeout=scaled(120))[0]
        assert proc.returncode == 0, stdout
    finally:
        if proc.poll() is None:
            proc.kill()


@pytest.mark.slow
def test_serve_http_stream_disconnect_cancels(tmp_path):
    """A --stream client hanging up mid-response cancels its request:
    the slot frees on device (csm_serve_cancelled_total increments) and
    the server keeps serving new clients."""
    import json as _json
    import socket
    import struct
    import subprocess
    import sys
    import time as _time
    import urllib.request

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    base = f"http://127.0.0.1:{port}"
    proc = subprocess.Popen(
        [sys.executable, "-m", "csm_tpu.cli.serve",
         "--http", f"127.0.0.1:{port}", "--stream", "--tiny-test",
         "--no-watermark", "--n-slots", "2", "--chunk-size", "2"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    try:
        for _ in range(scaled(600)):
            _time.sleep(1)
            assert proc.poll() is None, proc.communicate()[0]
            try:
                urllib.request.urlopen(base + "/health", timeout=2)
                break
            except OSError:
                continue
        else:
            raise AssertionError("server never became healthy")

        # raw socket: http.client detaches the socket on close-delimited
        # responses, and we need to hang up abruptly mid-stream
        body = _json.dumps({"text": "very long request",
                            "max_audio_length_ms": 10_000}).encode()
        s = socket.create_connection(("127.0.0.1", port), timeout=scaled(600))
        s.sendall(
            b"POST /generate HTTP/1.1\r\nHost: t\r\n"
            b"Content-Type: application/json\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
            + body)
        got = b""
        while b"\r\n\r\n" not in got or \
                len(got.split(b"\r\n\r\n", 1)[1]) < 3840:
            chunk = s.recv(4096)
            assert chunk, f"stream ended early:\n{got[:400]!r}"
            got += chunk
        assert got.split(b" ", 2)[1] == b"200", got[:200]
        # abrupt hang-up: RST (not FIN) so the server's next write fails
        s.setsockopt(socket.SOL_SOCKET, socket.SO_LINGER,
                     struct.pack("ii", 1, 0))
        s.close()

        for _ in range(120):
            m = urllib.request.urlopen(
                base + "/metrics", timeout=10).read().decode()
            if "csm_serve_cancelled_total 1" in m:
                break
            _time.sleep(0.5)
        else:
            raise AssertionError(f"request never cancelled:\n{m}")

        # the freed slot serves the next client normally
        body = _json.dumps({"text": "after the hangup",
                            "max_audio_length_ms": 400}).encode()
        req = urllib.request.Request(
            base + "/generate", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=scaled(600)) as r:
            assert r.status == 200
            assert len(r.read()) > 0

        urllib.request.urlopen(
            urllib.request.Request(base + "/shutdown", data=b""), timeout=60)
        stdout = proc.communicate(timeout=scaled(120))[0]
        assert proc.returncode == 0, stdout
    finally:
        if proc.poll() is None:
            proc.kill()


def test_http_handler_overload_503():
    """The HTTP admission protocol without a live server: a full bounded
    inbox (--http-queue) answers 503 immediately; /health and bad paths
    keep working (ADVICE round-2 / VERDICT #8 backpressure)."""
    import io
    import queue
    import threading

    import numpy as np

    from csm_tpu.cli.serve import _make_http_handler

    class FakeServer:
        n_slots = 2
        active = np.zeros(2, bool)
        _adapter_id = {}
        _prefixes = {}

    inbox = queue.Queue(maxsize=1)
    inbox.put_nowait(("occupied", None, None))  # bound reached
    H = _make_http_handler(
        FakeServer(), inbox, threading.Event(), {"served": 0, "frames": 0},
        24_000, queue.Queue(),
    )

    def drive(method, path, body=b""):
        h = H.__new__(H)
        h.path = path
        h.request_version = "HTTP/1.1"
        h.requestline = f"{method} {path} HTTP/1.1"
        h.client_address = ("127.0.0.1", 0)
        h.headers = {"Content-Length": str(len(body))}
        h.rfile = io.BytesIO(body)
        h.wfile = io.BytesIO()
        getattr(h, f"do_{method}")()
        return h.wfile.getvalue().decode("latin-1")

    out = drive("POST", "/generate", b'{"text": "hi"}')
    assert " 503 " in out.splitlines()[0], out
    assert "overloaded" in out

    # the bound only gates /generate: health and errors still answer
    assert " 200 " in drive("GET", "/health").splitlines()[0]
    metrics = drive("GET", "/metrics")
    assert " 200 " in metrics.splitlines()[0]
    assert "csm_serve_slots 2" in metrics
    assert "csm_serve_queue_depth 1" in metrics  # the occupied entry
    assert "# TYPE csm_serve_requests_total counter" in metrics
    assert " 404 " in drive("POST", "/nope").splitlines()[0]
    assert " 400 " in drive("POST", "/generate", b"not json").splitlines()[0]

    # a free slot in the inbox admits again (no reply written before wait;
    # fulfill the waiter from this thread to avoid blocking the test)
    inbox.get_nowait()

    def fulfill():
        req, done, holder = inbox.get(timeout=10)
        holder["wav"] = b"RIFFfake"
        holder["frames"] = 1
        done.set()

    t = threading.Thread(target=fulfill)
    t.start()
    out = drive("POST", "/generate", b'{"text": "hi"}')
    t.join(timeout=10)
    assert " 200 " in out.splitlines()[0], out
    assert out.endswith("RIFFfake")


@pytest.mark.slow
def test_serve_http_adapters_hot_reload(tmp_path):
    """POST /adapters hot-loads a LoRA fine-tune into the running HTTP
    daemon: requests can name it immediately; unload frees it."""
    import json as _json
    import socket
    import subprocess
    import sys
    import time as _time
    import urllib.error
    import urllib.request

    import jax
    from csm_tpu.models.config import tiny_test_args
    from csm_tpu.training.lora import LoRAConfig, init_lora_params, save_lora

    margs = tiny_test_args()
    cfg = LoRAConfig(r=2)
    lora = jax.tree.map(
        lambda x: x + 0.02, init_lora_params(jax.random.key(1), margs, cfg)
    )
    adir = str(tmp_path / "bob_adapter")
    save_lora(adir, lora, cfg, margs)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    base = f"http://127.0.0.1:{port}"
    proc = subprocess.Popen(
        [sys.executable, "-m", "csm_tpu.cli.serve",
         "--http", f"127.0.0.1:{port}", "--tiny-test",
         "--no-watermark", "--n-slots", "2", "--chunk-size", "2"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )

    def post(path, obj, timeout=scaled(600)):
        req = urllib.request.Request(
            base + path, data=_json.dumps(obj).encode(),
            headers={"Content-Type": "application/json"})
        return urllib.request.urlopen(req, timeout=timeout)

    try:
        for _ in range(scaled(600)):
            _time.sleep(1)
            assert proc.poll() is None, proc.communicate()[0]
            try:
                urllib.request.urlopen(base + "/health", timeout=2)
                break
            except OSError:
                continue
        else:
            raise AssertionError("server never became healthy")

        # unknown adapter rejected before load
        with pytest.raises(urllib.error.HTTPError) as ei:
            post("/generate", {"text": "hi", "adapter": "bob",
                               "max_audio_length_ms": 240})
        assert ei.value.code == 400

        with post("/adapters", {"name": "bob", "path": adir}) as r:
            assert _json.loads(r.read()) == {
                "status": "loaded", "name": "bob", "id": 1}

        gen = {"text": "hello there", "max_audio_length_ms": 400}
        with post("/generate", dict(gen, adapter="bob")) as r:
            tuned = r.read()
        with post("/generate", gen) as r:
            base_wav = r.read()
        assert tuned != base_wav  # the adapter changes the audio

        with post("/adapters", {"name": "bob", "unload": True}) as r:
            assert _json.loads(r.read())["status"] == "unloaded"
        with pytest.raises(urllib.error.HTTPError) as ei:
            post("/generate", dict(gen, adapter="bob"))
        assert ei.value.code == 400

        urllib.request.urlopen(
            urllib.request.Request(base + "/shutdown", data=b""), timeout=60)
        stdout = proc.communicate(timeout=scaled(120))[0]
        assert proc.returncode == 0, stdout
    finally:
        if proc.poll() is None:
            proc.kill()


def test_serve_multi_adapter_tiny(tmp_path):
    """csm-serve --adapter NAME=PATH: requests route to their adapter by
    the JSON 'adapter' field (multi-LoRA serving from disk artifacts)."""
    import jax
    import jax.numpy as jnp

    from csm_tpu.models.config import tiny_test_args
    from csm_tpu.training.lora import LoRAConfig, init_lora_params, save_lora

    args = tiny_test_args()
    cfg = LoRAConfig(r=2)
    lora = jax.tree.map(
        lambda x: x + 0.02, init_lora_params(jax.random.key(1), args, cfg)
    )
    adir = str(tmp_path / "alice_adapter")
    save_lora(adir, lora, cfg, args)

    lines = [
        json.dumps({"id": "base", "text": "hello", "speaker": 0,
                    "max_audio_length_ms": 400}),
        json.dumps({"id": "tuned", "text": "hello", "speaker": 0,
                    "max_audio_length_ms": 400, "adapter": "alice"}),
    ]
    reqs = tmp_path / "reqs.jsonl"
    reqs.write_text("\n".join(lines))
    out = tmp_path / "served"
    rc = cli_serve.main([
        "--requests", str(reqs), "--output-dir", str(out),
        "--n-slots", "2", "--chunk-size", "2",
        "--adapter", f"alice={adir}",
        "--no-watermark", "--tiny-test",
    ])
    assert rc == 0
    a_base, sr = load_wav(str(out / "base.wav"))
    a_tuned, _ = load_wav(str(out / "tuned.wav"))
    assert sr == 24_000
    # the adapter must change the audio for the same prompt
    n = min(a_base.shape[0], a_tuned.shape[0])
    assert a_base.shape != a_tuned.shape or not np.allclose(
        a_base[:n], a_tuned[:n])
