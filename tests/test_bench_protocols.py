"""Measurement-protocol guards (round-4 verdict Weak #1 / Missing #3).

The serving benches must DISCARD stall-poisoned runs (relay artifact)
instead of medianing them in, and the per-stream SLO protocol must run
end-to-end.  Logic tests are fast; the SLO smoke drives the real script
on the tiny model (slow-marked).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

from rig import scaled

REPO = str(Path(__file__).resolve().parent.parent)


def test_poison_criterion():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from bench_serving_slo import poisoned
    finally:
        sys.path.pop(0)
    clean = [0.1] * 40
    assert not poisoned(clean)
    assert poisoned(clean + [2.5])            # relay stall chunk
    assert not poisoned(clean + [0.4])        # < 0.5 s absolute floor
    assert not poisoned([0.1, 0.2, 3.0])      # too few chunks to judge
    # uniformly-slow runs are SLOW, not poisoned (no outlier)
    assert not poisoned([1.0] * 40)


@pytest.mark.slow
def test_slo_protocol_tiny_smoke(tmp_path):
    """The SLO script runs end-to-end (tiny model) and emits a capacity
    artifact with the per-stream percentile fields.

    Runs on a scrubbed CPU backend: a second TPU-attached process would
    contend with the pytest session for the one chip (cpu_mesh.py
    rationale)."""
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("PALLAS_AXON", "AXON_"))}
    env["JAX_PLATFORMS"] = "cpu"
    env["CSM_SLO_TINY"] = "1"
    out = str(tmp_path / "slo.json")
    proc = subprocess.run(
        [sys.executable, "scripts/bench_serving_slo.py", "--quick",
         "--ladder", "2", "--duration", "4",
         "--configs", "bf16:pipelined", "--out", out],
        capture_output=True, text=True, timeout=scaled(600),
        cwd=REPO, env=env,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    art = json.load(open(out))
    cfg = art["configs"][0]
    assert "capacity_streams" in cfg
    row = cfg["rows"][0]
    for k in ("slo_pass_pct", "ttfa_p50_ms", "ttfa_p99_ms",
              "rate_p5", "gap_p99_ms"):
        assert k in row, row
    assert row["streams"] > 0
