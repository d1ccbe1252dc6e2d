"""Observability: structured metrics, timing, and profiler hooks.

The reference has tqdm bars, a ``measure_time`` decorator
(src/csm/mlx/components/utils.py:55-71), per-stage ``timing_stats``
(src/csm/cli/generate_mlx.py:694-717) and explicitly NO structured
metrics sink (SURVEY.md §5.5 — "a gap worth filling").  Here:

  * ``MetricsLogger`` — JSONL event stream (one line per step) any
    dashboard can tail; zero deps;
  * ``measure_time`` — wall-time decorator with an optional stats dict;
  * ``profile_trace`` — context manager around ``jax.profiler`` traces
    (XProf/TensorBoard-viewable) for the decode loop and train steps.
"""

from __future__ import annotations

import contextlib
import functools
import json
import os
import time
from typing import Dict, Optional


def hbm_stats(device=None) -> Dict[str, float]:
    """Device memory snapshot in MiB (reference benchmark reports carry a
    memory column — src/csm/training/benchmark_lora.py:404-440).

    Returns ``{}`` on backends without ``memory_stats`` (CPU).  Keys:
    ``hbm_in_use_mib``, ``hbm_peak_mib``, ``hbm_limit_mib`` (when exposed).
    """
    import jax

    dev = device or jax.local_devices()[0]
    try:
        stats = dev.memory_stats() or {}
    except Exception:
        return {}
    out: Dict[str, float] = {}
    mib = 1024.0 * 1024.0
    if "bytes_in_use" in stats:
        out["hbm_in_use_mib"] = round(stats["bytes_in_use"] / mib, 1)
    if "peak_bytes_in_use" in stats:
        out["hbm_peak_mib"] = round(stats["peak_bytes_in_use"] / mib, 1)
    if "bytes_limit" in stats:
        out["hbm_limit_mib"] = round(stats["bytes_limit"] / mib, 1)
    return out


class MetricsLogger:
    """Append-only JSONL metrics (step, wall time, arbitrary scalars)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path
        self._t0 = time.time()
        self._f = open(path, "a", buffering=1)

    def log(self, step: int, **scalars):
        rec = {"step": int(step), "t": round(time.time() - self._t0, 3)}
        for k, v in scalars.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = str(v)
        self._f.write(json.dumps(rec) + "\n")

    def close(self):
        self._f.close()


def measure_time(fn=None, *, stats: Optional[Dict] = None, name: Optional[str] = None):
    """Wall-time decorator (reference: components/utils.py:55-71).

    With ``stats`` given, accumulates {name: total_seconds, name_calls: n}
    instead of printing.
    """

    def wrap(f):
        label = name or f.__name__

        @functools.wraps(f)
        def inner(*a, **kw):
            t0 = time.time()
            out = f(*a, **kw)
            dt = time.time() - t0
            if stats is not None:
                stats[label] = stats.get(label, 0.0) + dt
                stats[f"{label}_calls"] = stats.get(f"{label}_calls", 0) + 1
            else:
                print(f"{label}: {dt:.4f}s")
            return out

        return inner

    return wrap(fn) if fn is not None else wrap


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """``jax.profiler`` trace context (view with XProf / TensorBoard).

    Wrap a decode loop or a handful of train steps:
        with profile_trace("/tmp/csm_profile"):
            step(state, key, batch)
    """
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
