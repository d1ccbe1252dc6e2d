"""Host<->device transport warmup for tunneled TPU attachments.

Some TPU attachments route host<->device traffic through a relay (e.g. a
tunneled single-chip dev rig).  Measured behavior on such rigs:

  * the FIRST small device->host fetch in a process stalls 20-400 s
    (relay flush/handshake with a pathological backoff);
  * a LARGE first fetch (>= a few MB) completes in ~2 s and unlocks the
    fast path for every subsequent transfer, however small;
  * device arrays embedded as compile-time constants (module-level
    ``jnp.float32(...)`` etc.) trigger exactly that slow small fetch at
    trace time — which is why this repo keeps module constants as numpy.

``warm_transport()`` performs one big computed round-trip up front so
interactive CLIs and benchmarks never hit the slow path mid-run.  It is a
no-op (a few ms) on directly-attached TPUs and CPU.
"""

from __future__ import annotations

import threading
import time

import numpy as np

_WARMED = False
_ASYNC_STARTED = False


def warm_transport(verbose: bool = False) -> float:
    """Force one large device->host round-trip; returns seconds spent.

    Safe to call multiple times (subsequent calls are free).
    """
    global _WARMED
    if _WARMED:
        return 0.0
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    # Computed (not transferred) array: also warms the executable path.
    # 16 MB: the size verified to take the fast path as a FIRST fetch.
    x = jax.jit(lambda: jnp.ones((2048, 2048), jnp.float32) * 2.0)()
    np.asarray(x)
    dt = time.time() - t0
    _WARMED = True
    if verbose:
        import sys

        print(f"transport warmup: {dt:.1f}s", file=sys.stderr, flush=True)
    return dt


def warm_transport_async(verbose: bool = False) -> None:
    """Run the warmup round-trip on a daemon thread so it overlaps model
    loading / compilation (the stall is a blocking transfer; the GIL is
    released while it waits).  CLIs call this first thing."""
    global _ASYNC_STARTED
    if _ASYNC_STARTED or _WARMED:
        return
    _ASYNC_STARTED = True
    threading.Thread(
        target=warm_transport, args=(verbose,), daemon=True
    ).start()
