"""Rig-aware test timeouts.

``conftest.py`` measures one device round-trip at session start and
exports ``CSM_TPU_RIG_STALL_S``.  On a healthy rig that probe is ~2 s
and every timeout stays at its base value; on a degraded tunnel (first
fetch stalls minutes after relay idle-decay) timeouts stretch so the
suite is merely slow, not red — the round-3 verdict's "suite must
survive the rig it runs on" item.
"""

from __future__ import annotations

import os


def rig_stall() -> float:
    """Measured session-start round-trip stall in seconds (0 if unknown)."""
    try:
        return float(os.environ.get("CSM_TPU_RIG_STALL_S", "0"))
    except ValueError:
        return 0.0


def scaled(seconds: float) -> int:
    """Stretch a base timeout for the measured rig degradation.

    Healthy rig (probe < 10 s): unchanged.  Degraded: each TPU
    subprocess can pay its own first-fetch stall (if the relay decays
    idle between tests) plus ~4x slower compiles under tunnel
    contention, so scale by 1 + stall/60, capped at 6x, and always add
    one full stall of headroom.
    """
    s = rig_stall()
    if s < 10.0:
        return int(seconds)
    factor = min(6.0, 1.0 + s / 60.0)
    return int(seconds * factor + s)
