"""Shared helper: run a code snippet in a hermetic 8-virtual-CPU-device
subprocess — the exact environment the driver uses for
``__graft_entry__.dryrun_multichip``.

The axon TPU plugin's sitecustomize force-selects the TPU platform
whenever its env vars are present (and mixing
``--xla_force_host_platform_device_count`` into a TPU-attached process
hangs the plugin), so the env is scrubbed and the mesh gets its own
process.  Used by test_multichip / test_pipeline / test_distributed /
test_trainer_parallel.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cpu8(code: str, timeout: int = 1800, extra_env: dict | None = None) -> str:
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("PALLAS_AXON", "AXON_"))
    }
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    if extra_env:
        env.update(extra_env)
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=timeout,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    return proc.stdout
