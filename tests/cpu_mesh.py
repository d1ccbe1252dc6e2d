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
import socket
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


def run_multiproc(
    code: str,
    nproc: int = 2,
    devices_per_proc: int = 4,
    timeout: int = 1800,
) -> list[str]:
    """Run ``code`` in ``nproc`` CONCURRENT processes joined through a real
    ``jax.distributed.initialize`` (Gloo collectives over localhost) — the
    actual multi-host runtime path, not the single-process degradation.

    Coordinator/topology arrive via the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID), which
    is exactly how ``csm_tpu.parallel.distributed.initialize()`` discovers
    them on a pod launcher.  Each process gets ``devices_per_proc``
    virtual CPU devices; ``jax.devices()`` inside spans all processes.
    Returns per-process stdout, asserting every process exited 0.
    """
    with socket.socket() as s:  # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    base = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("PALLAS_AXON", "AXON_"))
    }
    base["JAX_PLATFORMS"] = "cpu"
    base["XLA_FLAGS"] = (
        base.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={devices_per_proc}"
    ).strip()
    base["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    base["JAX_NUM_PROCESSES"] = str(nproc)
    procs = []
    for pid in range(nproc):
        env = dict(base, JAX_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", code],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = []
    try:
        for pid, p in enumerate(procs):
            out, err = p.communicate(timeout=timeout)
            assert p.returncode == 0, (
                f"process {pid} rc={p.returncode}\nstdout:\n{out}\nstderr:\n{err}"
            )
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return outs
