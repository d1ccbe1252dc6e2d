"""Test configuration.

Tests run on the default JAX platform — the real TPU chip when available
(fast compiles), CPU otherwise.  Multi-chip sharding paths are exercised
hermetically in a SUBPROCESS with ``JAX_PLATFORMS=cpu`` and 8 virtual host
devices (tests/test_multichip.py) — mixing
``--xla_force_host_platform_device_count`` into a TPU-attached process
hangs the axon plugin, so the virtual mesh gets its own process, exactly
how the driver runs ``__graft_entry__.dryrun_multichip``.
"""

import jax

# Parity tests compare against float64-derived oracles; keep matmuls in
# full f32 precision on the MXU.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: trainers/tests re-jit structurally identical
# programs (fresh closures per instance); the cache makes those hits ~free
# across tests AND across pytest runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
