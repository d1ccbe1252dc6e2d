"""Utilities: checkpoint interop, safetensors IO, token-parity analysis,
observability (metrics/timing/profiling)."""

from csm_tpu.utils.observability import MetricsLogger, measure_time, profile_trace

__all__ = ["MetricsLogger", "measure_time", "profile_trace"]
