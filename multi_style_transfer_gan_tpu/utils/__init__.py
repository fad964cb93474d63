"""Utilities: compilation cache, profiling, tree helpers."""

from .runtime import enable_compilation_cache, throughput_meter, MetricsLogger

__all__ = ["enable_compilation_cache", "throughput_meter", "MetricsLogger"]
