"""Utilities: compilation cache, profiling, tree helpers."""

from .runtime import enable_compilation_cache, throughput_meter

__all__ = ["enable_compilation_cache", "throughput_meter"]
