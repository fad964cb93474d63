"""Runtime utilities: persistent compilation cache and simple profiling.

The TPU in this deployment sits behind a tunnel where fresh XLA compiles cost
tens of seconds (bf16 graphs: minutes). Every CLI/pipeline entry point calls
``enable_compilation_cache`` so recompiles across processes are disk-cache
hits. Observability (SURVEY.md §5.1/§5.5): the reference only prints
wall-clock and per-image seconds (batch_process_images.py:495-536);
``throughput_meter`` reproduces that and adds a ``jax.profiler`` hook.
"""

from __future__ import annotations

import contextlib
import os
import time

import jax

_DEFAULT_CACHE = os.path.expanduser("~/.cache/mstgan_tpu_jax_cache")


def _backend_salt() -> str:
    """Cache-poison guard: key the cache dir by the backend's version.

    Round-4 incident: the remote TPU service was re-provisioned mid-day
    and every cached executable from before it became poison — programs
    loaded from the persistent cache died at dispatch with
    ``INVALID_ARGUMENT: TPU backend error`` while freshly-compiled ones
    ran fine. The plugin's ``platform_version`` carries the executable/
    compat versions ("SerializedExecutable v9; compile-cache v14; compat
    c49; Built ..."), so hashing it into the cache path makes a backend
    swap land in a fresh, empty cache instead of replaying stale
    binaries. Failure-detection subsystem, SURVEY.md §5.3.
    """
    try:
        import hashlib

        ver = getattr(jax.devices()[0].client, "platform_version", "")
        return hashlib.sha1(str(ver).encode()).hexdigest()[:10]
    except Exception:
        return "unversioned"


def enable_compilation_cache(path: str | None = None,
                             min_compile_secs: float = 1.0):
    """Turn on JAX's persistent compilation cache (idempotent), keyed by
    the backend version (see _backend_salt)."""
    path = path or os.environ.get("MSTGAN_JAX_CACHE", _DEFAULT_CACHE)
    path = os.path.join(path, _backend_salt())
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
    return path


class throughput_meter:
    """Context manager printing imgs/sec + per-image seconds like the
    reference's batch report, with optional jax.profiler trace capture."""

    def __init__(self, n_items: int, label: str = "processed",
                 trace_dir: str | None = None):
        self.n = n_items
        self.label = label
        self.trace_dir = trace_dir

    def __enter__(self):
        if self.trace_dir:
            jax.profiler.start_trace(self.trace_dir)
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        if self.trace_dir:
            jax.profiler.stop_trace()
        per = self.elapsed / max(self.n, 1)
        print(f"{self.label}: {self.n} items in {self.elapsed:.2f}s "
              f"({self.n / max(self.elapsed, 1e-9):.2f}/s, {per:.3f}s each)")
        return False


class MetricsLogger:
    """Append-only JSONL metrics log for the training CLIs
    (SURVEY.md §5.5 — the reference's only observability is stdout prints).
    No-op when constructed with ``path=None``."""

    def __init__(self, path=None):
        self.path = path
        self._f = None
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)) or ".",
                        exist_ok=True)
            self._f = open(path, "a", buffering=1)

    def log(self, **record):
        if self._f is None:
            return
        import json

        record.setdefault("t", time.time())
        self._f.write(json.dumps(record) + "\n")

    def close(self):
        if self._f is not None:
            self._f.close()
            self._f = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
