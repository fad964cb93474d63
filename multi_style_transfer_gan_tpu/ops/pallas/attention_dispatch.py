"""Measured dispatch for the windowed-channel-attention fast path.

Round 1 froze the kernel choice per channel width from two A/B runs on a
contended chip, with the flagship 512^2 C=16 decision explicitly ambiguous
(1.15x/0.98x between runs). This module replaces folklore with
measurements that travel with the machine:

- ``pick(shape)`` returns the implementation name for a concrete
  (B, H, W, C, ws, dtype) from, in priority order:
    1. an in-memory table,
    2. a persistent JSON cache (``MSTGAN_DISPATCH_CACHE`` or
       ``~/.cache/mstgan/attention_dispatch.json``) written by a probe,
    3. the in-repo ``tuned_dispatch.json`` — quiet-chip winners for the
       six deployed stage shapes, batch-free keys, tpu backends only
       (shipped so fresh machines get measured dispatch without running
       the tuner — VERDICT round-2 item 5),
    4. the static default rules (the round-1 table).
- ``probe(shape, impls)`` times every valid candidate on the local device
  (min over interleaved rounds — the chip is time-shared, see
  docs/PERFORMANCE.md measurement rules) and caches the winner.

Probing is explicit: run ``scripts/tune_dispatch.py`` once per machine (or
set ``MSTGAN_AUTOTUNE=1`` to probe lazily on first trace of a new shape —
each probe pays one compile per candidate). Dispatch itself never blocks:
with no cache entry it falls back to the static rules instantly.

The candidates (all numerically interchangeable; parity pinned in
tests/test_pallas.py):
  grouped  ops/pallas/window_attention_grouped.py (g=128//C windows/pass)
  v3       ops/pallas/window_attention_v3.py      (C<=16 specialization)
  v1       ops/pallas/window_attention.py         (per-window tiles)
  einsum   models/enhanced_generator._attention_math (pure XLA)
"""

from __future__ import annotations

import json
import os
import time


def _cache_path() -> str:
    return os.environ.get(
        "MSTGAN_DISPATCH_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "mstgan",
                     "attention_dispatch.json"))


_mem: dict[str, str] | None = None


def _load() -> dict[str, str]:
    global _mem
    if _mem is None:
        try:
            with open(_cache_path()) as f:
                _mem = {k: v["impl"] for k, v in json.load(f).items()}
        except Exception:
            _mem = {}
    return _mem


def _key(B, H, W, C, ws, dtype) -> str:
    import jax

    backend = jax.default_backend()
    return f"{backend}:{B}x{H}x{W}x{C}:ws{ws}:{jax.numpy.dtype(dtype).name}"


_repo_table: dict[str, str] | None = None


def _load_repo_table() -> dict[str, str]:
    global _repo_table
    if _repo_table is None:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "tuned_dispatch.json")
        try:
            with open(path) as f:
                _repo_table = {k: v for k, v in json.load(f).items()
                               if not k.startswith("_")}
        except Exception:
            _repo_table = {}
    return _repo_table


def _repo_pick(H, W, C, ws, dtype) -> str | None:
    """Shipped quiet-chip winner for this stage shape (batch-free key),
    only on tpu-class backends — the measurements are v5e's."""
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        return None
    key = f"tpu:{H}x{W}x{C}:ws{ws}:{jax.numpy.dtype(dtype).name}"
    return _load_repo_table().get(key)


def valid_impls(B, H, W, C, ws) -> list[str]:
    """Candidate names valid at this shape, static-default first (so
    ``valid_impls(...)[0]`` IS the round-1 frozen table)."""
    names = []
    grouped_ok = (ws == 4 and C <= 32 and 128 % C == 0
                  and (B * (H // ws) * (W // ws)) % (128 // C) == 0)
    v3_ok = C <= 16 and ws == 4
    if grouped_ok:
        names.append("grouped")
    if v3_ok:
        names.append("v3")
    if C <= 32 and H * W >= 256 * 256 and not grouped_ok and not v3_ok:
        names.append("einsum")
    names.append("v1")
    if "einsum" not in names:
        names.append("einsum")
    return names


def pick(B, H, W, C, ws, dtype) -> str:
    names = valid_impls(B, H, W, C, ws)
    cached = _load().get(_key(B, H, W, C, ws, dtype))
    if cached in names:
        return cached
    if os.environ.get("MSTGAN_AUTOTUNE") == "1":
        try:
            return probe(B, H, W, C, ws, dtype)
        except Exception:
            pass  # probe is best-effort (remote compiles can 500)
    shipped = _repo_pick(H, W, C, ws, dtype)
    if shipped in names:
        return shipped
    return names[0]


def probe(B, H, W, C, ws, dtype, *, rounds: int = 4, iters: int = 8,
          verbose: bool = False) -> str:
    """Time every valid candidate at this shape on the local device and
    persist the winner. Returns the winning implementation name."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    impls = _implementations()
    names = [n for n in valid_impls(B, H, W, C, ws) if n in impls]

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.standard_normal((B, H, W, C)).astype(dtype))
    wqkv = jax.device_put(
        (rng.standard_normal((1, 1, C, 3 * C)) * 0.1).astype(dtype))
    bqkv = jax.device_put(rng.standard_normal((3 * C,)).astype(dtype))
    wproj = jax.device_put(
        (rng.standard_normal((1, 1, C, C)) * 0.1).astype(dtype))
    bproj = jax.device_put(rng.standard_normal((C,)).astype(dtype))
    args = (x, wqkv, bqkv, wproj, bproj)

    fns, ms = {}, {}
    try:
        for n in names:
            impl = impls[n]
            fn = jax.jit(lambda *a, _i=impl: _i(*a, window_size=ws,
                                                eps=1e-12))
            try:
                out = fn(*args)
                _ = np.asarray(out[0, :1, :1])  # compile + sanity
                out.delete()
                fns[n] = fn
                ms[n] = float("inf")
            except Exception as e:  # rejected kernel / compile-500 / OOM
                if verbose:
                    print(f"#   {n}: failed {str(e)[:90]}")
        if not fns:
            raise RuntimeError("no attention candidate compiled")

        def burst(fn, k):
            """Dispatch k back-to-back, keeping at most TWO outputs alive
            (a held batch of k outputs OOMs the chip at 1 GB shapes);
            returns after a host fetch of the last (the only real sync)."""
            last = prev = None
            for _ in range(k):
                o = fn(*args)
                if prev is not None:
                    prev.delete()  # runtime frees it once its use retires
                prev, last = last, o
            _ = np.asarray(last[0, :1, :1])
            if prev is not None:
                prev.delete()
            last.delete()

        for _ in range(rounds):
            for n, fn in fns.items():  # interleave: time-shared fairness
                try:
                    burst(fn, 2)       # drain warmup dispatches
                    t0 = time.perf_counter()
                    burst(fn, iters)
                    ms[n] = min(ms[n],
                                (time.perf_counter() - t0) / iters * 1e3)
                except Exception as e:  # e.g. OOM mid-run: drop candidate
                    if verbose:
                        print(f"#   {n}: run failed {str(e)[:90]}")
                    ms.pop(n, None)
        fns = {n: f for n, f in fns.items() if n in ms}
        if not ms:
            raise RuntimeError("every candidate failed while timing")
    finally:
        # free the probe tensors deterministically — a leaked 1 GB probe
        # batch poisons every later probe on a 16 GB chip
        for a in args:
            a.delete()

    winner = min(ms, key=ms.get)
    if verbose:
        for n in sorted(ms, key=ms.get):
            print(f"#   {n}: {ms[n]:.2f} ms")

    key = _key(B, H, W, C, ws, dtype)
    path = _cache_path()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            with open(path) as f:
                full = json.load(f)
        except Exception:
            full = {}
        full[key] = {"impl": winner,
                     "ms": {n: round(v, 3) for n, v in ms.items()}}
        with open(path, "w") as f:
            json.dump(full, f, indent=1, sort_keys=True)
    except OSError:
        pass  # read-only home: keep the in-memory result only
    _load()[key] = winner
    return winner


def _implementations() -> dict:
    from ...models.enhanced_generator import _attention_math
    from .window_attention import fused_window_channel_attention
    from .window_attention_grouped import grouped_window_channel_attention
    from .window_attention_v3 import window_attention_v3

    return {
        "grouped": grouped_window_channel_attention,
        "v3": window_attention_v3,
        "v1": fused_window_channel_attention,
        "einsum": _attention_math,
    }


def apply_impl(name, x, wqkv, bqkv, wproj, bproj, *, window_size, eps):
    return _implementations()[name](x, wqkv, bqkv, wproj, bproj,
                                    window_size=window_size, eps=eps)
