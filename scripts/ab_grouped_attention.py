"""A/B: grouped-Gram attention kernel vs the current per-width dispatch.

Hypothesis (docs/PERFORMANCE.md "needs genuinely new math"): stacking
g = 128//C windows per dense (128,128) MXU matmul + block-diagonal mask
cuts the MXU issue count g x vs the per-window dots that bound v1/v3.

Shapes = the three attention stages of the 512^2 flagship pipeline.
Run on the REAL CHIP (default env). Same-script A/B, min over rounds.

  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_grouped_attention.py
  [--interpret]  numerics-only on CPU interpret mode
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")

    from multi_style_transfer_gan_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from multi_style_transfer_gan_tpu.models.enhanced_generator import (
        _attention_math,
    )
    from multi_style_transfer_gan_tpu.ops.pallas.window_attention import (
        fused_window_channel_attention as v1_attention,
    )
    from multi_style_transfer_gan_tpu.ops.pallas.window_attention_v3 import (
        window_attention_v3,
    )
    from multi_style_transfer_gan_tpu.ops.pallas.window_attention_grouped \
        import grouped_window_channel_attention

    # Explicit pre-grouped per-shape winners (docs/PERFORMANCE.md table) —
    # NOT _attention_fast, which now routes C<=32 to the grouped kernel
    # itself (an earlier revision of this script accidentally measured
    # grouped-vs-grouped for exactly that reason).
    def baseline_for(HW, C):
        if C <= 16:
            return lambda *a: window_attention_v3(*a, window_size=4,
                                                  eps=1e-12), "v3"
        if C <= 32 and HW >= 256:
            return lambda *a: _attention_math(*a, window_size=4,
                                              eps=1e-12), "einsum"
        return lambda *a: v1_attention(*a, window_size=4, eps=1e-12), "v1"

    B = args.batch
    shapes = [(512, 16), (256, 32), (128, 64), (128, 32)]
    rng = np.random.default_rng(0)

    for HW, C in shapes:
        x = jnp.asarray(rng.standard_normal((B, HW, HW, C)) * 0.5,
                        jnp.float32)
        wqkv = jnp.asarray(rng.standard_normal((1, 1, C, 3 * C)) * 0.1,
                           jnp.float32)
        bqkv = jnp.asarray(rng.standard_normal((3 * C,)) * 0.1, jnp.float32)
        wproj = jnp.asarray(rng.standard_normal((1, 1, C, C)) * 0.1,
                            jnp.float32)
        bproj = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
        fa = (x, wqkv, bqkv, wproj, bproj)

        if args.interpret:
            xs = x[:2]
            ref = _attention_math(xs, wqkv, bqkv, wproj, bproj,
                                  window_size=4, eps=1e-12)
            got = grouped_window_channel_attention(
                xs, wqkv, bqkv, wproj, bproj, interpret=True)
            d = float(jnp.max(jnp.abs(ref - got)))
            print(f"{HW}^2 C={C}: interpret max|d| = {d:.2e}")
            continue

        base_fn, base_name = baseline_for(HW, C)
        cur = jax.jit(base_fn)
        grp = jax.jit(lambda *a: grouped_window_channel_attention(*a))

        # time in bf16 — the production pipeline dtype, and fp32 x96
        # exhausted shared-chip HBM on the grouped path
        fa = tuple(jnp.asarray(a, jnp.bfloat16) for a in fa)

        # numerics first (vs fp32 math path) — small batch: the XLA einsum
        # reference OOMs at 512^2 full batch (docs/PERFORMANCE.md)
        fs = (x[:4],) + fa[1:]
        ref = jax.jit(lambda *a: _attention_math(
            *a, window_size=4, eps=1e-12))(*fs)
        got = grp(*fs)
        d = float(jnp.max(jnp.abs(np.asarray(ref) - np.asarray(got))))
        print(f"{HW}^2 C={C} x{B}: grouped-vs-math max|d| = {d:.2e}",
              flush=True)

        def run_once(fn):
            t0 = time.perf_counter()
            o = None
            for _ in range(args.iters):
                o = fn(*fa)
            _ = np.asarray(o)[0, :1, :1]
            return (time.perf_counter() - t0) / args.iters * 1e3

        # warmup both, then interleave rounds — the chip is time-shared,
        # so back-to-back per-candidate timing biases the ratio with drift
        _ = np.asarray(cur(*fa))[0, :1, :1]
        _ = np.asarray(grp(*fa))[0, :1, :1]
        t_cur = t_grp = 1e9
        for _ in range(args.rounds):
            t_cur = min(t_cur, run_once(cur))
            t_grp = min(t_grp, run_once(grp))
        print(f"{HW}^2 C={C} x{B}: {base_name} {t_cur:.1f} ms  "
              f"grouped {t_grp:.1f} ms  ({t_cur / t_grp:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
