"""A/B: packed-engine attention — grouped-Gram kernel vs packed v3.

The packed inference engine keeps every stage in the space-to-depth packed
layout and uses packed_window_attention_v3 through C<=32 (no relayout at
all). The grouped kernel pays one XLA transpose each way to reach its
lane-stacked (G, P, g*C) layout but issues g x fewer MXU Gram passes.
Shapes = the packed engine's two attention stages on the 512^2 flagship.

Run on the REAL CHIP (default env). Same-script A/B, min over rounds.

  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_packed_grouped.py
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    from multi_style_transfer_gan_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from multi_style_transfer_gan_tpu.ops.pallas.window_attention_v3 import (
        packed_window_attention_v3,
    )
    from multi_style_transfer_gan_tpu.ops.pallas.window_attention_grouped \
        import packed_grouped_window_attention

    B = args.batch
    # packed grids of the 512^2 pipeline: (Hp, Wp, C) after s2d(ws=4)
    shapes = [(128, 16), (64, 32)]
    rng = np.random.default_rng(0)

    for HWp, C in shapes:
        P = 16
        x = jnp.asarray(rng.standard_normal((B, HWp, HWp, P * C)) * 0.5,
                        jnp.bfloat16)
        wqkv = jnp.asarray(rng.standard_normal((1, 1, C, 3 * C)) * 0.1,
                           jnp.float32)
        bqkv = jnp.asarray(rng.standard_normal((3 * C,)) * 0.1, jnp.float32)
        wproj = jnp.asarray(rng.standard_normal((1, 1, C, C)) * 0.1,
                            jnp.float32)
        bproj = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
        fa = (x, wqkv, bqkv, wproj, bproj)

        v3 = jax.jit(lambda *a: packed_window_attention_v3(*a))
        grp = jax.jit(lambda *a: packed_grouped_window_attention(*a))

        d = float(jnp.max(jnp.abs(
            v3(*(x[:4],) + fa[1:]).astype(jnp.float32) -
            grp(*(x[:4],) + fa[1:]).astype(jnp.float32))))
        print(f"packed {HWp}^2 C={C} x{B}: grouped-vs-v3 max|d| = {d:.2e}",
              flush=True)

        def timeit(fn):
            _ = np.asarray(fn(*fa))[0, :1, :1, :1]
            best = 1e9
            for _ in range(args.rounds):
                t0 = time.perf_counter()
                o = None
                for _ in range(args.iters):
                    o = fn(*fa)
                _ = np.asarray(o)[0, :1, :1, :1]
                best = min(best,
                           (time.perf_counter() - t0) / args.iters * 1e3)
            return best

        t3, tg = timeit(v3), timeit(grp)
        print(f"packed {HWp}^2 C={C} x{B}: v3 {t3:.1f} ms  "
              f"grouped {tg:.1f} ms  ({t3 / tg:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
