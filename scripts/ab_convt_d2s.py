"""A/B: transposed conv (lhs-dilated) vs the depth-to-space phase rewrite.

Two measurements, interleaved min-over-rounds on the shared chip:
1. isolated up-ladder convT shapes (up1: 128^2 C64->C32 at 256^2 out;
   up2: 256^2 C32->C16 at 512^2 out) — op-level ratio;
2. the FULL fast uint8 stylize pipeline with and without the rewrite —
   the number that decides the default.

Usage: python scripts/ab_convt_d2s.py [batch] [size]
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multi_style_transfer_gan_tpu.core.conv import (
    conv_transpose2d, conv_transpose2d_d2s,
)
from multi_style_transfer_gan_tpu.models import (
    enhanced_generator_apply, enhanced_generator_init,
)
from multi_style_transfer_gan_tpu.ops import to_model_range, from_model_range
from multi_style_transfer_gan_tpu.utils import enable_compilation_cache

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 96
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 512
ROUNDS, ITERS = 5, 4


def bench(fns, args_of, rounds=ROUNDS, iters=ITERS):
    best = {k: float("inf") for k in fns}
    for _ in range(rounds):
        for k, fn in fns.items():  # interleave candidates within each round
            a = args_of(k)
            t0 = time.perf_counter()
            for i in range(iters):
                out = fn(*a[i % len(a)])
            np.asarray(jax.device_get(out.ravel()[0]))
            best[k] = min(best[k], (time.perf_counter() - t0) / iters)
    return best


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)

    # -- 1. isolated convT shapes ------------------------------------------
    for (h, cin, cout) in ((SIZE // 4, 4 * 16, 2 * 16),
                           (SIZE // 2, 2 * 16, 16)):
        x = [jnp.asarray(rng.standard_normal((BATCH, h, h, cin)),
                         jnp.bfloat16) for _ in range(2)]
        w = jnp.asarray(rng.standard_normal((4, 4, cin, cout)) * 0.05,
                        jnp.float32)
        b = jnp.zeros((cout,), jnp.float32)
        legacy = jax.jit(lambda t, w=w, b=b: conv_transpose2d(
            t, w, b, stride=2, padding=1))
        d2s = jax.jit(lambda t, w=w, b=b: conv_transpose2d_d2s(t, w, b))
        a0, a1 = legacy(x[0]), d2s(x[0])
        diff = float(jnp.abs(a0.astype(jnp.float32)
                             - a1.astype(jnp.float32)).max())
        t = bench({"legacy": legacy, "d2s": d2s},
                  lambda k: [(xx,) for xx in x])
        print(f"convT {h}^2 C{cin}->C{cout} x{BATCH}: "
              f"legacy {t['legacy']*1e3:.2f} ms, d2s {t['d2s']*1e3:.2f} ms "
              f"({t['legacy']/t['d2s']:.2f}x), max|d| {diff:.2e}")

    # -- 2. full pipeline ---------------------------------------------------
    params = enhanced_generator_init(jax.random.PRNGKey(0), channels=16,
                                     num_transformer_blocks=1)
    data = [jnp.asarray(rng.integers(0, 256, (BATCH, SIZE, SIZE, 3),
                                     dtype=np.uint8)) for _ in range(2)]

    def pipe(upsample_d2s):
        @jax.jit
        def f(p, u8):
            x = to_model_range(u8).astype(jnp.bfloat16)
            y = enhanced_generator_apply(p, x, fast_attention=True,
                                         upsample_d2s=upsample_d2s)
            return (from_model_range(y.astype(jnp.float32)) * 255.0
                    ).astype(jnp.uint8)
        return f

    fns = {"legacy": pipe(False), "d2s": pipe(True)}
    y0 = fns["legacy"](params, data[0])
    y1 = fns["d2s"](params, data[0])
    dd = np.abs(np.asarray(y0, np.int32) - np.asarray(y1, np.int32))
    t = bench(fns, lambda k: [(params, d) for d in data])
    print(f"pipeline {SIZE}^2 x{BATCH}: legacy {t['legacy']*1e3:.1f} ms "
          f"({BATCH/t['legacy']:.1f} img/s), d2s {t['d2s']*1e3:.1f} ms "
          f"({BATCH/t['d2s']:.1f} img/s) = {t['legacy']/t['d2s']:.3f}x; "
          f"uint8 divergence mean {dd.mean():.3f} p99 "
          f"{np.percentile(dd, 99):.0f} max {dd.max()}")


if __name__ == "__main__":
    main()
