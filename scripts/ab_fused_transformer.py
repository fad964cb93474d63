"""A/B the fused Pallas transformer block inside the full fast forward.

Methodology per docs/PERFORMANCE.md: A/B within one script, distinct inputs
per iteration, drain warmup with a host fetch before timing, min over
rounds. Usage: python scripts/ab_fused_transformer.py [batch] [size].
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from multi_style_transfer_gan_tpu.models import (
    enhanced_generator_apply, enhanced_generator_init,
)
import multi_style_transfer_gan_tpu.models.enhanced_generator as eg_mod
import multi_style_transfer_gan_tpu.models.structural_transformer as st_mod
from multi_style_transfer_gan_tpu.ops import to_model_range, from_model_range
from multi_style_transfer_gan_tpu.utils import enable_compilation_cache

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 96
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 512
ROUNDS, ITERS = 4, 4


def build(fused: bool):
    params = enhanced_generator_init(jax.random.PRNGKey(0), channels=16,
                                     num_transformer_blocks=1)

    def st_apply(*a, **kw):
        if not fused:
            kw["fast"] = False
        return st_mod.structural_transformer_apply(*a, **kw)

    def pipeline(params, imgs_u8):
        prev = eg_mod.structural_transformer_apply
        eg_mod.structural_transformer_apply = st_apply
        try:
            x = to_model_range(imgs_u8).astype(jnp.bfloat16)
            y = enhanced_generator_apply(params, x, fast_attention=True)
        finally:
            eg_mod.structural_transformer_apply = prev
        return (from_model_range(y.astype(jnp.float32)) * 255.0
                ).astype(jnp.uint8)

    return params, jax.jit(pipeline)


def measure(params, fn, data):
    out = fn(params, data[0])
    np.asarray(out[0, 0, 0])  # drain warmup
    best = float("inf")
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        for i in range(ITERS):
            out = fn(params, data[i % len(data)])
        np.asarray(out[0, 0, 0])
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best, out


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    data = [jnp.asarray(rng.integers(0, 256, (BATCH, SIZE, SIZE, 3),
                                     dtype=np.uint8)) for _ in range(2)]
    results = {}
    outs = {}
    for name, fused in (("fused", True), ("xla-block", False)):
        params, fn = build(fused)
        dt, out = measure(params, fn, data)
        results[name] = dt
        outs[name] = np.asarray(fn(params, data[0]))
        print(f"{name:10s}: {dt*1e3:8.1f} ms  "
              f"{BATCH/dt:8.1f} img/s  ({BATCH}x{SIZE}^2)")
    d = np.abs(outs["fused"].astype(np.int32)
               - outs["xla-block"].astype(np.int32))
    print(f"uint8 divergence: max {d.max()}  mean {d.mean():.4f}  "
          f"frac>2 {(d > 2).mean():.5f}")
    print(f"speedup: {results['xla-block'] / results['fused']:.3f}x")


if __name__ == "__main__":
    main()
