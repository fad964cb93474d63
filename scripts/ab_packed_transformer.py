"""A/B the fused transformer block inside the PACKED inference engine.

Usage: python scripts/ab_packed_transformer.py [batch] [size]
(methodology: docs/PERFORMANCE.md — A/B in one script, min over rounds).
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from multi_style_transfer_gan_tpu.models import enhanced_generator_init
import multi_style_transfer_gan_tpu.models.packed_generator as pg
from multi_style_transfer_gan_tpu.ops import to_model_range, from_model_range
from multi_style_transfer_gan_tpu.utils import enable_compilation_cache

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 96
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 512
ROUNDS, ITERS = 4, 4


def build(fused: bool):
    params = enhanced_generator_init(jax.random.PRNGKey(0), channels=16,
                                     num_transformer_blocks=1)
    packed = pg.pack_enhanced_generator_params(params)
    orig_block = pg._packed_transformer_block

    def block(*a, **kw):
        if not fused:
            kw["fast"] = False
        return orig_block(*a, **kw)

    def pipeline(packed, imgs_u8):
        prev = pg._packed_transformer_block
        pg._packed_transformer_block = block
        try:
            x = to_model_range(imgs_u8).astype(jnp.bfloat16)
            y = pg.packed_enhanced_generator_apply(packed, x,
                                                   fast_attention=True)
        finally:
            pg._packed_transformer_block = prev
        return (from_model_range(y.astype(jnp.float32)) * 255.0
                ).astype(jnp.uint8)

    return packed, jax.jit(pipeline)


def measure(packed, fn, data):
    out = fn(packed, data[0])
    np.asarray(out[0, 0, 0])
    best = float("inf")
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        for i in range(ITERS):
            out = fn(packed, data[i % len(data)])
        np.asarray(out[0, 0, 0])
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    data = [jnp.asarray(rng.integers(0, 256, (BATCH, SIZE, SIZE, 3),
                                     dtype=np.uint8)) for _ in range(2)]
    results = {}
    for name, fused in (("fused", True), ("packed-xla", False)):
        packed, fn = build(fused)
        results[name] = measure(packed, fn, data)
        print(f"{name:10s}: {results[name]*1e3:8.1f} ms  "
              f"{BATCH/results[name]:8.1f} img/s  ({BATCH}x{SIZE}^2)")
    print(f"speedup: {results['packed-xla'] / results['fused']:.3f}x")


if __name__ == "__main__":
    main()
