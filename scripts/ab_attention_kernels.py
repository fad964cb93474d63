"""A/B window-attention kernels (v1/v3/v4) on the generator's hot shapes.

Usage: python scripts/ab_attention_kernels.py [batch]
Shapes: C=16 @512^2 (up2), C=32 @256^2 (down1/up1), C=64 @128^2 (down2).
Methodology: docs/PERFORMANCE.md (same-script A/B, min over rounds).
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from multi_style_transfer_gan_tpu.models.enhanced_generator import (
    local_attention_init,
)
from multi_style_transfer_gan_tpu.ops.pallas.window_attention import (
    fused_window_channel_attention,
)
from multi_style_transfer_gan_tpu.ops.pallas.window_attention_v3 import (
    window_attention_v3,
)
from multi_style_transfer_gan_tpu.ops.pallas.window_attention_v4 import (
    window_attention_v4,
)
from multi_style_transfer_gan_tpu.utils import enable_compilation_cache

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 96
ROUNDS, ITERS = 4, 4
SHAPES = [(16, 512), (32, 256), (64, 128)]
V4_CHUNKS = [4, 8, 16]


def bench(fn, x):
    out = fn(x)
    np.asarray(jax.device_get(out.ravel()[0]))
    best = float("inf")
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(x)
        np.asarray(jax.device_get(out.ravel()[0]))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    for C, S in SHAPES:
        params = local_attention_init(jax.random.PRNGKey(1), C)
        w = {k: v.astype(jnp.bfloat16) for k, v in params.items()}
        x = jnp.asarray(rng.standard_normal((BATCH, S, S, C)), jnp.bfloat16)
        cands = {
            "v1": lambda x: fused_window_channel_attention(
                x, w["qkv.weight"], w["qkv.bias"], w["proj.weight"],
                w["proj.bias"]),
            "v3": lambda x: window_attention_v3(
                x, w["qkv.weight"], w["qkv.bias"], w["proj.weight"],
                w["proj.bias"]),
        }
        for nc in V4_CHUNKS:
            cands[f"v4x{nc}"] = lambda x, nc=nc: window_attention_v4(
                x, w["qkv.weight"], w["qkv.bias"], w["proj.weight"],
                w["proj.bias"], num_chunks=nc)
        print(f"--- C={C} {S}^2 x{BATCH} ---")
        for name, fn in cands.items():
            try:
                dt = bench(jax.jit(fn), x)
                print(f"  {name:6s}: {dt*1e3:7.2f} ms")
            except Exception as e:
                print(f"  {name:6s}: FAILED {type(e).__name__}")


if __name__ == "__main__":
    main()
