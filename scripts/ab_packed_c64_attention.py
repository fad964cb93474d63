"""A/B the packed engine's attention options at a given stage shape.

Candidates on a (B, Hp, Hp, 16*C) packed tensor:
  per-phase : packed_window_attention_pallas
  v3-packed : packed_window_attention_v3 (current C<=32 dispatch)
  d2s+v1    : depth_to_space -> v1 per-window kernel -> space_to_depth
  d2s+v4    : same hop through the chunk-looped v4 kernel

Usage: python scripts/ab_packed_c64_attention.py [batch] [C] [Hp]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from multi_style_transfer_gan_tpu.models.enhanced_generator import (
    local_attention_init,
)
from multi_style_transfer_gan_tpu.ops.packed import (
    depth_to_space, space_to_depth,
)
from multi_style_transfer_gan_tpu.ops.pallas.packed_attention import (
    packed_window_attention_pallas,
)
from multi_style_transfer_gan_tpu.ops.pallas.window_attention import (
    fused_window_channel_attention,
)
from multi_style_transfer_gan_tpu.ops.pallas.window_attention_v4 import (
    window_attention_v4,
)
from multi_style_transfer_gan_tpu.utils import enable_compilation_cache

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 96
C = int(sys.argv[2]) if len(sys.argv) > 2 else 64
HP = int(sys.argv[3]) if len(sys.argv) > 3 else 32
ROUNDS, ITERS = 4, 4


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
    params = local_attention_init(jax.random.PRNGKey(1), C)
    w = {k: v.astype(jnp.bfloat16) for k, v in params.items()}
    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.standard_normal((BATCH, HP, HP, 16 * C)),
                     jnp.bfloat16)
    a = (w["qkv.weight"], w["qkv.bias"], w["proj.weight"], w["proj.bias"])
    from multi_style_transfer_gan_tpu.ops.pallas.window_attention_v3 import (
        packed_window_attention_v3,
    )
    cands = {
        "per-phase": lambda x: packed_window_attention_pallas(x, *a),
        "v3-packed": lambda x: packed_window_attention_v3(x, *a),
        "d2s+v1": lambda x: space_to_depth(
            fused_window_channel_attention(depth_to_space(x, 4), *a), 4),
        "d2s+v4": lambda x: space_to_depth(
            window_attention_v4(depth_to_space(x, 4), *a), 4),
    }
    ref = None
    print(f"--- packed C={C} Hp={HP} x{BATCH} ---")
    for name, fn in cands.items():
        try:
            dt = bench(jax.jit(fn), x=xp)
            out = np.asarray(jax.jit(fn)(xp), np.float32)
            if ref is None:
                ref = out
            d = np.abs(out - ref).max()
            print(f"  {name:9s}: {dt*1e3:7.2f} ms   maxdiff {d:.2e}")
        except Exception as e:
            print(f"  {name:9s}: FAILED {type(e).__name__}")


if __name__ == "__main__":
    main()
