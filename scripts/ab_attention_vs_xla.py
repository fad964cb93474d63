"""A/B the fused Pallas window-attention kernels against the plain XLA
einsum formulation (_attention_math) on the generator's hot shapes.

Usage: PYTHONPATH=.:$PYTHONPATH python scripts/ab_attention_vs_xla.py C S [batch]
(one shape per process — the three shapes together can OOM a single chip).
Methodology: docs/PERFORMANCE.md (same-script A/B, min over rounds).
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from multi_style_transfer_gan_tpu.models.enhanced_generator import (
    _attention_math, local_attention_init,
)
from multi_style_transfer_gan_tpu.ops.pallas.window_attention import (
    fused_window_channel_attention,
)
from multi_style_transfer_gan_tpu.ops.pallas.window_attention_v3 import (
    window_attention_v3,
)
from multi_style_transfer_gan_tpu.utils import enable_compilation_cache

C = int(sys.argv[1])
S = int(sys.argv[2])
BATCH = int(sys.argv[3]) if len(sys.argv) > 3 else 96
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
    rng = np.random.default_rng(0)
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
        "xla": lambda x: _attention_math(
            x, w["qkv.weight"], w["qkv.bias"], w["proj.weight"],
            w["proj.bias"], window_size=4, eps=1e-12),
    }
    print(f"--- C={C} {S}^2 x{BATCH} ---")
    for name, fn in cands.items():
        try:
            dt = bench(jax.jit(fn), x)
            print(f"  {name:4s}: {dt*1e3:7.2f} ms")
        except Exception as e:
            print(f"  {name:4s}: FAILED {type(e).__name__}")


if __name__ == "__main__":
    main()
