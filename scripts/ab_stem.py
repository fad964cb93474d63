"""A/B: the 7x7 stem conv (C_in=3 -> C=16) as-is vs via space-to-depth.

The stem is lane-starved in NHWC (C_in=3, C_out=16 on 128 lanes); packing
F x F pixels into channels makes the conv dense (F=4: 3x3 packed kernel,
K=768 lanes in, 256 out) at the cost of s2d/d2s transposes. Exact same
math (ops/packed.py repacking is exact); candidates A/B'd in one run
per the docs/PERFORMANCE.md measurement rules.

Usage: python scripts/ab_stem.py [batch] [size]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from multi_style_transfer_gan_tpu.core import relu
from multi_style_transfer_gan_tpu.core.conv import conv2d
from multi_style_transfer_gan_tpu.core.norm import instance_norm
from multi_style_transfer_gan_tpu.models import enhanced_generator_init
from multi_style_transfer_gan_tpu.ops import to_model_range
from multi_style_transfer_gan_tpu.ops.packed import (
    depth_to_space, pack_conv2d_weight, packed_conv2d,
    packed_instance_norm, space_to_depth,
)
from multi_style_transfer_gan_tpu.utils import enable_compilation_cache

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 96
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 512
ROUNDS, ITERS = 5, 4


def main():
    enable_compilation_cache()
    params = enhanced_generator_init(jax.random.PRNGKey(0), channels=16,
                                     num_transformer_blocks=1)
    w, b = params["initial.0.weight"], params["initial.0.bias"]

    def stem_nhwc(u8):
        x = to_model_range(u8).astype(jnp.bfloat16)
        return relu(instance_norm(conv2d(x, w, b, padding=3)))

    def make_stem_s2d(f):
        w_p, b_p, spec = pack_conv2d_weight(w, b, f_in=f, f_out=f, stride=1,
                                            padding=3)

        def stem(u8):
            x = to_model_range(u8).astype(jnp.bfloat16)
            xp = space_to_depth(x, f)
            h = packed_conv2d(xp, w_p.astype(jnp.bfloat16), b_p, spec)
            h = relu(packed_instance_norm(h, f))
            return depth_to_space(h, f)

        return stem

    cands = {"nhwc": stem_nhwc}
    for f in (2, 4, 8):
        cands[f"s2d{f}"] = make_stem_s2d(f)

    rng = np.random.default_rng(0)
    data = [jnp.asarray(rng.integers(0, 256, (BATCH, SIZE, SIZE, 3),
                                     dtype=np.uint8)) for _ in range(2)]

    fns, ref = {}, None
    for name, f in cands.items():
        fn = jax.jit(f)
        try:
            out = fn(data[0])
            np.asarray(jax.device_get(out.ravel()[0]))
        except Exception as e:
            print(f"{name}: compile failed ({type(e).__name__})")
            continue
        fns[name] = fn
        got = np.asarray(jax.device_get(out)).astype(np.float32)
        if ref is None:
            ref = got
        else:
            print(f"{name}: max|d| vs nhwc = {np.abs(got - ref).max():.3e}")

    best = {}
    for _ in range(ROUNDS):
        for name, fn in fns.items():
            out = fn(data[0])
            np.asarray(jax.device_get(out.ravel()[0]))  # drain
            t0 = time.perf_counter()
            for i in range(ITERS):
                out = fn(data[i % len(data)])
            np.asarray(jax.device_get(out.ravel()[0]))
            dt = (time.perf_counter() - t0) / ITERS
            best[name] = min(best.get(name, float("inf")), dt)

    print(f"\nstem {BATCH}x{SIZE}^2 bf16 (uint8 in, IN+relu included):")
    for name, dt in best.items():
        print(f"{name:8s} {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
