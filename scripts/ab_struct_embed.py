"""A/B: the transformer's structure-embed convs, NHWC vs s2d-packed.

struct_embed = two 3x3 stride-2 convs (3 -> dim/2 -> dim) on the FULL-RES
input (structural_transformer_apply) — lane-starved in NHWC. Packing the
input s2d(4) makes conv1 f_in=4 -> f_out=2 and conv2 f_in=2 -> f_out=1:
both dense, and the output lands directly in NHWC at the token grid with
NO depth-to-space. Exact same math (ops/packed.py repack).

Usage: python scripts/ab_struct_embed.py [batch] [size] [dim]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from multi_style_transfer_gan_tpu.core import conv2d, relu
from multi_style_transfer_gan_tpu.models.structural_transformer import (
    structural_transformer_init,
)
from multi_style_transfer_gan_tpu.ops.packed import (
    pack_conv2d_weight, packed_conv2d, space_to_depth,
)
from multi_style_transfer_gan_tpu.utils import enable_compilation_cache

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 96
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 512
DIM = int(sys.argv[3]) if len(sys.argv) > 3 else 64
ROUNDS, ITERS = 5, 4


def main():
    enable_compilation_cache()
    p = structural_transformer_init(jax.random.PRNGKey(0), DIM)
    w1, b1 = p["struct_embed.0.weight"], p["struct_embed.0.bias"]
    w2, b2 = p["struct_embed.2.weight"], p["struct_embed.2.bias"]

    def embed_nhwc(x):
        s = relu(conv2d(x, w1, b1, stride=2, padding=1))
        return relu(conv2d(s, w2, b2, stride=2, padding=1))

    w1p, b1p, spec1 = pack_conv2d_weight(w1, b1, f_in=4, f_out=2, stride=2,
                                         padding=1)
    w2p, b2p, spec2 = pack_conv2d_weight(w2, b2, f_in=2, f_out=1, stride=2,
                                         padding=1)

    def embed_s2d(x):
        B, H, _, _ = x.shape
        xp = space_to_depth(x, 4)
        s = relu(packed_conv2d(xp, w1p.astype(x.dtype), b1p, spec1))
        # crop: the symmetric -dmin pad over-produces trailing rows when
        # f_in != f_out (spec pads both sides with the LEFT requirement)
        s = s[:, :H // 4, :H // 4, :]
        s = relu(packed_conv2d(s, w2p.astype(x.dtype), b2p, spec2))
        return s[:, :H // 4, :H // 4, :]

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, SIZE, SIZE, 3)),
                    jnp.bfloat16)

    fns, outs = {}, {}
    for name, f in {"nhwc": embed_nhwc, "s2d4": embed_s2d}.items():
        fn = jax.jit(f)
        out = fn(x)
        np.asarray(jax.device_get(out.ravel()[0]))
        fns[name] = fn
        outs[name] = np.asarray(jax.device_get(out)).astype(np.float32)
    # s2d output channel order: f_out=1 collapses to plain NHWC, same order
    d = np.abs(outs["nhwc"] - outs["s2d4"]).max()
    print(f"max|d| = {d:.3e}  shapes {outs['nhwc'].shape} "
          f"{outs['s2d4'].shape}")

    best = {}
    for _ in range(ROUNDS):
        for name, fn in fns.items():
            out = fn(x)
            np.asarray(jax.device_get(out.ravel()[0]))
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = fn(x)
            np.asarray(jax.device_get(out.ravel()[0]))
            best[name] = min(best.get(name, float("inf")),
                             (time.perf_counter() - t0) / ITERS)

    print(f"\nstruct_embed {BATCH}x{SIZE}^2 -> dim {DIM} bf16:")
    for name, dt in best.items():
        print(f"{name:6s} {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
