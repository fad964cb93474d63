"""Cumulative-prefix stage profile of the PACKED engine forward.

Times jitted prefixes of packed_enhanced_generator_apply (fast_attention
kernels active); successive differences = per-stage cost. Mirrors the
NHWC profile in docs/PERFORMANCE.md "Where the time goes".

Usage: python scripts/profile_packed.py [batch] [size]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from multi_style_transfer_gan_tpu.models import enhanced_generator_init
import multi_style_transfer_gan_tpu.models.packed_generator as pg
from multi_style_transfer_gan_tpu.ops import to_model_range
from multi_style_transfer_gan_tpu.ops.packed import (
    depth_to_space, pack_conv2d_spec, pack_conv_transpose2d_weight,
    packed_conv2d, packed_conv_transpose2d, packed_global_avg_pool,
    packed_instance_norm, space_to_depth,
)
from multi_style_transfer_gan_tpu.core import linear, relu, tanh
from multi_style_transfer_gan_tpu.utils import enable_compilation_cache

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 96
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 512
ROUNDS, ITERS = 4, 4
F = pg.F

STAGES = ["s2d+stem", "down1", "down2", "style+transformer", "up1", "up2",
          "output+d2s"]


def prefix_apply(p, x, upto: int):
    """First ``upto``+1 stages of packed_enhanced_generator_apply."""
    c = p["initial.0.weight"].shape[-1] // (F * F)
    n_blocks = pg.num_transformer_blocks_of(p)
    xp = space_to_depth(x, F)
    spec7 = pack_conv2d_spec(7, f_in=F, f_out=F, stride=1, padding=3)
    spec4s2 = pack_conv2d_spec(4, f_in=F, f_out=F, stride=2, padding=1)
    _, _, spect = pack_conv_transpose2d_weight(jnp.zeros((4, 4, 1, 1)), None,
                                               f_in=F, f_out=F, stride=2,
                                               padding=1)
    h = relu(packed_instance_norm(
        packed_conv2d(xp, p["initial.0.weight"], p["initial.0.bias"], spec7),
        F))
    if upto == 0:
        return h
    widths = {"down1": 2 * c, "down2": 4 * c}
    for si, name in enumerate(("down1", "down2"), start=1):
        h = packed_conv2d(h, p[f"{name}.0.weight"], p[f"{name}.0.bias"],
                          spec4s2)
        h = relu(packed_instance_norm(h, F))
        h = pg._attention(p, h, f"{name}.3.", fast=True)
        h = pg._msb(p, h, f"{name}.4.", widths[name])
        if upto == si:
            return h
    style = packed_global_avg_pool(h, F)
    style = relu(linear(style, p["style_encoder.2.weight"],
                        p["style_encoder.2.bias"]))
    for i in range(n_blocks):
        h = pg._packed_transformer_block(p, h, style, xp,
                                         f"transformer_blocks.{i}.", 4 * c,
                                         fast=True)
    if upto == 3:
        return h
    for si, (name, w) in enumerate((("up1", 2 * c), ("up2", c)), start=4):
        Hp, Wp = h.shape[1] * 2, h.shape[2] * 2
        h = packed_conv_transpose2d(h, p[f"{name}.0.weight"],
                                    p[f"{name}.0.bias"], spect,
                                    out_hw=(Hp, Wp))
        h = relu(packed_instance_norm(h, F))
        h = pg._attention(p, h, f"{name}.3.", fast=True)
        h = pg._msb(p, h, f"{name}.4.", w)
        if upto == si:
            return h
    h = packed_conv2d(h, p["output.0.weight"], p["output.0.bias"], spec7)
    return depth_to_space(tanh(h), F)


def main():
    enable_compilation_cache()
    params = enhanced_generator_init(jax.random.PRNGKey(0), channels=16,
                                     num_transformer_blocks=1)
    packed = pg.pack_enhanced_generator_params(params)
    rng = np.random.default_rng(0)
    data = [jnp.asarray(rng.integers(0, 256, (BATCH, SIZE, SIZE, 3),
                                     dtype=np.uint8)) for _ in range(2)]
    times = []
    for upto in range(len(STAGES)):
        fn = jax.jit(lambda p, u8, s=upto: prefix_apply(
            p, to_model_range(u8).astype(jnp.bfloat16), s))
        try:
            out = fn(packed, data[0])
            np.asarray(jax.device_get(out.ravel()[0]))
            best = float("inf")
            for _ in range(ROUNDS):
                t0 = time.perf_counter()
                for i in range(ITERS):
                    out = fn(packed, data[i % len(data)])
                np.asarray(jax.device_get(out.ravel()[0]))
                best = min(best, (time.perf_counter() - t0) / ITERS)
            times.append(best)
        except Exception as e:  # compile-service outage etc.
            print(f"prefix {upto} failed: {type(e).__name__}")
            times.append(float("nan"))
    prev = 0.0
    for name, t in zip(STAGES, times):
        dt = (t - prev) * 1e3
        print(f"{name:18s} cum {t*1e3:7.1f} ms   stage {dt:7.1f} ms")
        prev = t
    print(f"total: {times[-1]*1e3:.1f} ms = {BATCH/times[-1]:.1f} img/s "
          f"({BATCH}x{SIZE}^2, packed fast)")


if __name__ == "__main__":
    main()
