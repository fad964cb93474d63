"""Same-run per-stage profile of BOTH engines (NHWC vs packed).

The chip is time-shared (docs/PERFORMANCE.md measurement rules), so
cross-run tables mislead; this interleaves cumulative-prefix timings of
the NHWC and packed forwards round-robin per prefix level and prints the
two stage tables side by side — the input for hybrid-engine dispatch
decisions.

Usage: python scripts/profile_engines.py [batch] [size]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from multi_style_transfer_gan_tpu.core import linear, relu, tanh
from multi_style_transfer_gan_tpu.core.conv import conv2d, conv_transpose2d
from multi_style_transfer_gan_tpu.core.norm import instance_norm
from multi_style_transfer_gan_tpu.models import enhanced_generator_init
import multi_style_transfer_gan_tpu.models.packed_generator as pg
from multi_style_transfer_gan_tpu.models.enhanced_generator import (
    local_attention_apply, multi_scale_block_apply,
    num_transformer_blocks_of,
)
from multi_style_transfer_gan_tpu.models.structural_transformer import (
    structural_transformer_apply,
)
from multi_style_transfer_gan_tpu.ops import to_model_range
from multi_style_transfer_gan_tpu.utils import enable_compilation_cache

from profile_packed import prefix_apply as packed_prefix

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 96
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 512
ROUNDS, ITERS = 4, 4

STAGES = ["stem", "down1", "down2", "style+transformer", "up1", "up2",
          "output"]


def nhwc_prefix(params, x, upto: int):
    """First ``upto``+1 stages of enhanced_generator_apply (fast kernels)."""
    orig = x
    h = relu(instance_norm(
        conv2d(x, params["initial.0.weight"], params["initial.0.bias"],
               padding=3)))
    if upto == 0:
        return h
    for si, name in enumerate(("down1", "down2"), start=1):
        h = conv2d(h, params[f"{name}.0.weight"], params[f"{name}.0.bias"],
                   stride=2, padding=1)
        h = relu(instance_norm(h))
        h = local_attention_apply(params, h, prefix=f"{name}.3.", fast=True)
        h = multi_scale_block_apply(params, h, prefix=f"{name}.4.")
        if upto == si:
            return h
    B, H, W, C = h.shape
    style = relu(linear(jnp.mean(h, axis=(1, 2)),
                        params["style_encoder.2.weight"],
                        params["style_encoder.2.bias"]))
    tokens = h.reshape(B, H * W, C)
    for i in range(num_transformer_blocks_of(params)):
        tokens = structural_transformer_apply(
            params, tokens, style, orig, (H, W),
            prefix=f"transformer_blocks.{i}.", fast=True)
    h = tokens.reshape(B, H, W, C)
    if upto == 3:
        return h
    for si, name in enumerate(("up1", "up2"), start=4):
        h = conv_transpose2d(h, params[f"{name}.0.weight"],
                             params[f"{name}.0.bias"], stride=2, padding=1)
        h = relu(instance_norm(h))
        h = local_attention_apply(params, h, prefix=f"{name}.3.", fast=True)
        h = multi_scale_block_apply(params, h, prefix=f"{name}.4.")
        if upto == si:
            return h
    h = conv2d(h, params["output.0.weight"], params["output.0.bias"],
               padding=3)
    return tanh(h)


def main():
    enable_compilation_cache()
    params = enhanced_generator_init(jax.random.PRNGKey(0), channels=16,
                                     num_transformer_blocks=1)
    packed = pg.pack_enhanced_generator_params(params)
    rng = np.random.default_rng(0)
    data = [jnp.asarray(rng.integers(0, 256, (BATCH, SIZE, SIZE, 3),
                                     dtype=np.uint8)) for _ in range(2)]

    fns, times = {}, {}
    for eng, (pp, pf) in {"nhwc": (params, nhwc_prefix),
                          "packed": (packed, packed_prefix)}.items():
        times[eng] = [float("nan")] * len(STAGES)
        for upto in range(len(STAGES)):
            fn = jax.jit(lambda p, u8, f=pf, s=upto: f(
                p, to_model_range(u8).astype(jnp.bfloat16), s))
            try:
                out = fn(pp, data[0])
                np.asarray(jax.device_get(out.ravel()[0]))
                fns[(eng, upto)] = (fn, pp)
            except Exception as e:  # compile-service outage etc.
                print(f"{eng} prefix {upto} compile failed: "
                      f"{type(e).__name__}")

    for upto in range(len(STAGES)):
        for eng in ("nhwc", "packed"):
            if (eng, upto) not in fns:
                continue
            fn, pp = fns[(eng, upto)]
            best = float("inf")
            for _ in range(ROUNDS):
                t0 = time.perf_counter()
                for i in range(ITERS):
                    out = fn(pp, data[i % len(data)])
                np.asarray(jax.device_get(out.ravel()[0]))
                best = min(best, (time.perf_counter() - t0) / ITERS)
            times[eng][upto] = best

    print(f"\n{BATCH}x{SIZE}^2 bf16, fast kernels; stage ms "
          "(cumulative-prefix deltas)")
    print(f"{'stage':20s} {'nhwc':>10s} {'packed':>10s}")
    prev = {"nhwc": 0.0, "packed": 0.0}
    for i, name in enumerate(STAGES):
        row = []
        for eng in ("nhwc", "packed"):
            t = times[eng][i]
            row.append((t - prev[eng]) * 1e3)
            if t == t:
                prev[eng] = t
        print(f"{name:20s} {row[0]:9.1f} {row[1]:9.1f}")
    for eng in ("nhwc", "packed"):
        t = times[eng][-1]
        print(f"{eng}: total {t*1e3:.1f} ms = {BATCH/t:.1f} img/s")


if __name__ == "__main__":
    main()
