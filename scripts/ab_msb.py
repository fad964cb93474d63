"""MultiScaleBlock piecewise ablation (VERDICT r2 #2: down1/up1 traffic).

The per-stage roofline attributes down1 33.4 ms / up1 43.9 ms at ~51-56%
of HBM peak, and names the MSB's two InstanceNorms + 4-branch concat as
pure traffic. Before fusing anything, measure where one MSB's time
actually goes at the deployed shapes — progressively larger prefixes of
the block (each prefix returns its full tensor so nothing DCEs):

  p0 branches   4 branch convs + channel concat
  p1 +in1       + InstanceNorm over the concat
  p2 +relu1     + ReLU
  p3 +fusion    + 1x1 fusion conv
  p4 full       + InstanceNorm + ReLU + residual (the whole block)

and two same-math-different-schedule candidates of the full block:

  onepass       both INs compute stats as E[x^2]-E[x]^2 in ONE read
                (fp32 accumulation; vs the two-pass mean-then-centered-var
                the default instance_norm uses — halves stat-read traffic)
  fused         the Pallas fused tail, if/when it exists

Run on the REAL CHIP:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_msb.py [--batch 96]
"""

import argparse
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multi_style_transfer_gan_tpu.core import conv2d, instance_norm, relu
from multi_style_transfer_gan_tpu.core.norm import instance_norm_onepass
from multi_style_transfer_gan_tpu.models.enhanced_generator import (
    _MSB_BRANCHES, multi_scale_block_init,
)
from multi_style_transfer_gan_tpu.utils import enable_compilation_cache

SHAPES = [  # (H, W, C) — the three deployed MSB shapes at 512^2 input
    (256, 256, 32),   # down1 / up1
    (128, 128, 64),   # down2
    (512, 512, 16),   # up2
]
ROUNDS, ITERS = 5, 4


def msb_prefix(params, x, upto, *, norm=instance_norm):
    g = lambda n: params[n]
    outs = [conv2d(x, g(f"{name}.0.weight"), g(f"{name}.0.bias"),
                   padding=p, dilation=d)
            for name, k, p, d in _MSB_BRANCHES]
    h = jnp.concatenate(outs, axis=-1)
    if upto == 0:
        return h
    h = norm(h)
    if upto == 1:
        return h
    h = relu(h)
    if upto == 2:
        return h
    h = conv2d(h, g("fusion.0.weight"), g("fusion.0.bias"))
    if upto == 3:
        return h
    return relu(norm(h)) + x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    args = ap.parse_args()
    enable_compilation_cache()

    for H, W, C in SHAPES:
        params = multi_scale_block_init(jax.random.PRNGKey(0), C)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((args.batch, H, W, C)),
                        dtype=jnp.bfloat16)

        variants = {}
        for upto, name in enumerate(["branches", "+in1", "+relu1",
                                     "+fusion", "full"]):
            variants[name] = jax.jit(
                lambda p, v, u=upto: msb_prefix(p, v, u))
        variants["onepass"] = jax.jit(
            lambda p, v: msb_prefix(p, v, 4, norm=instance_norm_onepass))

        fns, cost = {}, {}
        for name, fn in variants.items():
            try:
                compiled = fn.lower(params, x).compile()
                ca = compiled.cost_analysis()
                if isinstance(ca, (list, tuple)):
                    ca = ca[0]
                cost[name] = (float(ca.get("flops", 0.0)),
                              float(ca.get("bytes accessed", 0.0)))
                out = fn(params, x)
                np.asarray(jax.device_get(out.ravel()[0]))
                fns[name] = fn
            except Exception as e:
                print(f"{name} failed: {type(e).__name__} {str(e)[:90]}")

        # parity of the one-pass stats variant (same math, different schedule)
        if "onepass" in fns and "full" in fns:
            a = np.asarray(fns["full"](params, x), dtype=np.float32)
            b = np.asarray(fns["onepass"](params, x), dtype=np.float32)
            print(f"{args.batch}x{H}x{W}x{C}: onepass max|d| = "
                  f"{np.abs(a - b).max():.2e}")

        times = {n: float("inf") for n in fns}
        for _ in range(ROUNDS):
            for name, fn in fns.items():  # interleaved rounds
                t0 = time.perf_counter()
                for _ in range(ITERS):
                    out = fn(params, x)
                np.asarray(jax.device_get(out.ravel()[0]))
                times[name] = min(times[name],
                                  (time.perf_counter() - t0) / ITERS)

        print(f"\n{args.batch}x{H}x{W}x{C} bf16 — MSB piecewise "
              f"(min over {ROUNDS} interleaved rounds)")
        print(f"{'prefix':10s} {'ms':>7s} {'GB':>7s} {'GB/s':>6s}")
        for name in variants:
            if name not in fns:
                continue
            t = times[name]
            gb = cost[name][1] / 1e9
            print(f"{name:10s} {t*1e3:7.2f} {gb:7.2f} {gb/t:6.0f}")


if __name__ == "__main__":
    main()
