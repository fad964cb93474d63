"""A/B the fused in_relu / in_leaky_relu (one-pass stats + hand VJP).

VERDICT r2 #3 names the conv/IN backward stack as the train step's
residual headroom. core.norm.in_relu replaces relu(instance_norm(x))
with a one-pass-stats forward and a hand-written one-elementwise-pass
backward. This script measures, same-run interleaved:

  1. the CycleGAN train step (batch 8, 256^2, bf16, fast attention —
     the reference config whose r2 number is 314.4 ms/step), and
  2. the flagship inference pipeline (96x512^2 uint8 stylize),

with IN_ACT_IMPL = "fused" vs "reference" (trace-time switch; each
variant is traced under its own setting), plus loss / output parity.

Run on the REAL CHIP:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_in_fused.py [--what both]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multi_style_transfer_gan_tpu.core import norm as core_norm
from multi_style_transfer_gan_tpu.utils import enable_compilation_cache

ROUNDS = 5


def build_train_variants():
    from multi_style_transfer_gan_tpu.train.cyclegan import (
        cyclegan_init_state, cyclegan_train_step, make_optimizers,
    )

    state = cyclegan_init_state(jax.random.PRNGKey(0), channels=16,
                                num_transformer_blocks=1)
    g_tx, d_tx = make_optimizers()
    ka, kb = jax.random.split(jax.random.PRNGKey(1))
    ra = jax.random.uniform(ka, (8, 256, 256, 3), minval=-1.0, maxval=1.0)
    rb = jax.random.uniform(kb, (8, 256, 256, 3), minval=-1.0, maxval=1.0)

    fns = {}
    for impl in ("fused", "reference"):
        core_norm.IN_ACT_IMPL = impl
        fns[impl] = jax.jit(functools.partial(
            cyclegan_train_step, g_tx=g_tx, d_tx=d_tx,
            compute_dtype=jnp.bfloat16, remat=False, fast_attention=True))
        # trace NOW, under this impl setting (jit defers tracing to 1st call)
        _, losses = fns[impl](state, ra, rb)
        print(f"train {impl}: "
              + " ".join(f"{k}={float(v):.4f}" for k, v in
                         sorted(losses.items())), flush=True)
    return state, ra, rb, fns


def bench_train():
    state, ra, rb, fns = build_train_variants()
    times = {n: float("inf") for n in fns}
    for _ in range(ROUNDS):
        for name, fn in fns.items():
            s = state
            s, losses = fn(s, ra, rb)
            _ = float(losses["g_loss"])  # drain
            t0 = time.perf_counter()
            for _ in range(3):
                s, losses = fn(s, ra, rb)
            _ = float(losses["g_loss"])
            times[name] = min(times[name], (time.perf_counter() - t0) / 3)
    for name, t in times.items():
        print(f"train {name}: {t * 1e3:.1f} ms/step")
    print(f"train fused/reference = "
          f"{times['reference'] / times['fused']:.3f}x")


def bench_inference(batch=96):
    from multi_style_transfer_gan_tpu.models import (
        enhanced_generator_apply, enhanced_generator_init,
    )
    from multi_style_transfer_gan_tpu.ops import (
        to_model_range, from_model_range,
    )

    params = enhanced_generator_init(jax.random.PRNGKey(0), channels=16,
                                     num_transformer_blocks=1)
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.integers(0, 256, (batch, 512, 512, 3),
                                    dtype=np.uint8))

    def pipeline(params, imgs_u8):
        xx = to_model_range(imgs_u8).astype(jnp.bfloat16)
        y = enhanced_generator_apply(params, xx, fast_attention=True)
        return (from_model_range(y.astype(jnp.float32)) * 255.0
                ).astype(jnp.uint8)

    fns, outs = {}, {}
    for impl in ("fused", "reference"):
        core_norm.IN_ACT_IMPL = impl
        fns[impl] = jax.jit(pipeline)
        outs[impl] = np.asarray(fns[impl](params, x))  # traces under impl
    d = np.abs(outs["fused"].astype(np.int32)
               - outs["reference"].astype(np.int32))
    print(f"inference uint8 divergence fused-vs-reference: mean {d.mean():.2f}"
          f" p99 {np.percentile(d, 99):.0f} max {d.max()}", flush=True)

    times = {n: float("inf") for n in fns}
    for _ in range(ROUNDS):
        for name, fn in fns.items():
            o = None
            for _ in range(3):
                o = fn(params, x)
            _ = np.asarray(o[0, :1, :1])  # drain
            t0 = time.perf_counter()
            for _ in range(3):
                o = fn(params, x)
            _ = np.asarray(o[0, :1, :1])
            times[name] = min(times[name], (time.perf_counter() - t0) / 3)
    for name, t in times.items():
        print(f"inference {name}: {t * 1e3:.1f} ms = {batch / t:.1f} img/s")
    print(f"inference fused/reference = "
          f"{times['reference'] / times['fused']:.3f}x")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", choices=["train", "inference", "both"],
                    default="both")
    args = ap.parse_args()
    enable_compilation_cache()
    if args.what in ("inference", "both"):
        bench_inference()
    if args.what in ("train", "both"):
        bench_train()


if __name__ == "__main__":
    main()
