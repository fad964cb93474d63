"""A/B the int8 PTQ engine vs the bf16 fast pipeline (throughput + quality).

Throughput: full uint8->uint8 stylize programs, same-run interleaved
min-over-rounds at the flagship shape. Quality: SSIM/PSNR of int8 vs the
fp32 XLA formulation, next to the bf16-vs-fp32 production floor on the
SAME inputs — random init is a chaotic worst case (per-stage ~1% quant
noise compounds through attention softmaxes), so pass --train_steps N to
first train the model briefly on a synthetic two-domain task (the
learning-dynamics harness recipe) and measure on a smoother, partially
trained network instead.

Run on the REAL CHIP:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_int8_engine.py \
      [--batch 96] [--size 512] [--train_steps 0]
"""

import argparse
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multi_style_transfer_gan_tpu.models import (
    enhanced_generator_apply, enhanced_generator_init,
)
from multi_style_transfer_gan_tpu.models.quantized_generator import (
    prepare_int8_model, quantized_enhanced_generator_apply,
)
from multi_style_transfer_gan_tpu.ops import to_model_range, from_model_range
from multi_style_transfer_gan_tpu.utils import enable_compilation_cache

ROUNDS, ITERS = 5, 3


def trained_params(steps, channels=16):
    """Train briefly on the synthetic cool-A/warm-B two-domain task
    (the PERFORMANCE.md learning-dynamics recipe) and return G_AB."""
    from multi_style_transfer_gan_tpu.train.cyclegan import (
        cyclegan_init_state, cyclegan_train_step, make_optimizers,
    )
    import functools

    state = cyclegan_init_state(jax.random.PRNGKey(0), channels=channels,
                                num_transformer_blocks=1)
    g_tx, d_tx = make_optimizers()
    step = jax.jit(functools.partial(
        cyclegan_train_step, g_tx=g_tx, d_tx=d_tx,
        compute_dtype=jnp.bfloat16, remat=False, fast_attention=True))
    key = jax.random.PRNGKey(1)
    for i in range(steps):
        key, ka, kb = jax.random.split(key, 3)
        base_a = jax.random.uniform(ka, (8, 256, 256, 3), minval=-1.0,
                                    maxval=1.0)
        ra = base_a * jnp.asarray([0.5, 0.7, 1.0]) - jnp.asarray(
            [0.4, 0.1, 0.4])  # cool domain
        base_b = jax.random.uniform(kb, (8, 256, 256, 3), minval=-1.0,
                                    maxval=1.0)
        rb = base_b * jnp.asarray([1.0, 0.7, 0.5]) + jnp.asarray(
            [0.4, -0.1, -0.4])  # warm domain
        state, losses = step(state, ra, rb)
        if i % 10 == 0:
            print(f"  train step {i}: g={float(losses['g_loss']):.3f} "
                  f"cyc={float(losses['cycle_loss']):.3f}", flush=True)
    return state.g_params["G_AB"]


def quality(params, size=256, images_dir=None):
    from multi_style_transfer_gan_tpu.metrics.quality import psnr, ssim

    rng = np.random.default_rng(1)
    if images_dir:
        # the round-4 trained-model protocol: real test photos for both
        # the eval inputs and the PTQ calibration batch (data-true scales)
        from PIL import Image

        from multi_style_transfer_gan_tpu.data import list_images

        paths = list_images(images_dir)
        if len(paths) < 4:
            raise SystemExit(f"need >=4 images in {images_dir}")

        def _load(ps):
            ims = [np.asarray(Image.open(p).convert("RGB").resize(
                (size, size), Image.LANCZOS), np.float32) for p in ps]
            return jnp.asarray(np.stack(ims) / 127.5 - 1.0, jnp.float32)

        x = _load(paths[:4])
        calib = _load(paths[4:12] if len(paths) > 4 else paths[:4])
        print(f"quality eval on {len(paths[:4])} real images from "
              f"{images_dir}", flush=True)
    else:
        x = jnp.asarray(rng.uniform(-1, 1, (2, size, size, 3)), jnp.float32)
        calib = jnp.asarray(rng.uniform(-1, 1, (2, size, size, 3)),
                            jnp.float32)
    qp = prepare_int8_model(params, [calib])

    ref = np.asarray(jax.jit(enhanced_generator_apply)(params, x),
                     np.float32)
    bf = np.asarray(jax.jit(enhanced_generator_apply)(
        params, x.astype(jnp.bfloat16)), np.float32)
    q8 = np.asarray(jax.jit(quantized_enhanced_generator_apply)(qp, x),
                    np.float32)

    def report(name, out):
        u_ref = ((ref + 1) * 127.5).clip(0, 255).astype(np.float32)
        u_out = ((out + 1) * 127.5).clip(0, 255).astype(np.float32)
        ss = np.mean([float(ssim(u_ref[i], u_out[i], data_range=255.0))
                      for i in range(u_ref.shape[0])])
        ps = np.mean([float(psnr(u_ref[i], u_out[i], data_range=255.0))
                      for i in range(u_ref.shape[0])])
        d = np.abs(ref - out)
        print(f"{name}: SSIM {ss:.4f}  PSNR {ps:.2f} dB  "
              f"mean|d| {d.mean():.4f}  max|d| {d.max():.4f}", flush=True)

    report("bf16 vs fp32 (production floor)", bf)
    report("int8 vs fp32                   ", q8)
    return qp


def throughput(params, qp, batch, size):
    rng = np.random.default_rng(0)
    u8 = jax.device_put(rng.integers(0, 256, (batch, size, size, 3),
                                     dtype=np.uint8))

    def pipe_bf16(p, imgs):
        x = to_model_range(imgs).astype(jnp.bfloat16)
        y = enhanced_generator_apply(p, x, fast_attention=True)
        return (from_model_range(y.astype(jnp.float32)) * 255).astype(
            jnp.uint8)

    def pipe_int8(q, imgs):
        x = to_model_range(imgs)
        y = quantized_enhanced_generator_apply(q, x, fast_attention=True)
        return (from_model_range(y.astype(jnp.float32)) * 255).astype(
            jnp.uint8)

    fns = {}
    try:
        f = jax.jit(pipe_bf16)
        _ = np.asarray(f(params, u8)[0, :1, :1])
        fns["bf16+fastattn"] = (f, params)
    except Exception as e:
        print(f"bf16 failed: {str(e)[:120]}")
    try:
        f = jax.jit(pipe_int8)
        _ = np.asarray(f(qp, u8)[0, :1, :1])
        fns["int8"] = (f, qp)
    except Exception as e:
        print(f"int8 failed: {str(e)[:120]}")

    times = {n: float("inf") for n in fns}
    for _ in range(ROUNDS):
        for name, (f, p) in fns.items():
            o = None
            for _ in range(ITERS):
                o = f(p, u8)
            _ = np.asarray(o[0, :1, :1])
            t0 = time.perf_counter()
            for _ in range(ITERS):
                o = f(p, u8)
            _ = np.asarray(o[0, :1, :1])
            times[name] = min(times[name], (time.perf_counter() - t0) / ITERS)
    for name, t in times.items():
        print(f"{name:14s} {t * 1e3:7.1f} ms = {batch / t:7.1f} img/s",
              flush=True)
    if len(times) == 2:
        print(f"int8 speedup: "
              f"{times['bf16+fastattn'] / times['int8']:.3f}x", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--train_steps", type=int, default=0)
    ap.add_argument("--model", type=str, default=None,
                    help="trained .pth checkpoint (the VERDICT r3 item-2 "
                         "protocol: answer the int8 quality question on "
                         "genuinely trained weights)")
    ap.add_argument("--images_dir", type=str, default=None,
                    help="real test images for the quality eval inputs + "
                         "PTQ calibration (e.g. the synthetic testB split)")
    ap.add_argument("--skip_quality", action="store_true")
    args = ap.parse_args()
    enable_compilation_cache()

    if args.model:
        from multi_style_transfer_gan_tpu.weights import (
            enhanced_generator_from_sd, extract_state_dict, load_pth,
        )

        params = enhanced_generator_from_sd(
            extract_state_dict(load_pth(args.model)))
        print(f"loaded trained checkpoint {args.model}", flush=True)
    elif args.train_steps:
        print(f"training {args.train_steps} steps on the synthetic "
              "two-domain task...", flush=True)
        params = trained_params(args.train_steps)
    else:
        params = enhanced_generator_init(jax.random.PRNGKey(0), channels=16,
                                         num_transformer_blocks=1)
    if args.skip_quality:
        rng = np.random.default_rng(1)
        calib = jnp.asarray(rng.uniform(-1, 1, (2, 256, 256, 3)),
                            jnp.float32)
        qp = prepare_int8_model(params, [calib])
    else:
        qp = quality(params, images_dir=args.images_dir)
    throughput(params, qp, args.batch, args.size)


if __name__ == "__main__":
    main()
