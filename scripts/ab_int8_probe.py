"""Probe: do int8 convolutions/dots pay on this chip via XLA?

The pipeline is HBM-bound at ~45% of peak with bf16 activations; int8
halves the bytes of every tensor and doubles the MXU's peak
(v5e: 394 TOPS int8 vs 197 TFLOP/s bf16). Before building a quantized
serving engine, measure XLA's int8 lowering at the deployed conv shapes:

  stem   7x7x3->16 at 512^2     (lane-sparse, 24.5 ms in the pipeline)
  down1  4x4 s2 32ch at 512^2
  branch 3x3 d2 32->8 at 256^2  (the MSB wall, 17.6 ms per block)
  fusion 1x1 32->32 at 256^2
  convT-equiv dense 3x3 32->64 at 256^2

For each: bf16 conv vs int8xint8->int32 conv (preferred_element_type),
same-run interleaved min-over-rounds. Also an attention-shaped einsum.

Run on the REAL CHIP:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_int8_probe.py
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multi_style_transfer_gan_tpu.utils import enable_compilation_cache

B = 96
ROUNDS, ITERS = 5, 3

CASES = [
    # name, (H, W, Cin, Cout, k, stride, dilation)  (lhsdil in name = convT)
    ("stem7x7", (512, 512, 3, 16, 7, 1, 1)),
    ("down4x4s2", (512, 512, 16, 32, 4, 2, 1)),
    ("branch3x3d2", (256, 256, 32, 8, 3, 1, 2)),
    ("fusion1x1", (256, 256, 32, 32, 1, 1, 1)),
    ("mid3x3", (256, 256, 32, 64, 3, 1, 1)),
    ("convT4x4lhsdil", (256, 256, 32, 16, 4, 1, 1)),
]


def conv(x, w, stride, dilation, acc_dtype, lhs_dil=False):
    # int8 conv returns the accumulator CAST TO bf16 in the epilogue so
    # both variants write the same output bytes (the engine does the same:
    # IN eats the scale, stats run on the bf16'd accumulator).
    if lhs_dil:  # ConvTranspose2d(k=4, s=2, p=1) as XLA lowers it
        out = lax.conv_general_dilated(
            x, w, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc_dtype)
    else:
        pad = ((w.shape[0] - 1) * dilation) // 2
        out = lax.conv_general_dilated(
            x, w, (stride, stride), ((pad, pad), (pad, pad)),
            rhs_dilation=(dilation, dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc_dtype)
    return out.astype(jnp.bfloat16)


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    for name, (H, W, ci, co, k, s, d) in CASES:
        x8 = jnp.asarray(rng.integers(-127, 128, (B, H, W, ci)), jnp.int8)
        w8 = jnp.asarray(rng.integers(-127, 128, (k, k, ci, co)), jnp.int8)
        xb = x8.astype(jnp.bfloat16)
        wb = w8.astype(jnp.bfloat16)

        lhs_dil = "lhsdil" in name
        fns = {}
        try:
            f = jax.jit(lambda a, b: conv(a, b, s, d, jnp.int32, lhs_dil))
            _ = np.asarray(f(x8, w8).ravel()[0])
            fns["int8"] = (f, x8, w8)
        except Exception as e:
            print(f"{name} int8 failed: {str(e)[:100]}")
        try:
            f = jax.jit(lambda a, b: conv(a, b, s, d, jnp.float32, lhs_dil))
            _ = np.asarray(f(xb, wb).ravel()[0])
            fns["bf16"] = (f, xb, wb)
        except Exception as e:
            print(f"{name} bf16 failed: {str(e)[:100]}")

        times = {n: float("inf") for n in fns}
        for _ in range(ROUNDS):
            for key, (f, a, b) in fns.items():
                out = None
                for _ in range(ITERS):
                    out = f(a, b)
                _ = np.asarray(out.ravel()[0])
                t0 = time.perf_counter()
                for _ in range(ITERS):
                    out = f(a, b)
                _ = np.asarray(out.ravel()[0])
                times[key] = min(times[key],
                                 (time.perf_counter() - t0) / ITERS)
        msg = f"{name:12s}"
        for key in ("bf16", "int8"):
            if key in times and times[key] < float("inf"):
                msg += f"  {key} {times[key] * 1e3:7.2f} ms"
        if all(k in fns for k in ("bf16", "int8")):
            msg += f"  int8 speedup {times['bf16'] / times['int8']:.2f}x"
        print(msg, flush=True)

    # attention-shaped einsum: (Bw, C, P) x (Bw, P, C) gram at C=32
    bw, p, c = B * 64 * 64, 16, 32
    q8 = jnp.asarray(rng.integers(-127, 128, (bw, p, c)), jnp.int8)
    qb = q8.astype(jnp.bfloat16)
    fns = {}
    try:
        f = jax.jit(lambda a: jnp.einsum(
            "btc,btd->bcd", a, a, preferred_element_type=jnp.int32))
        _ = np.asarray(f(q8).ravel()[0])
        fns["int8"] = (f, q8)
    except Exception as e:
        print(f"gram int8 failed: {str(e)[:100]}")
    f = jax.jit(lambda a: jnp.einsum(
        "btc,btd->bcd", a, a, preferred_element_type=jnp.float32))
    _ = np.asarray(f(qb).ravel()[0])
    fns["bf16"] = (f, qb)
    times = {n: float("inf") for n in fns}
    for _ in range(ROUNDS):
        for key, (f, a) in fns.items():
            out = None
            for _ in range(ITERS):
                out = f(a)
            _ = np.asarray(out.ravel()[0])
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = f(a)
            _ = np.asarray(out.ravel()[0])
            times[key] = min(times[key], (time.perf_counter() - t0) / ITERS)
    msg = "gram_c32    "
    for key in ("bf16", "int8"):
        if times.get(key, float("inf")) < float("inf"):
            msg += f"  {key} {times[key] * 1e3:7.2f} ms"
    if len(times) == 2:
        msg += f"  int8 speedup {times['bf16'] / times['int8']:.2f}x"
    print(msg, flush=True)


if __name__ == "__main__":
    main()
