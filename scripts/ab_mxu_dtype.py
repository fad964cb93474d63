"""A/B: bf16 vs fp32 internal MXU passes in the attention kernels.

Round-3 hypothesis: the gram/apply/proj (and v3's ~60 rep/tile) matmuls
ran with fp32 OPERANDS even on the bf16 production pipeline — an fp32 MXU
pass costs several bf16 ones, so casting operands to bf16 (fp32
accumulation via preferred_element_type, fp32 normalize/softmax) should
cut the attention kernels' dominant cost. Numerics: on bf16 inputs the
divergence vs the fp32 math path is unchanged (1.2e-3 vs 1.1e-3 at C=16,
interpret-mode check /tmp-level; fp32 inputs are bit-unchanged).

Run on the REAL CHIP. Same-script interleaved A/B, min over rounds.

  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_mxu_dtype.py
"""

import argparse
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    from multi_style_transfer_gan_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from multi_style_transfer_gan_tpu.ops.pallas.window_attention import (
        fused_window_channel_attention as v1,
    )
    from multi_style_transfer_gan_tpu.ops.pallas.window_attention_grouped \
        import grouped_window_channel_attention as grp
    from multi_style_transfer_gan_tpu.ops.pallas.window_attention_v3 import (
        window_attention_v3 as v3,
    )

    B = args.batch
    # (HW, C, kernel name, fn) — the deployed stage shapes per kernel
    cases = [
        (512, 16, "v3", v3),       # up2 @ 512^2 canvas (the 100 ms stage)
        (512, 16, "grouped", grp),
        (256, 32, "grouped", grp),  # down1/up1 @ 512^2 canvas
        (256, 16, "v3", v3),       # up2 @ 256^2 canvas
        (128, 64, "v1", v1),       # down2 @ 512^2 canvas
        (128, 32, "grouped", grp),  # down1/up1 @ 256^2 canvas
    ]
    rng = np.random.default_rng(0)

    for HW, C, name, fn in cases:
        x = jnp.asarray(rng.standard_normal((B, HW, HW, C)) * 0.5,
                        jnp.bfloat16)
        wqkv = jnp.asarray(rng.standard_normal((1, 1, C, 3 * C)) * 0.1,
                           jnp.bfloat16)
        bqkv = jnp.asarray(rng.standard_normal((3 * C,)) * 0.1, jnp.bfloat16)
        wproj = jnp.asarray(rng.standard_normal((1, 1, C, C)) * 0.1,
                            jnp.bfloat16)
        bproj = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.bfloat16)
        fa = (x, wqkv, bqkv, wproj, bproj)

        new = jax.jit(lambda *a: fn(*a, window_size=4, eps=1e-12))
        old = jax.jit(lambda *a: fn(*a, window_size=4, eps=1e-12,
                                    internal_dtype=jnp.float32))

        def run_once(f):
            t0 = time.perf_counter()
            o = None
            for _ in range(args.iters):
                o = f(*fa)
            _ = np.asarray(o[0, :1, :1])  # slice ON DEVICE, tiny fetch
            return (time.perf_counter() - t0) / args.iters * 1e3

        try:
            _ = np.asarray(old(*fa)[0, :1, :1])
            _ = np.asarray(new(*fa)[0, :1, :1])
        except Exception as e:
            print(f"{HW}^2 C={C} {name}: compile failed: {str(e)[:100]}",
                  flush=True)
            continue
        t_old = t_new = 1e9
        for _ in range(args.rounds):
            t_old = min(t_old, run_once(old))
            t_new = min(t_new, run_once(new))
        print(f"{HW}^2 C={C} x{B} {name}: fp32-mxu {t_old:.1f} ms  "
              f"bf16-mxu {t_new:.1f} ms  ({t_old / t_new:.2f}x)", flush=True)
        for a in fa:
            a.delete()


if __name__ == "__main__":
    main()
