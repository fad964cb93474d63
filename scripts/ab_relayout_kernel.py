"""Round-4 producer-side swing: Pallas block-copy relayout vs XLA transpose.

The round-3 v3 ablation pinned 31 ms of the 70 ms 512^2 C=16 attention
stage on the two XLA 6D transposes (19% HBM efficiency) and closed the
consumer side (v6: in-kernel per-position 16-lane assembly = 0.51x).
This A/B measures the remaining formulation (ops/pallas/window_relayout):
the relayout as ALIGNED BLOCK COPIES — free reshapes put one window row's
ws*C lanes contiguous, so s2d is 16 (nw, ws*C) block copies with no
in-register transpose — plus the fully-fused variant where both copies
happen in-VMEM inside the v3 kernel (stage HBM traffic = 1 read + 1
write of x).

Variants (same-run, interleaved, min over rounds — docs/PERFORMANCE.md
measurement rules), each a full attention stage NHWC -> NHWC:
  xla    : current default — XLA transposes around the v3 kernel
  pallas : s2d_rows / d2s_rows Pallas relayouts around the same kernel
  fused  : window_attention_v3_fused_io (no HBM relayout round-trip)

  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_relayout_kernel.py \
      [--size 512] [--batch 96] [--rounds 5] [--iters 3] [--dtype bf16]
"""

import argparse
import time

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--dtype", choices=["bf16", "fp32"], default="bf16")
    ap.add_argument("--variants", type=str, default="xla,pallas,fused")
    args = ap.parse_args()

    from multi_style_transfer_gan_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from multi_style_transfer_gan_tpu.models.enhanced_generator import (
        local_attention_init,
    )
    from multi_style_transfer_gan_tpu.ops.pallas.window_attention_v3 import (
        _run_packed_rows, window_attention_v3,
    )
    from multi_style_transfer_gan_tpu.ops.pallas.window_relayout import (
        d2s_rows, s2d_rows, window_attention_v3_fused_io,
    )

    C = 16
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    params = local_attention_init(jax.random.PRNGKey(0), C)
    w = {k: v.astype(dt) for k, v in params.items()}
    shape = (args.batch, args.size, args.size, C)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(shape), dt)

    def stage_xla(x):
        return window_attention_v3(x, w["qkv.weight"], w["qkv.bias"],
                                   w["proj.weight"], w["proj.bias"])

    def stage_pallas(x):
        rows = s2d_rows(x)
        out = _run_packed_rows(rows, w["qkv.weight"].reshape(C, 3 * C),
                               w["qkv.bias"], w["proj.weight"].reshape(C, C),
                               w["proj.bias"], P=16, C=C, tile_rows=None,
                               eps=1e-12, interpret=False)
        return d2s_rows(out, shape)

    def stage_fused(x):
        return window_attention_v3_fused_io(
            x, w["qkv.weight"], w["qkv.bias"], w["proj.weight"],
            w["proj.bias"])

    # relayout-only microbench too: s2d+d2s round-trip vs XLA transpose pair
    def relayout_xla(x):
        B, H, W, _ = x.shape
        nh = nw = H // 4
        t = x.reshape(B, nh, 4, nw, 4, C).transpose(0, 1, 3, 2, 4, 5)
        t = t.reshape(B * nh * nw, 256) * 1.000001  # defeat transpose-cancel
        back = t.reshape(B, nh, nw, 4, 4, C).transpose(0, 1, 3, 2, 4, 5)
        return back.reshape(B, H, W, C)

    def relayout_pallas(x):
        rows = s2d_rows(x) * 1.000001
        return d2s_rows(rows, shape)

    all_fns = {"xla": stage_xla, "pallas": stage_pallas, "fused": stage_fused,
               "rt_xla": relayout_xla, "rt_pallas": relayout_pallas}
    names = args.variants.split(",") + ["rt_xla", "rt_pallas"]
    fns = {}
    ref = None
    for name in names:
        try:
            f = jax.jit(all_fns[name])
            t0 = time.perf_counter()
            out = np.asarray(f(x)[0, :1, :1])
            print(f"# compiled {name} in {time.perf_counter() - t0:.0f}s",
                  flush=True)
            fns[name] = f
            if name in ("xla", "pallas", "fused"):
                full = np.asarray(f(x), np.float32)
                if ref is None:
                    ref = full
                else:
                    d = np.abs(full - ref)
                    print(f"# {name} vs xla: max {d.max():.2e} "
                          f"mean {d.mean():.2e}", flush=True)
        except Exception as e:
            print(f"# {name} failed: {str(e)[:200]}", flush=True)

    best = {k: 1e9 for k in fns}
    for _ in range(args.rounds):
        for k, f in fns.items():
            t0 = time.perf_counter()
            o = None
            for _ in range(args.iters):
                o = f(x)
            _ = np.asarray(o[0, :1, :1])
            ms = (time.perf_counter() - t0) / args.iters * 1e3
            best[k] = min(best[k], ms)
    base = best.get("xla", 1e9)
    for k, v in best.items():
        print(f"{args.size}^2 C16 x{args.batch} {k}: {v:.1f} ms "
              f"({base / v:.2f}x vs xla-stage)", flush=True)


if __name__ == "__main__":
    main()
