"""v6 windowed channel attention: v3's math read DIRECTLY from NHWC.

The round-3 v3 ablation (scripts/ab_v3_ablation.py, real chip, 96x512^2
C=16 bf16) located the cost: copy floor 31.0 ms (the two XLA window-major
relayouts — the 1.6 GB of kernel I/O itself is ~2 ms at HBM peak), logits
loop +17.4, apply loop +15.4, qkv/norm/softmax ~+6. The relayout is the
single biggest piece and the kernel math never actually needs the packed
(T, P*C) rows: every v3 stage consumes PER-POSITION (T, C) slices.

v6 therefore reads the (B*nh, ws, W, C) view of plain NHWC (a free
major-dim reshape, no transpose anywhere) and builds the 16 per-position
slices in-kernel with lane-preserving ops only:

    (TR, ws, W, C) -> reshape (TR, ws, nw, ws, C)   [leading-dim unfold]
    x_p = [:, pi, :, pj, :]                          [static slices]

then runs the v3 body per position (qkv matmul, zero-safe norm, rep/tile
logits FMA, softmax, apply/proj), and re-interleaves the 16 outputs with a
stack + leading-dim transpose + fold. No HBM transpose in or out.

This script is the EXPERIMENT: numerics in interpret mode on CPU, then a
same-run chip A/B vs the dispatched v3 at the C=16 stage shapes. If it
wins it graduates into ops/pallas/.

  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_v6_attention.py \
      [--interpret]
"""

import argparse
import os
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _kernel(x_ref, wqkv_ref, bqkv_ref, brep_ref, btile_ref, msum_ref,
            msumproj_ref, bproj_ref, o_ref,
            *, TR: int, ws: int, nw: int, C: int, eps: float):
    P = ws * ws
    M = TR * nw
    x5 = x_ref[:].reshape(TR, ws, nw, ws, C)

    def _norm(u):  # zero-safe unit L2 over the C lanes
        ss = jnp.sum(jnp.square(u), axis=-1, keepdims=True)
        zero = ss == 0
        n = jnp.sqrt(jnp.where(zero, 1.0, ss))
        n = jnp.where(zero, 0.0, n)
        return u / jnp.maximum(n, eps)

    def _rep(u):
        return jnp.dot(u, brep_ref[:], preferred_element_type=jnp.float32)

    def _tile(u):
        return jnp.dot(u, btile_ref[:], preferred_element_type=jnp.float32)

    qns, kns, vs = [], [], []
    for p in range(P):
        pi, pj = p // ws, p % ws
        x_p = x5[:, pi, :, pj, :].reshape(M, C)
        qkv_p = jnp.dot(x_p, wqkv_ref[:].astype(x_p.dtype),
                        preferred_element_type=jnp.float32) + bqkv_ref[:]
        qns.append(_norm(qkv_p[:, :C]))
        kns.append(_norm(qkv_p[:, C:2 * C]))
        vs.append(qkv_p[:, 2 * C:])

    logits = _rep(qns[0]) * _tile(kns[0])
    for p in range(1, P):
        logits += _rep(qns[p]) * _tile(kns[p])
    e = jnp.exp(logits)                                       # (M, C*C)
    den = jnp.dot(e, msum_ref[:], preferred_element_type=jnp.float32)
    attn = e * _rep(1.0 / den)

    outs = []
    for p in range(P):
        o_p = jnp.dot(attn * _tile(vs[p]), msumproj_ref[:],
                      preferred_element_type=jnp.float32)     # (M, C)
        outs.append((o_p + bproj_ref[:]).astype(o_ref.dtype))
    # re-interleave: (P, TR, nw, C) -> (TR, ws, nw, ws, C) -> (TR, ws, W, C)
    o = jnp.stack(outs, axis=0).reshape(ws, ws, TR, nw, C)
    o = o.transpose(2, 0, 3, 1, 4).reshape(TR, ws, nw * ws, C)
    o_ref[:] = o


def window_attention_v6(x, wqkv, bqkv, wproj, bproj, *, window_size: int = 4,
                        tile_rows: int | None = None, eps: float = 1e-12,
                        interpret: bool = False):
    B, H, W, C = x.shape
    ws = window_size
    nh, nw = H // ws, W // ws
    wqkv2 = wqkv.reshape(wqkv.shape[-2], wqkv.shape[-1]).astype(jnp.float32)
    wproj2 = wproj.reshape(wproj.shape[-2], wproj.shape[-1]).astype(jnp.float32)
    brep = jnp.repeat(jnp.eye(C, dtype=jnp.float32), C, axis=1)  # (C, C*C)
    btile = jnp.tile(jnp.eye(C, dtype=jnp.float32), (1, C))      # (C, C*C)
    msum = jnp.repeat(jnp.eye(C, dtype=jnp.float32), C, axis=0)  # (C*C, C)
    msumproj = jnp.dot(msum, wproj2)                             # (C*C, C)
    bq = bqkv.astype(jnp.float32)
    bp = bproj.astype(jnp.float32)

    xr = x.reshape(B * nh, ws, W, C)  # major-dim split: no data movement
    R = B * nh
    TR = tile_rows or 4
    TR = min(TR, R)
    while R % TR:
        TR -= 1

    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_kernel, TR=TR, ws=ws, nw=nw, C=C, eps=eps),
        grid=(R // TR,),
        in_specs=[
            pl.BlockSpec((TR, ws, W, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            const(wqkv2.shape), const(bq.shape), const(brep.shape),
            const(btile.shape), const(msum.shape), const(msumproj.shape),
            const(bp.shape),
        ],
        out_specs=pl.BlockSpec((TR, ws, W, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, ws, W, C), x.dtype),
        interpret=interpret,
    )(xr, wqkv2, bq, brep, btile, msum, msumproj, bp)
    return out.reshape(B, H, W, C)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--tile_rows", type=int, default=None)
    args = ap.parse_args()

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")

    from multi_style_transfer_gan_tpu.models.enhanced_generator import (
        _attention_math,
    )

    rng = np.random.default_rng(0)

    if args.interpret:
        for HW, C in ((64, 16), (32, 8)):
            x = jnp.asarray(rng.standard_normal((2, HW, HW, C)) * 0.5,
                            jnp.float32)
            wqkv = jnp.asarray(rng.standard_normal((1, 1, C, 3 * C)) * 0.1)
            bqkv = jnp.asarray(rng.standard_normal((3 * C,)) * 0.1)
            wproj = jnp.asarray(rng.standard_normal((1, 1, C, C)) * 0.1)
            bproj = jnp.asarray(rng.standard_normal((C,)) * 0.1)
            ref = _attention_math(x, wqkv, bqkv, wproj, bproj,
                                  window_size=4, eps=1e-12)
            got = window_attention_v6(x, wqkv, bqkv, wproj, bproj,
                                      interpret=True)
            print(f"{HW}^2 C={C}: v6-vs-math max|d| = "
                  f"{float(jnp.max(jnp.abs(ref - got))):.2e}")
        return

    from multi_style_transfer_gan_tpu.utils import enable_compilation_cache
    from multi_style_transfer_gan_tpu.ops.pallas.window_attention_v3 import (
        window_attention_v3,
    )
    enable_compilation_cache()

    B = args.batch
    for HW, C in ((512, 16), (256, 16)):
        x = jnp.asarray(rng.standard_normal((B, HW, HW, C)) * 0.5,
                        jnp.bfloat16)
        wqkv = jnp.asarray(rng.standard_normal((1, 1, C, 3 * C)) * 0.1,
                           jnp.bfloat16)
        bqkv = jnp.asarray(rng.standard_normal((3 * C,)) * 0.1, jnp.bfloat16)
        wproj = jnp.asarray(rng.standard_normal((1, 1, C, C)) * 0.1,
                            jnp.bfloat16)
        bproj = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.bfloat16)
        fa = (x, wqkv, bqkv, wproj, bproj)

        v3 = jax.jit(lambda *a: window_attention_v3(*a, window_size=4,
                                                    eps=1e-12))
        v6 = jax.jit(lambda *a: window_attention_v6(
            *a, window_size=4, eps=1e-12, tile_rows=args.tile_rows))

        try:
            o3 = v3(*fa)
            o6 = v6(*fa)
            d = float(jnp.max(jnp.abs(
                o3[:2].astype(jnp.float32) - o6[:2].astype(jnp.float32))))
            print(f"{HW}^2 C={C} x{B}: v6-vs-v3 max|d| = {d:.2e}", flush=True)
            _ = np.asarray(o3[0, :1, :1]), np.asarray(o6[0, :1, :1])
        except Exception as e:
            print(f"{HW}^2 C={C}: FAILED {str(e)[:200]}", flush=True)
            continue

        def run_once(f):
            t0 = time.perf_counter()
            o = None
            for _ in range(args.iters):
                o = f(*fa)
            _ = np.asarray(o[0, :1, :1, :1])
            return (time.perf_counter() - t0) / args.iters * 1e3

        t3 = t6 = 1e9
        for _ in range(args.rounds):
            t3 = min(t3, run_once(v3))
            t6 = min(t6, run_once(v6))
        print(f"{HW}^2 C={C} x{B}: v3 {t3:.1f} ms  v6 {t6:.1f} ms  "
              f"({t3 / t6:.2f}x)", flush=True)
        for a in fa:
            a.delete()


if __name__ == "__main__":
    main()
