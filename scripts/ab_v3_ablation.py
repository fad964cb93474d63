"""Ablate the v3 attention kernel to locate its true cost center.

Round 3 measured bf16-vs-fp32 MXU operands a WASH (1.00x at 512^2 C=16 —
scripts/ab_mxu_dtype.py), falsifying the "fp32 passes bind" hypothesis.
This harness times progressively larger prefixes of the v3 kernel body at
the up2 stage shape to find where the ~70 ms actually goes:

  copy    : relayout + launch + one read/write of x     (HBM floor)
  qkv     : + the dense block-diagonal qkv matmul
  norm    : + both zero-safe L2 normalizes
  logits  : + the P-unrolled rep/tile FMA loop           (32 matmuls)
  softmax : + exp, den matmul, divide
  full    : + the P-unrolled apply/proj loop             (32 matmuls)

Each variant still writes a result derived from everything it computed
(sums folded into the output) so Mosaic cannot DCE the stages.

Run on the REAL CHIP:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_v3_ablation.py
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

from multi_style_transfer_gan_tpu.ops.pallas.window_attention_v3 import (  # noqa: E402
    _expand_weights,
)


def _kernel(x_ref, wqkv_ref, bqkv_ref, bproj_ref,
            mpos_ref, mpos_t_ref, brep_ref, btile_ref, msum_ref,
            msumproj_ref, o_ref, *, P: int, C: int, eps: float, stage: str):
    x = x_ref[:]
    if stage == "copy":
        o_ref[:] = x
        return
    qkv = jnp.dot(x, wqkv_ref[:].astype(x.dtype),
                  preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[:]
    PC = P * C
    q = qkv[:, :PC]
    k = qkv[:, PC:2 * PC]
    v = qkv[:, 2 * PC:]
    if stage == "qkv":
        o_ref[:] = (q + k + v).astype(o_ref.dtype)
        return

    def _norm(u):
        ss = jnp.dot(u * u, mpos_ref[:], preferred_element_type=jnp.float32)
        inv = jnp.where(ss == 0, 0.0,
                        1.0 / jnp.maximum(jnp.sqrt(jnp.where(ss == 0, 1.0,
                                                             ss)), eps))
        return u * jnp.dot(inv, mpos_t_ref[:],
                           preferred_element_type=jnp.float32)

    qn = _norm(q)
    kn = _norm(k)
    if stage == "norm":
        o_ref[:] = (qn + kn + v).astype(o_ref.dtype)
        return

    def _rep(u):
        return jnp.dot(u, brep_ref[:], preferred_element_type=jnp.float32)

    def _tile(u):
        return jnp.dot(u, btile_ref[:], preferred_element_type=jnp.float32)

    logits = _rep(qn[:, :C]) * _tile(kn[:, :C])
    for p in range(1, P):
        logits += _rep(qn[:, p * C:(p + 1) * C]) * _tile(kn[:, p * C:
                                                            (p + 1) * C])
    if stage == "logits":
        # fold the (T, C*C) logits back to (T, C) then broadcast to P*C lanes
        red = jnp.dot(logits, msum_ref[:], preferred_element_type=jnp.float32)
        o_ref[:] = (v + jnp.dot(red, mpos_t_ref[:C],
                                preferred_element_type=jnp.float32)
                    ).astype(o_ref.dtype)
        return
    e = jnp.exp(logits)
    den = jnp.dot(e, msum_ref[:], preferred_element_type=jnp.float32)
    attn = e * _rep(1.0 / den)
    if stage == "softmax":
        red = jnp.dot(attn, msum_ref[:], preferred_element_type=jnp.float32)
        o_ref[:] = (v + jnp.dot(red, mpos_t_ref[:C],
                                preferred_element_type=jnp.float32)
                    ).astype(o_ref.dtype)
        return
    outs = []
    for p in range(P):
        o_p = jnp.dot(attn * _tile(v[:, p * C:(p + 1) * C]), msumproj_ref[:],
                      preferred_element_type=jnp.float32)
        outs.append((o_p + bproj_ref[p * C:(p + 1) * C]).astype(o_ref.dtype))
    o_ref[:] = jnp.concatenate(outs, axis=-1)


def run_stage(x, wqkv, bqkv, wproj, bproj, *, stage, ws=4, eps=1e-12,
              tile_rows=512):
    B, H, W, C = x.shape
    P = ws * ws
    nh, nw = H // ws, W // ws
    R = B * nh * nw
    t = x.reshape(B, nh, ws, nw, ws, C).transpose(0, 1, 3, 2, 4, 5)
    t = t.reshape(R, P * C)
    expanded = _expand_weights(wqkv.reshape(C, 3 * C), bqkv,
                               wproj.reshape(C, C), bproj, P, C)
    T = tile_rows
    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_kernel, P=P, C=C, eps=eps, stage=stage),
        grid=(R // T,),
        in_specs=[pl.BlockSpec((T, P * C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] + [
            const(a.shape) for a in expanded],
        out_specs=pl.BlockSpec((T, P * C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, P * C), t.dtype),
    )(t, *expanded)
    out = out.reshape(B, nh, nw, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(B, H, W, C)


STAGES = ["copy", "qkv", "norm", "logits", "softmax", "full"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--c", type=int, default=16)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    from multi_style_transfer_gan_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    B, HW, C = args.batch, args.hw, args.c
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, HW, HW, C)) * 0.5, jnp.bfloat16)
    wqkv = jnp.asarray(rng.standard_normal((1, 1, C, 3 * C)) * 0.1,
                       jnp.bfloat16)
    bqkv = jnp.asarray(rng.standard_normal((3 * C,)) * 0.1, jnp.bfloat16)
    wproj = jnp.asarray(rng.standard_normal((1, 1, C, C)) * 0.1, jnp.bfloat16)
    bproj = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.bfloat16)

    fns = {}
    for st in STAGES:
        f = jax.jit(partial(run_stage, stage=st))
        try:
            _ = np.asarray(f(x, wqkv, bqkv, wproj, bproj)[0, :1, :1])
            fns[st] = f
        except Exception as e:
            print(f"{st}: compile failed {str(e)[:90]}", flush=True)

    ms = {st: 1e9 for st in fns}
    for _ in range(args.rounds):
        for st, f in fns.items():
            t0 = time.perf_counter()
            o = None
            for _ in range(args.iters):
                o = f(x, wqkv, bqkv, wproj, bproj)
            _ = np.asarray(o[0, :1, :1])
            ms[st] = min(ms[st], (time.perf_counter() - t0) / args.iters * 1e3)

    prev = 0.0
    print(f"# v3 ablation at {B}x{HW}^2 C={C} bf16 (cumulative prefixes):")
    for st in STAGES:
        if st not in ms:
            continue
        print(f"  {st:8s} {ms[st]:7.1f} ms   (delta {ms[st] - prev:+7.1f})",
              flush=True)
        prev = ms[st]


if __name__ == "__main__":
    main()
