"""A/B: CycleGAN train-step time, remat=True vs remat=False.

remat trades recompute for HBM (the reference enables torch gradient
checkpointing unconditionally, enhanced_train.py:24-25). On a chip with
headroom at the reference batch sizes the recompute may be pure cost —
measure instead of assume.

Run on the real chip; candidates interleave round-robin, min over rounds
(docs/PERFORMANCE.md measurement rules).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_remat_train_step.py [--batch 8]
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--rounds", type=int, default=5)
    p.add_argument("--steps", type=int, default=4)
    args = p.parse_args()

    from multi_style_transfer_gan_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from multi_style_transfer_gan_tpu.train.cyclegan import (
        cyclegan_init_state, cyclegan_train_step, make_optimizers,
    )

    key = jax.random.PRNGKey(0)
    state = cyclegan_init_state(key, channels=16, num_transformer_blocks=1)
    g_tx, d_tx = make_optimizers()
    B, S = args.batch, args.size
    ka, kb = jax.random.split(jax.random.PRNGKey(1))
    ra = jax.random.uniform(ka, (B, S, S, 3), minval=-1.0, maxval=1.0)
    rb = jax.random.uniform(kb, (B, S, S, 3), minval=-1.0, maxval=1.0)

    def make(remat):
        return jax.jit(functools.partial(
            cyclegan_train_step, g_tx=g_tx, d_tx=d_tx,
            compute_dtype=jnp.bfloat16, remat=remat, fast_attention=False))

    cands = {"remat": make(True), "no_remat": make(False)}
    best = {k: float("inf") for k in cands}

    for name, fn in cands.items():
        t0 = time.time()
        try:
            s2, losses = fn(state, ra, rb)
            _ = {k: float(v) for k, v in losses.items()}
            print(f"{name}: compile+first {time.time() - t0:.1f}s")
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:120]}")
            del cands[name]

    for r in range(args.rounds):
        for name, fn in cands.items():
            s = state
            s, losses = fn(s, ra, rb)
            _ = float(losses["g_loss"])  # drain dispatch before the clock
            t0 = time.time()
            for _ in range(args.steps):
                s, losses = fn(s, ra, rb)
            _ = float(losses["g_loss"])  # host fetch = the only real sync
            dt = (time.time() - t0) / args.steps * 1e3
            best[name] = min(best[name], dt)
            print(f"round {r} {name}: {dt:.1f} ms/step", flush=True)

    print("\n== best ms/step ==")
    for name, dt in best.items():
        print(f"{name}: {dt:.1f} ms  ({B / dt * 1e3:.1f} img-pairs/s)")


if __name__ == "__main__":
    main()
