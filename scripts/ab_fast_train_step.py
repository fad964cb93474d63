"""A/B: CycleGAN train-step time, fused-kernel fwd (fast_attention) vs XLA.

Run on the real chip. The chip is time-shared: interleave the two
candidates round-robin and take per-candidate min over rounds (see
docs/PERFORMANCE.md measurement rules).

Usage: PYTHONPATH=/root/repo python scripts/ab_fast_train_step.py [--batch 8]
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
    p.add_argument("--remat", action="store_true",
                   help="remat generator stages (CLI default is off now; "
                        "fast-vs-xla was originally measured remat-on)")
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

    def make(fast):
        return jax.jit(functools.partial(
            cyclegan_train_step, g_tx=g_tx, d_tx=d_tx,
            compute_dtype=jnp.bfloat16, remat=args.remat,
            fast_attention=fast))

    cands = {"xla": make(False), "fast": make(True)}
    best = {k: float("inf") for k in cands}

    for name, fn in cands.items():
        t0 = time.time()
        s2, losses = fn(state, ra, rb)
        _ = {k: float(v) for k, v in losses.items()}
        print(f"{name}: compile+first {time.time() - t0:.1f}s")

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
            print(f"round {r} {name}: {dt:.1f} ms/step")

    print("\n== best ms/step ==")
    for name, dt in best.items():
        print(f"{name}: {dt:.1f} ms  ({B / dt * 1e3:.1f} img-pairs/s)")
    print(f"fast/xla speedup: {best['xla'] / best['fast']:.2f}x")


if __name__ == "__main__":
    main()
