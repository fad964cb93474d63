"""XLA flag sweep: flagship inference pipeline + CycleGAN train step.

XLA_FLAGS is process-level, so the parent spawns one CHILD per variant
(same script, --child) and collects its one-line result. Variants worth
testing on v5e (round-3 candidates for VERDICT item 3's conv/IN backward
residual):

  base      : no extra flags (what every number so far was measured with)
  vmem64    : --xla_tpu_scoped_vmem_limit_kib=65536  (bigger fusions)
  vmem128   : --xla_tpu_scoped_vmem_limit_kib=131072
  no_lhs    : --xla_tpu_enable_latency_hiding_scheduler=false
  flash     : --xla_tpu_enable_flash_attention=false (rules out a
              mis-kicked pattern match on our attention einsums)

Each child interleaves nothing (one variant per process by construction);
cross-variant comparability relies on the min-over-rounds discipline and
the variants being re-runnable: treat small deltas (<5%) as noise, rerun
winners head-to-head before believing them.

  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_xla_flags.py \
      [--what inference|train|both]
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    "base": "",
    "vmem64": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem128": "--xla_tpu_scoped_vmem_limit_kib=131072",
    "no_lhs": "--xla_tpu_enable_latency_hiding_scheduler=false",
}


def child_inference(rounds=4, iters=4):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from multi_style_transfer_gan_tpu.models import (
        enhanced_generator_apply, enhanced_generator_init,
    )
    from multi_style_transfer_gan_tpu.ops import (
        to_model_range, from_model_range,
    )

    params = enhanced_generator_init(jax.random.PRNGKey(0), channels=16,
                                     num_transformer_blocks=1)

    @jax.jit
    def pipeline(params, imgs_u8):
        x = to_model_range(imgs_u8).astype(jnp.bfloat16)
        y = enhanced_generator_apply(params, x, fast_attention=True)
        return (from_model_range(y.astype(jnp.float32)) * 255.0
                ).astype(jnp.uint8)

    rng = np.random.default_rng(0)
    batch = jax.device_put(rng.integers(0, 256, (96, 512, 512, 3),
                                        dtype=np.uint8))
    _ = np.asarray(pipeline(params, batch)[0, :1, :1])
    best = float("inf")
    for _ in range(rounds):
        o = None
        for _ in range(iters):
            o = pipeline(params, batch)
        _ = np.asarray(o[0, :1, :1])  # drain
        t0 = time.perf_counter()
        for _ in range(iters):
            o = pipeline(params, batch)
        _ = np.asarray(o[0, :1, :1])
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return {"ms": round(best, 1), "img_s": round(96 / best * 1e3, 1)}


def child_train(rounds=4, steps=3):
    import functools
    import jax
    import jax.numpy as jnp

    from multi_style_transfer_gan_tpu.train.cyclegan import (
        cyclegan_init_state, cyclegan_train_step, make_optimizers,
    )

    state = cyclegan_init_state(jax.random.PRNGKey(0), channels=16,
                                num_transformer_blocks=1)
    g_tx, d_tx = make_optimizers()
    ka, kb = jax.random.split(jax.random.PRNGKey(1))
    ra = jax.random.uniform(ka, (8, 256, 256, 3), minval=-1.0, maxval=1.0)
    rb = jax.random.uniform(kb, (8, 256, 256, 3), minval=-1.0, maxval=1.0)
    step = jax.jit(functools.partial(
        cyclegan_train_step, g_tx=g_tx, d_tx=d_tx,
        compute_dtype=jnp.bfloat16, remat=False, fast_attention=True))

    s, losses = step(state, ra, rb)
    _ = float(losses["g_loss"])
    best = float("inf")
    for _ in range(rounds):
        s = state
        s, losses = step(s, ra, rb)
        _ = float(losses["g_loss"])  # drain
        t0 = time.perf_counter()
        for _ in range(steps):
            s, losses = step(s, ra, rb)
        _ = float(losses["g_loss"])
        best = min(best, (time.perf_counter() - t0) / steps * 1e3)
    return {"ms_step": round(best, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", choices=["inference", "train", "both"],
                    default="both")
    ap.add_argument("--child", choices=["inference", "train"], default=None)
    args = ap.parse_args()

    if args.child:
        from multi_style_transfer_gan_tpu.utils import enable_compilation_cache
        enable_compilation_cache()
        res = child_inference() if args.child == "inference" else child_train()
        print("RESULT " + json.dumps(res), flush=True)
        return

    whats = ["inference", "train"] if args.what == "both" else [args.what]
    for what in whats:
        for name, flags in VARIANTS.items():
            env = dict(os.environ)
            base = env.get("XLA_FLAGS", "")
            env["XLA_FLAGS"] = (base + " " + flags).strip()
            t0 = time.time()
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--child", what],
                capture_output=True, text=True, env=env, timeout=1800)
            out = [ln for ln in r.stdout.splitlines()
                   if ln.startswith("RESULT ")]
            if out:
                print(f"{what:9s} {name:8s} {out[0][7:]}  "
                      f"(wall {time.time() - t0:.0f}s)", flush=True)
            else:
                tail = (r.stderr or r.stdout).strip().splitlines()[-3:]
                print(f"{what:9s} {name:8s} FAILED rc={r.returncode}: "
                      f"{' | '.join(tail)[:200]}", flush=True)


if __name__ == "__main__":
    main()
