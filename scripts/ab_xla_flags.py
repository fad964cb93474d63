"""XLA compiler-option sweep: flagship inference + CycleGAN train step.

On this deployment ``XLA_FLAGS`` is parsed by the CLIENT-side CPU jaxlib,
which fatals on TPU-only flags (parse_flags_from_env checks the local
binary's registry). The working channel is per-compile
``compiled = fn.lower(args).compile(compiler_options={...})`` — the
options ride the compile request to the remote TPU compiler. This also
lets every variant live in ONE process, so timing rounds interleave
properly on the time-shared chip (the earlier subprocess design could
not).

Variants (round-3 candidates for VERDICT item 3's conv/IN backward
residual):
  base      : no options (what every number so far was measured with)
  vmem64/128: --xla_tpu_scoped_vmem_limit_kib — bigger fusions
  no_lhs    : latency-hiding scheduler off

  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_xla_flags.py \
      [--what inference|train|both]
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

VARIANTS = {
    "base": {},
    "vmem64": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem128": {"xla_tpu_scoped_vmem_limit_kib": "131072"},
    "no_lhs": {"xla_tpu_enable_latency_hiding_scheduler": "false"},
    # second-wave candidates (round 3, after vmem64 reproduced 1.02x):
    "vmem96": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    "vmem48": {"xla_tpu_scoped_vmem_limit_kib": "49152"},
    "vmem80": {"xla_tpu_scoped_vmem_limit_kib": "81920"},
}
ROUNDS, ITERS = 5, 3


def _bench(compiled_fns, args_of, drain, label, unit_of):
    times = {n: float("inf") for n in compiled_fns}
    for _ in range(ROUNDS):
        for name, fn in compiled_fns.items():  # interleaved rounds
            out = None
            for _ in range(ITERS):
                out = fn(*args_of(name, out))
            drain(out)
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = fn(*args_of(name, out))
            drain(out)
            times[name] = min(times[name],
                              (time.perf_counter() - t0) / ITERS)
    base = times.get("base", float("nan"))
    for name, t in times.items():
        print(f"{label} {name:8s} {t * 1e3:7.1f} ms  {unit_of(t)}  "
              f"({base / t:.3f}x base)", flush=True)


def sweep_inference():
    from multi_style_transfer_gan_tpu.models import (
        enhanced_generator_apply, enhanced_generator_init,
    )
    from multi_style_transfer_gan_tpu.ops import (
        to_model_range, from_model_range,
    )

    params = enhanced_generator_init(jax.random.PRNGKey(0), channels=16,
                                     num_transformer_blocks=1)

    def pipeline(params, imgs_u8):
        x = to_model_range(imgs_u8).astype(jnp.bfloat16)
        y = enhanced_generator_apply(params, x, fast_attention=True)
        return (from_model_range(y.astype(jnp.float32)) * 255.0
                ).astype(jnp.uint8)

    rng = np.random.default_rng(0)
    batch = jax.device_put(rng.integers(0, 256, (96, 512, 512, 3),
                                        dtype=np.uint8))
    lowered = jax.jit(pipeline).lower(params, batch)
    fns = {}
    for name, opts in VARIANTS.items():
        try:
            c = lowered.compile(compiler_options=opts)
            _ = np.asarray(c(params, batch)[0, :1, :1])
            fns[name] = c
        except Exception as e:
            print(f"inference {name} failed: {str(e)[:120]}", flush=True)
    _bench(fns, lambda n, o: (params, batch),
           lambda o: np.asarray(o[0, :1, :1]),
           "inference", lambda t: f"{96 / t:7.1f} img/s")


def sweep_train():
    from multi_style_transfer_gan_tpu.train.cyclegan import (
        cyclegan_init_state, cyclegan_train_step, make_optimizers,
    )

    state = cyclegan_init_state(jax.random.PRNGKey(0), channels=16,
                                num_transformer_blocks=1)
    g_tx, d_tx = make_optimizers()
    ka, kb = jax.random.split(jax.random.PRNGKey(1))
    ra = jax.random.uniform(ka, (8, 256, 256, 3), minval=-1.0, maxval=1.0)
    rb = jax.random.uniform(kb, (8, 256, 256, 3), minval=-1.0, maxval=1.0)
    step = functools.partial(cyclegan_train_step, g_tx=g_tx, d_tx=d_tx,
                             compute_dtype=jnp.bfloat16, remat=False,
                             fast_attention=True)
    # One plain step first: the initial state's spectral-norm v is None and
    # becomes an array after one power iteration — lower on the
    # structurally-stable post-step state so it can be threaded back in.
    state, _ = jax.jit(step)(state, ra, rb)
    lowered = jax.jit(step).lower(state, ra, rb)
    fns = {}
    for name, opts in VARIANTS.items():
        try:
            c = lowered.compile(compiler_options=opts)
            _, losses = c(state, ra, rb)
            _ = float(losses["g_loss"])
            fns[name] = c
        except Exception as e:
            print(f"train {name} failed: {str(e)[:120]}", flush=True)

    def args_of(name, out):
        return ((state, ra, rb) if out is None
                else (out[0], ra, rb))  # thread the state like a real loop

    _bench(fns, args_of, lambda o: float(o[1]["g_loss"]),
           "train", lambda t: f"{8 / t:7.1f} pairs/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", choices=["inference", "train", "both"],
                    default="both")
    ap.add_argument("--variants", type=str, default=None,
                    help="comma-separated subset (e.g. base,vmem64) for "
                         "focused head-to-head reruns")
    args = ap.parse_args()
    if args.variants:
        keep = set(args.variants.split(","))
        for k in list(VARIANTS):
            if k not in keep:
                del VARIANTS[k]
    from multi_style_transfer_gan_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    if args.what in ("inference", "both"):
        sweep_inference()
    if args.what in ("train", "both"):
        sweep_train()


if __name__ == "__main__":
    main()
