"""Per-stage roofline of the NHWC fast pipeline (VERDICT round-1 item 3).

For each cumulative prefix of the generator, records XLA's compiled cost
analysis (flops, bytes accessed) AND the measured time; per-stage deltas
give achieved FLOP/s and HBM bytes/s against the v5e peaks — the table
that answers "is there headroom left?" per stage instead of per program.

Method: same interleaved min-over-rounds timing as profile_engines.py
(time-shared chip); cost deltas between prefixes are exact for stage
work (XLA can only fuse across the prefix boundary in the last stage,
which the delta then attributes to that stage).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_roofline.py [batch] [size]
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from multi_style_transfer_gan_tpu.models import enhanced_generator_init
from multi_style_transfer_gan_tpu.ops import to_model_range
from multi_style_transfer_gan_tpu.utils import enable_compilation_cache

from profile_engines import STAGES, nhwc_prefix

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 96
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 512
ROUNDS, ITERS = 4, 4
PEAK_FLOPS = 197e12   # v5e bf16
PEAK_HBM = 819e9


def main():
    enable_compilation_cache()
    params = enhanced_generator_init(jax.random.PRNGKey(0), channels=16,
                                     num_transformer_blocks=1)
    rng = np.random.default_rng(0)
    data = [jnp.asarray(rng.integers(0, 256, (BATCH, SIZE, SIZE, 3),
                                     dtype=np.uint8)) for _ in range(2)]

    fns, cost, times = {}, {}, [float("nan")] * len(STAGES)
    for upto in range(len(STAGES)):
        fn = jax.jit(lambda p, u8, s=upto: nhwc_prefix(
            p, to_model_range(u8).astype(jnp.bfloat16), s))
        try:
            lowered = fn.lower(params, data[0])
            compiled = lowered.compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            cost[upto] = (float(ca.get("flops", 0.0)),
                          float(ca.get("bytes accessed", 0.0)))
            out = fn(params, data[0])
            np.asarray(jax.device_get(out.ravel()[0]))
            fns[upto] = fn
        except Exception as e:
            print(f"prefix {upto} failed: {type(e).__name__} {str(e)[:90]}")

    for upto, fn in fns.items():
        best = float("inf")
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            for i in range(ITERS):
                out = fn(params, data[i % len(data)])
            np.asarray(jax.device_get(out.ravel()[0]))
            best = min(best, (time.perf_counter() - t0) / ITERS)
        times[upto] = best

    print(f"\n{BATCH}x{SIZE}^2 bf16 fast pipeline — per-stage roofline "
          f"(v5e peaks {PEAK_FLOPS/1e12:.0f} TF/s, {PEAK_HBM/1e9:.0f} GB/s)")
    print(f"{'stage':18s} {'ms':>7s} {'GFLOP':>8s} {'GB':>7s} "
          f"{'TF/s':>6s} {'GB/s':>6s} {'%MXU':>6s} {'%HBM':>6s}  bound")
    prev_t, prev_f, prev_b = 0.0, 0.0, 0.0
    for i, name in enumerate(STAGES):
        if i not in fns:
            print(f"{name:18s}  (failed)")
            continue
        dt = times[i] - prev_t
        df = cost[i][0] - prev_f
        db = cost[i][1] - prev_b
        prev_t, prev_f, prev_b = times[i], cost[i][0], cost[i][1]
        tf = df / dt / 1e12 if dt > 0 else float("nan")
        gbs = db / dt / 1e9 if dt > 0 else float("nan")
        mxu = tf * 1e12 / PEAK_FLOPS * 100
        hbm = gbs * 1e9 / PEAK_HBM * 100
        bound = "HBM" if hbm > mxu else "MXU"
        if max(hbm, mxu) < 15:
            bound = "neither (overhead/latency)"
        print(f"{name:18s} {dt*1e3:7.1f} {df/1e9:8.1f} {db/1e9:7.2f} "
              f"{tf:6.2f} {gbs:6.0f} {mxu:6.1f} {hbm:6.1f}  {bound}")
    last = max(fns)
    print(f"total {times[last]*1e3:.1f} ms = {BATCH/times[last]:.1f} img/s; "
          f"program {cost[last][0]/1e9:.1f} GFLOP, "
          f"{cost[last][1]/1e9:.2f} GB accessed")


if __name__ == "__main__":
    main()
