"""Engine auto-dispatch A/B: does select_engine's choice win end-to-end?

Measures the full uint8->uint8 stylize program (make_batch_fn, the folder
pipeline's compiled core) for BOTH engines at the dispatch-relevant cells
— small batch x {512, 256} canvas — interleaved round-robin, min over
rounds (the time-shared-chip measurement rules, docs/PERFORMANCE.md).
Prints each cell's measured winner next to what select_engine dispatches,
so the table in pipelines/batch.py stays honest.

  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_engine_dispatch.py \
      [--cells 512x16,256x16,512x64] [--rounds 5] [--iters 4]
"""

import argparse
import time

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=str, default="512x16,256x16")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    from multi_style_transfer_gan_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    from multi_style_transfer_gan_tpu.models import enhanced_generator_init
    from multi_style_transfer_gan_tpu.pipelines.batch import (
        make_batch_fn, select_engine,
    )
    from multi_style_transfer_gan_tpu.pipelines.model_loader import (
        LoadedModel,
    )

    params = enhanced_generator_init(jax.random.PRNGKey(0), channels=16,
                                     num_transformer_blocks=1)
    model = LoadedModel(kind="enhanced", params=params, channels=16,
                        direction="photo2monet", apply=None)

    rng = np.random.default_rng(0)
    for cell in args.cells.split(","):
        canvas, bs = (int(v) for v in cell.split("x"))
        imgs = jax.device_put(rng.integers(
            0, 256, (bs, canvas, canvas, 3), dtype=np.uint8))
        fns = {}
        for eng in ("nhwc", "packed"):
            t0 = time.perf_counter()
            fn = make_batch_fn(model, "cyclegan", "simple", 0.8, 0.7, True,
                               True, compute_dtype=jnp.bfloat16,
                               fast_attention=True, engine=eng)
            ref = np.asarray(fn(imgs))
            print(f"# compiled {eng} {canvas}^2 x{bs} in "
                  f"{time.perf_counter() - t0:.0f}s", flush=True)
            fns[eng] = (fn, ref)
        d = np.abs(fns["nhwc"][1].astype(np.int32)
                   - fns["packed"][1].astype(np.int32))
        print(f"{cell}: packed-vs-nhwc uint8 mean {d.mean():.3f} "
              f"max {d.max()}", flush=True)

        best = {k: 1e9 for k in fns}
        for _ in range(args.rounds):
            for k, (fn, _) in fns.items():
                t0 = time.perf_counter()
                o = None
                for _ in range(args.iters):
                    o = fn(imgs)
                _ = np.asarray(o)[0, :1, :1]
                ms = (time.perf_counter() - t0) / args.iters * 1e3
                best[k] = min(best[k], ms)
        winner = min(best, key=best.get)
        chosen = select_engine(bs, canvas)
        for k, v in sorted(best.items()):
            print(f"{canvas}^2 x{bs} {k}: {v:.1f} ms  {bs / v * 1e3:.1f} "
                  f"img/s", flush=True)
        ok = "OK" if winner == chosen else "MISMATCH"
        print(f"{cell}: measured winner={winner} "
              f"select_engine={chosen}  [{ok}]", flush=True)


if __name__ == "__main__":
    main()
