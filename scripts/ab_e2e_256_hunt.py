"""Canvas-256 end-to-end regression hunt (VERDICT r4 item 2).

BENCH_r04 measured the 256-canvas folder pipeline at 59-69 img/s — below
round 3's 74-79 and at 0.52 of the overlap-aware transfer ceiling, even
below the no-overlap floor. Candidate explanations: (a) chip/tunnel-day
variance, (b) `--engine auto` resolution overhead (ab_auto_overhead.py
measures that directly), (c) the prefetch/fetch thread structure not
actually overlapping the two transfer directions from one Python host
process.

This script measures, in ONE chip session (ratios within-run only):
  1. the tunnel transfer rates + the derived floor/ceiling for 256²,
  2. the pipeline at the shipped defaults (prefetch_depth=2,
     fetch_workers=1), 3 repeats,
  3. a knob grid: prefetch_depth x fetch_workers,
  4. the device-only rate of the same program (for host_bound_frac).

  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_e2e_256_hunt.py
"""

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

CANVAS = 256
N = 256
BS = 64


def main():
    from scripts.ab_host_io import make_folder
    from bench import measure_transfer
    from multi_style_transfer_gan_tpu.models import (
        enhanced_generator_apply, enhanced_generator_init,
    )
    from multi_style_transfer_gan_tpu.pipelines.batch import batch_process
    from multi_style_transfer_gan_tpu.pipelines.model_loader import LoadedModel
    from multi_style_transfer_gan_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    transfer = measure_transfer()
    img_bytes = CANVAS * CANVAS * 3
    t_h2d = img_bytes / (transfer["h2d_mb_s"] * 1e6)
    t_d2h = img_bytes / (transfer["d2h_mb_s"] * 1e6)
    floor = 1.0 / (t_h2d + t_d2h)
    ceiling = 1.0 / max(t_h2d, t_d2h)
    print(json.dumps({"transfer": transfer,
                      "floor_img_s": round(floor, 1),
                      "ceiling_img_s": round(ceiling, 1)}), flush=True)

    params = enhanced_generator_init(jax.random.PRNGKey(0), channels=16,
                                     num_transformer_blocks=1)
    model = LoadedModel(kind="enhanced", channels=16, direction="AB",
                        params=params,
                        apply=lambda x: enhanced_generator_apply(params, x))

    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "in")
        os.makedirs(src)
        make_folder(src, N, 512)
        base = dict(mode="cyclegan", batch_size=BS,
                    compute_dtype=jnp.bfloat16, fast_attention=True,
                    canvas=CANVAS)
        # pay the compile once
        batch_process(model, src, os.path.join(td, "warm"), **base)

        def run(tag, reps=3, **kw):
            best = 0.0
            for r in range(reps):
                stats = batch_process(model, src,
                                      os.path.join(td, f"{tag}{r}"),
                                      **base, **kw)
                best = max(best, stats["imgs_per_sec"])
            row = {"config": tag, **kw, "img_s": round(best, 1),
                   "frac_of_ceiling": round(best / ceiling, 3)}
            print(json.dumps(row), flush=True)
            return row

        rows = [run("shipped_defaults")]
        # auto resolves nhwc at this shape; a forced-nhwc arm inside the
        # same session gives ab_auto_overhead.py a better-sampled control
        rows.append(run("forced_nhwc", engine="nhwc"))
        for depth in (2, 4, 6):
            for fw in (1, 2):
                if (depth, fw) == (2, 1):
                    continue
                rows.append(run(f"d{depth}_f{fw}", reps=2,
                                prefetch_depth=depth, fetch_workers=fw))
        # re-run the shipped config last: brackets tunnel drift over the
        # session so a "winner" isn't just a quiet-moment artifact
        rows.append(run("shipped_again"))

    print("\n| config | img/s | frac of ceiling |")
    print("|---|---|---|")
    for r in rows:
        print(f"| {r['config']} | {r['img_s']} | {r['frac_of_ceiling']} |")


if __name__ == "__main__":
    main()
