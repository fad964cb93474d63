"""--engine auto overhead A/B (VERDICT r4 item 7).

``engine='auto'`` is a pure Python table lookup (pipelines/batch.py
``select_engine``) — it runs once per ``batch_process`` call, before any
compile, and dispatches to the same frozen engines a forced flag would.
Structurally its steady-state overhead is zero; this script VERIFIES that
end-to-end by running the same folder through auto vs the forced engine it
resolves to, interleaved within one chip session, at both production
canvases:

  - canvas 256, batch 64  -> auto resolves nhwc
  - canvas 512, batch 32  -> auto resolves packed

Any systematic auto-vs-forced gap would be measured here; ratios within a
run only (time-shared chip).

  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_auto_overhead.py
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


def main():
    from scripts.ab_host_io import make_folder
    from multi_style_transfer_gan_tpu.models import (
        enhanced_generator_apply, enhanced_generator_init,
    )
    from multi_style_transfer_gan_tpu.pipelines.batch import (
        batch_process, select_engine,
    )
    from multi_style_transfer_gan_tpu.pipelines.model_loader import LoadedModel
    from multi_style_transfer_gan_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    params = enhanced_generator_init(jax.random.PRNGKey(0), channels=16,
                                     num_transformer_blocks=1)
    model = LoadedModel(kind="enhanced", channels=16, direction="AB",
                        params=params,
                        apply=lambda x: enhanced_generator_apply(params, x))

    cases = [
        # (canvas, batch, n_images): the bench e2e config and the
        # small-batch 512 config where auto flips to packed
        (256, 64, 128),
        (512, 32, 32),
    ]
    results = []
    for canvas, bs, n in cases:
        resolved = select_engine(bs, canvas, "enhanced")
        with tempfile.TemporaryDirectory() as td:
            src = os.path.join(td, "in")
            os.makedirs(src)
            make_folder(src, n, 512)
            kwargs = dict(mode="cyclegan", batch_size=bs,
                          compute_dtype=jnp.bfloat16, fast_attention=True,
                          canvas=canvas)
            # warm both programs first (compiles out of the timing)
            batch_process(model, src, os.path.join(td, "w0"),
                          engine="auto", **kwargs)
            batch_process(model, src, os.path.join(td, "w1"),
                          engine=resolved, **kwargs)
            # interleaved measurement, best of 3 each
            best = {"auto": float("inf"), resolved: float("inf")}
            for r in range(3):
                for eng in ("auto", resolved):
                    t0 = time.perf_counter()
                    stats = batch_process(model, src,
                                          os.path.join(td, f"o{r}{eng}"),
                                          engine=eng, **kwargs)
                    best[eng] = min(best[eng],
                                    time.perf_counter() - t0)
                    assert stats["processed"] == n
        row = {"canvas": canvas, "batch": bs, "resolved": resolved,
               "auto_s": round(best["auto"], 2),
               "forced_s": round(best[resolved], 2),
               "auto_overhead_frac": round(
                   best["auto"] / best[resolved] - 1.0, 4)}
        results.append(row)
        print(json.dumps(row), flush=True)

    print("\n| canvas | batch | resolved | auto s | forced s | overhead |")
    print("|---|---|---|---|---|---|")
    for r in results:
        print(f"| {r['canvas']} | {r['batch']} | {r['resolved']} | "
              f"{r['auto_s']} | {r['forced_s']} | "
              f"{r['auto_overhead_frac'] * 100:+.1f}% |")


if __name__ == "__main__":
    main()
