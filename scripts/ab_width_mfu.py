"""Width-vs-MFU experiment (VERDICT r4 item 6): is the 2.89% MFU headline
an architecture floor or an implementation gap?

The claim under test: the deployed config's lane-sparse channel widths
(C=16 trunk, enhanced_train.py:18-19) bound MXU utilization — a v5e lane
is 128 wide, so C=16 convs leave 7/8 of every lane register empty and no
amount of scheduling recovers it. If that is the cause, the SAME
uint8->uint8 pipeline at C=32/C=64 must show MFU scaling roughly with
width (the FLOPs grow ~C^2 while the wall time grows slower until lanes
fill). If MFU stays flat in C, the bound is elsewhere (dispatch, HBM,
relayouts) and there is an implementation lever left.

One chip run, interleaved A/B (the tunnel chip is time-shared — ratios
within one run only):

  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_width_mfu.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

SIZE = 512
BATCH = 64   # C=16/32; C=64's attention at x64 allocates a 34 GB f32
BATCH64 = 16  # windows tensor (>17 GB HBM) -> measured at x16 instead;
             # MFU is a utilization ratio so the columns stay comparable
ITERS = 4
ROUNDS = 4
PEAK_FLOPS = 197e12
PEAK_HBM = 819e9


def build(channels, fast_attention=True):
    from multi_style_transfer_gan_tpu.models import (
        enhanced_generator_apply, enhanced_generator_init,
    )
    from multi_style_transfer_gan_tpu.ops import (
        from_model_range, to_model_range,
    )

    params = enhanced_generator_init(jax.random.PRNGKey(0), channels=channels,
                                     num_transformer_blocks=1)

    @jax.jit
    def pipeline(params, imgs_u8):
        x = to_model_range(imgs_u8).astype(jnp.bfloat16)
        y = enhanced_generator_apply(params, x,
                                     fast_attention=fast_attention)
        return (from_model_range(y.astype(jnp.float32)) * 255.0
                ).astype(jnp.uint8)

    return params, pipeline


def measure(channels, batches):
    bs = batches[0].shape[0]
    for fast in (True, False):
        try:
            params, pipeline = build(channels, fast)
            compiled = pipeline.lower(params, batches[0]).compile()
            _ = np.asarray(compiled(params, batches[0])[0, :1, :1])
            break
        except Exception as e:
            print(f"# C={channels} fast={fast}: {str(e)[:100]}", flush=True)
            if not fast:
                raise
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))

    best = float("inf")
    for _ in range(ROUNDS):
        outs = [compiled(params, b) for b in batches]
        _ = np.asarray(outs[-1][:, -1, -1, :])  # drain warmup
        t0 = time.perf_counter()
        outs = [compiled(params, b) for b in batches]
        _ = np.asarray(outs[-1][:, -1, -1, :])
        best = min(best, time.perf_counter() - t0)
    t_batch = best / ITERS
    return {
        "channels": channels,
        "batch": bs,
        "fast_attention": fast,
        "img_s": round(bs / t_batch, 1),
        "ms_per_batch": round(t_batch * 1e3, 1),
        "gflops_per_batch": round(flops / 1e9, 1),
        "mfu": round(flops / t_batch / PEAK_FLOPS, 4),
        "hbm_util": round(bytes_acc / t_batch / PEAK_HBM, 4),
    }


def main():
    from multi_style_transfer_gan_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    batches = {bs: [jax.device_put(rng.integers(0, 256,
                                                (bs, SIZE, SIZE, 3),
                                                dtype=np.uint8))
                    for _ in range(ITERS)]
               for bs in {BATCH, BATCH64}}
    rows = []
    # interleave widths across repeats so chip-contention drift hits every
    # width equally; keep the per-width best
    best = {}
    for _ in range(2):
        for c in (16, 32, 64):
            r = measure(c, batches[BATCH64 if c == 64 else BATCH])
            if c not in best or r["mfu"] > best[c]["mfu"]:
                best[c] = r
            print(json.dumps(r), flush=True)
    rows = [best[c] for c in (16, 32, 64)]
    print("\n| C | img/s | ms/batch | GFLOP/batch | MFU | HBM util |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['channels']} | {r['img_s']} | {r['ms_per_batch']} | "
              f"{r['gflops_per_batch']} | {r['mfu']:.4f} | "
              f"{r['hbm_util']:.4f} |")
    m16, m64 = rows[0]["mfu"], rows[-1]["mfu"]
    print(f"\nMFU C=64 / C=16 = {m64 / max(m16, 1e-9):.2f}x "
          f"(width-bound if >> 1, implementation-bound if ~1)")


if __name__ == "__main__":
    main()
