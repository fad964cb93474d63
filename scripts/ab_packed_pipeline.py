"""Pipeline-level A/B: packed engine with v3 vs grouped-Gram attention.

Same methodology as scripts/ab_dispatch_pipeline.py (kernel-level micro
A/Bs are unstable on the time-shared chip): the whole packed-engine
uint8->uint8 stylize pipeline, variants interleaved round-robin,
min-over-rounds. The packed engine keeps every stage in the s2d packed
layout; its v3 attention needs NO relayout, while grouped pays one XLA
transpose each way per attention for g x fewer MXU Gram issues.

  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_packed_pipeline.py \
      [--size 512] [--batches 16,96] [--rounds 5] [--iters 4]
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batches", type=str, default="16,96")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    from multi_style_transfer_gan_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import multi_style_transfer_gan_tpu.models.packed_generator as pg
    from multi_style_transfer_gan_tpu.models import enhanced_generator_init
    from multi_style_transfer_gan_tpu.models.packed_generator import (
        pack_enhanced_generator_params, packed_enhanced_generator_apply,
    )
    from multi_style_transfer_gan_tpu.ops import (
        from_model_range, to_model_range,
    )
    from multi_style_transfer_gan_tpu.ops.pallas.window_attention_grouped \
        import packed_grouped_window_attention

    params = pack_enhanced_generator_params(
        enhanced_generator_init(jax.random.PRNGKey(0), channels=16,
                                num_transformer_blocks=1))

    orig_attention = pg._attention

    def grouped_attention(p, x, prefix, fast=False):
        if fast:
            wqkv = p[f"{prefix}qkv.weight"]
            C = wqkv.shape[-2]
            if C <= 32 and 128 % C == 0:
                return packed_grouped_window_attention(
                    x, wqkv, p[f"{prefix}qkv.bias"],
                    p[f"{prefix}proj.weight"], p[f"{prefix}proj.bias"])
        return orig_attention(p, x, prefix, fast=fast)

    def build(variant):
        pg._attention = grouped_attention if variant == "grouped" \
            else orig_attention
        try:
            @jax.jit
            def pipeline(params, imgs_u8):
                x = to_model_range(imgs_u8).astype(jnp.bfloat16)
                y = packed_enhanced_generator_apply(params, x,
                                                    fast_attention=True)
                return (from_model_range(y.astype(jnp.float32)) * 255.0
                        ).astype(jnp.uint8)

            return pipeline
        finally:
            pass

    rng = np.random.default_rng(0)
    for bs in [int(b) for b in args.batches.split(",")]:
        imgs = jax.device_put(rng.integers(
            0, 256, (bs, args.size, args.size, 3), dtype=np.uint8))
        pipes = {}
        for variant in ("v3", "grouped"):
            pg._attention = grouped_attention if variant == "grouped" \
                else orig_attention
            try:
                p = build(variant)
                t0 = time.perf_counter()
                ref = np.asarray(p(params, imgs))
                print(f"# compiled {variant} x{bs} in "
                      f"{time.perf_counter() - t0:.0f}s", flush=True)
                pipes[variant] = (p, ref)
            finally:
                pg._attention = orig_attention

        d = np.abs(pipes["v3"][1].astype(np.int32)
                   - pipes["grouped"][1].astype(np.int32))
        print(f"x{bs}: grouped-vs-v3 uint8 mean {d.mean():.2f} "
              f"max {d.max()}", flush=True)

        best = {k: 1e9 for k in pipes}
        for r in range(args.rounds):
            for k, (p, _) in pipes.items():
                t0 = time.perf_counter()
                o = None
                for _ in range(args.iters):
                    o = p(params, imgs)
                _ = np.asarray(o)[0, :1, :1]
                ms = (time.perf_counter() - t0) / args.iters * 1e3
                best[k] = min(best[k], ms)
        base = best["v3"]
        for k, v in best.items():
            print(f"packed {args.size}^2 x{bs} {k}: {v:.1f} ms  "
                  f"{bs / v * 1e3:.1f} img/s  ({base / v:.2f}x vs v3)",
                  flush=True)


if __name__ == "__main__":
    main()
