"""Pipeline-level A/B of the fast-attention dispatch variants.

Kernel-level micro-A/Bs proved unstable on the time-shared chip (the same
v1-vs-grouped pair measured 1.04x, 1.03x, 0.96x, 1.57x across four runs —
docs/PERFORMANCE.md). This measures what matters instead: the whole
uint8->uint8 flagship stylize pipeline (bench.py's program) under each
dispatch policy, interleaved round-robin with min-over-rounds per variant.

Variants:
  legacy      v3 for C<=16, XLA einsum for C=32 at >=256^2, v1 otherwise
  grouped32   grouped-Gram kernel at C=32 (every grid), legacy elsewhere
  grouped-all grouped-Gram kernel for all C<=32 (every grid)

  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_dispatch_pipeline.py \
      [--size 512] [--batch 128] [--rounds 5] [--iters 4]
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp


def _make_dispatch(policy):
    import multi_style_transfer_gan_tpu.models.enhanced_generator as eg
    from multi_style_transfer_gan_tpu.ops.pallas.window_attention import (
        fused_window_channel_attention,
    )
    from multi_style_transfer_gan_tpu.ops.pallas.window_attention_v3 import (
        window_attention_v3,
    )
    from multi_style_transfer_gan_tpu.ops.pallas.window_attention_grouped \
        import grouped_window_channel_attention

    def dispatch(x, wqkv, bqkv, wproj, bproj, window_size, eps):
        B, H, W, C = x.shape
        a = (x, wqkv, bqkv, wproj, bproj)
        grouped_ok = (window_size == 4 and C <= 32 and 128 % C == 0
                      and (B * (H // 4) * (W // 4)) % (128 // C) == 0)
        use_grouped = grouped_ok and (
            policy == "grouped-all" or (policy == "grouped32" and C == 32))
        if use_grouped:
            return grouped_window_channel_attention(
                *a, window_size=window_size, eps=eps)
        if C <= 16 and window_size == 4:
            return window_attention_v3(*a, window_size=window_size, eps=eps)
        if C <= 32 and H * W >= 256 * 256:
            return eg._attention_math(*a, window_size=window_size, eps=eps)
        return fused_window_channel_attention(
            *a, window_size=window_size, eps=eps)

    return dispatch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    from multi_style_transfer_gan_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import multi_style_transfer_gan_tpu.models.enhanced_generator as eg
    from multi_style_transfer_gan_tpu.models import (
        enhanced_generator_apply, enhanced_generator_init,
    )
    from multi_style_transfer_gan_tpu.ops import (
        from_model_range, to_model_range,
    )

    params = enhanced_generator_init(jax.random.PRNGKey(0), channels=16,
                                     num_transformer_blocks=1)
    rng = np.random.default_rng(0)
    imgs = jax.device_put(rng.integers(
        0, 256, (args.batch, args.size, args.size, 3), dtype=np.uint8))

    def build(policy):
        @jax.jit
        def pipeline(params, imgs_u8):
            x = to_model_range(imgs_u8).astype(jnp.bfloat16)
            y = enhanced_generator_apply(params, x, fast_attention=True)
            return (from_model_range(y.astype(jnp.float32)) * 255.0
                    ).astype(jnp.uint8)
        return pipeline

    orig = eg._attention_fast
    pipes = {}
    for policy in ("legacy", "grouped32", "grouped-all"):
        eg._attention_fast = _make_dispatch(policy)
        try:
            p = build(policy)
            t0 = time.perf_counter()
            _ = np.asarray(p(params, imgs)[0, :1, :1])  # trace+compile here
            print(f"# compiled {policy} in {time.perf_counter() - t0:.0f}s",
                  flush=True)
            pipes[policy] = p
        finally:
            eg._attention_fast = orig

    best = {k: 1e9 for k in pipes}
    for r in range(args.rounds):
        for k, p in pipes.items():
            t0 = time.perf_counter()
            o = None
            for _ in range(args.iters):
                o = p(params, imgs)
            _ = np.asarray(o)[0, :1, :1]
            ms = (time.perf_counter() - t0) / args.iters * 1e3
            best[k] = min(best[k], ms)
            print(f"round {r} {k}: {ms:.1f} ms", flush=True)

    base = best["legacy"]
    for k, v in best.items():
        print(f"{args.size}^2 x{args.batch} {k}: {v:.1f} ms  "
              f"{args.batch / v * 1e3:.1f} img/s  ({base / v:.2f}x vs legacy)",
              flush=True)


if __name__ == "__main__":
    main()
