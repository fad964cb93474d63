"""Probe the attention-kernel dispatch table on THIS machine's device.

Times every valid kernel candidate (grouped / v3 / v1 / XLA einsum) at each
deployed attention shape and persists the winners to the dispatch cache
(~/.cache/mstgan/attention_dispatch.json, override MSTGAN_DISPATCH_CACHE).
After this, models._attention_fast dispatches on measurements instead of
the static fallback table — VERDICT round-1 item 9.

Shapes covered: every LocalAttention call site of the deployed configs
(EnhancedGenerator c16 at 512^2 bench / 256^2 canvas, both downsample and
upsample stages) plus any extra B,H,W,C given on the command line.

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo python scripts/tune_dispatch.py
    ... tune_dispatch.py --shape 96,128,128,32 --dtype float32
"""

import argparse

import jax.numpy as jnp


# (B, H, W, C): the c16 generator's four attention grids at the two
# production canvases, at the bench/pipeline batch sizes.
DEPLOYED = [
    (128, 256, 256, 32),   # 512^2 input, down1
    (128, 128, 128, 64),   # 512^2 input, down2 / up1-entry
    (128, 256, 256, 32),   # 512^2 input, up1
    (128, 512, 512, 16),   # 512^2 input, up2
    (64, 128, 128, 32),    # 256^2 canvas, down1
    (64, 64, 64, 64),      # 256^2 canvas, down2
    (64, 256, 256, 16),    # 256^2 canvas, up2
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", action="append", default=[],
                    help="extra B,H,W,C (repeatable)")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()

    from multi_style_transfer_gan_tpu.ops.pallas.attention_dispatch import (
        _cache_path, probe,
    )
    from multi_style_transfer_gan_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    dtype = jnp.dtype(args.dtype)
    shapes = list(dict.fromkeys(
        DEPLOYED + [tuple(int(v) for v in s.split(",")) for s in args.shape]))

    for B, H, W, C in shapes:
        print(f"== ({B}, {H}, {W}, {C}) {dtype.name} ==", flush=True)
        try:
            winner = probe(B, H, W, C, 4, dtype, rounds=args.rounds,
                           verbose=True)
            print(f"   -> {winner}", flush=True)
        except Exception as e:
            print(f"   probe failed: {str(e)[:140]}", flush=True)
    print(f"cache: {_cache_path()}")


if __name__ == "__main__":
    main()
