"""CLI: color-block artifact repair (improved_smooth.py:137-173 flags)."""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="fix color-block artifacts")
    p.add_argument("--input", type=str, required=True,
                   help="stylized image with artifacts")
    p.add_argument("--original", type=str, required=True,
                   help="original source image")
    p.add_argument("--output", type=str, required=True)
    args = p.parse_args(argv)

    import numpy as np
    from PIL import Image
    import jax.numpy as jnp

    from ..ops.smooth import fix_color_blocks

    img = np.asarray(Image.open(args.input).convert("RGB"), np.float32)
    orig = Image.open(args.original).convert("RGB")
    if orig.size != (img.shape[1], img.shape[0]):
        orig = orig.resize((img.shape[1], img.shape[0]), Image.LANCZOS)
    orig = np.asarray(orig, np.float32)

    out = fix_color_blocks(jnp.asarray(img), jnp.asarray(orig))
    out_u8 = np.asarray(jnp.clip(jnp.round(out), 0, 255)).astype(np.uint8)
    import os
    os.makedirs(os.path.dirname(os.path.abspath(args.output)) or ".",
                exist_ok=True)
    Image.fromarray(out_u8).save(args.output)
    print(f"saved: {args.output}")


if __name__ == "__main__":
    main()
