"""CLI: minimal API example (generate_new_image.py:9-113 parity).

Runs a full-size transform: crops dimensions to a multiple of 4 (the
reference's constraint for its EnhancedGenerator(64, 3) example,
generate_new_image.py:30-37 — ours needs /16 for the stride-2 ladder, so we
crop to /16 and note it), converts, saves, and plots before/after.
"""

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description="full-size single transform")
    p.add_argument("--image", type=str, required=True)
    p.add_argument("--model", type=str, required=True)
    p.add_argument("--output", type=str, default="output/new_image.png")
    args = p.parse_args(argv)

    from ..utils import enable_compilation_cache
    enable_compilation_cache()

    import numpy as np
    from PIL import Image
    import jax.numpy as jnp

    from ..pipelines import load_generator
    from ..ops import to_model_range, from_model_range

    model = load_generator(args.model)
    img = np.asarray(Image.open(args.image).convert("RGB"), np.uint8)
    h, w = img.shape[:2]
    h16, w16 = (h // 16) * 16, (w // 16) * 16
    img = img[:h16, :w16]
    print(f"processing at {w16}x{h16} (cropped to /16 multiple)")

    x = to_model_range(jnp.asarray(img))[None]
    y = from_model_range(model.apply(x))[0]
    out = np.asarray(jnp.clip(jnp.round(y * 255), 0, 255)).astype(np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(args.output)) or ".",
                exist_ok=True)
    Image.fromarray(out).save(args.output)
    print(f"saved: {args.output}")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(12, 6))
    axes[0].imshow(img); axes[0].set_title("input"); axes[0].axis("off")
    axes[1].imshow(out); axes[1].set_title("output"); axes[1].axis("off")
    fig.tight_layout()
    side = os.path.splitext(args.output)[0] + "_comparison.png"
    fig.savefig(side, dpi=110)
    plt.close(fig)
    print(f"comparison: {side}")


if __name__ == "__main__":
    main()
