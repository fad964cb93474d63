"""CLI: checkpoint/model debugging (debug_model.py:9-100 parity).

Prints parameter names/shapes and renders a side-by-side comparison of the
two preprocessing variants (Resize+CenterCrop vs plain square Resize).
"""

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description="model debug inspection")
    p.add_argument("--model", type=str, required=True)
    p.add_argument("--image", type=str, default=None)
    p.add_argument("--output_dir", type=str, default="output/debug")
    args = p.parse_args(argv)

    from ..utils import enable_compilation_cache
    enable_compilation_cache()

    import numpy as np
    from PIL import Image
    import jax.numpy as jnp

    from ..pipelines import load_generator
    from ..ops import (
        resize, resize_center_crop, to_model_range, from_model_range,
    )

    model = load_generator(args.model)
    print(f"model kind: {model.kind}  channels: {model.channels}  "
          f"direction: {model.direction}")
    print(f"parameters: {len(model.params)} tensors, "
          f"{sum(int(np.prod(v.shape)) for v in model.params.values()):,} "
          f"elements")
    for k in sorted(model.params):
        print(f"  {k}: {tuple(model.params[k].shape)}")

    if args.image:
        os.makedirs(args.output_dir, exist_ok=True)
        img = jnp.asarray(
            np.asarray(Image.open(args.image).convert("RGB"), np.float32)
            / 255.0)
        variants = {
            "resize_center_crop": resize_center_crop(img, 256),
            "plain_resize": resize(img, (256, 256)),
        }
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(2, 2, figsize=(10, 10))
        for col, (name, x) in enumerate(variants.items()):
            y = from_model_range(model.apply(to_model_range(x)[None]))[0]
            axes[0, col].imshow(np.asarray(x)); axes[0, col].set_title(name)
            axes[1, col].imshow(np.asarray(y))
            axes[1, col].set_title(f"output ({name})")
            for r in (0, 1):
                axes[r, col].axis("off")
        out = os.path.join(args.output_dir, "preprocess_comparison.png")
        fig.tight_layout(); fig.savefig(out, dpi=110); plt.close(fig)
        print(f"comparison saved: {out}")


if __name__ == "__main__":
    main()
