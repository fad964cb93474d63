"""CLI: region-adaptive local style transfer (enhanced_local_style.py
surface: --image --model --output [--method])."""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="region-adaptive style transfer")
    p.add_argument("--image", type=str, required=True)
    p.add_argument("--model", type=str, required=True)
    p.add_argument("--output", type=str, default="output/enhanced_local.png")
    p.add_argument("--method",
                   choices=["felzenszwalb", "slic", "quickshift"],
                   default="felzenszwalb")
    p.add_argument("--no_comparison", action="store_true")
    args = p.parse_args(argv)

    from ..utils import enable_compilation_cache
    enable_compilation_cache()
    from ..pipelines import load_generator
    from ..pipelines.local_style import enhanced_local_style_transfer

    model = load_generator(args.model)
    print(f"loaded {model.kind} generator (channels={model.channels})")
    enhanced_local_style_transfer(model, args.image, args.output,
                                  method=args.method,
                                  make_comparison=not args.no_comparison)
    print(f"saved: {args.output}")


if __name__ == "__main__":
    main()
