"""CLI: 5-variant advanced transform (advanced_transform.py:313-328 flags)."""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="advanced multi-variant transform")
    p.add_argument("--image", type=str, required=True)
    p.add_argument("--model", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="output/advanced")
    p.add_argument("--variants", type=str, nargs="*",
                   default=["standard", "contrast", "multiscale", "detail",
                            "local"])
    args = p.parse_args(argv)

    from ..utils import enable_compilation_cache
    enable_compilation_cache()
    from ..pipelines import load_generator
    from ..pipelines.advanced import generate_with_different_settings

    model = load_generator(args.model)
    print(f"loaded {model.kind} generator (channels={model.channels})")
    results = generate_with_different_settings(model, args.image,
                                               args.output_dir,
                                               variants=args.variants)
    for name, path in results.items():
        print(f"{name}: {path}")


if __name__ == "__main__":
    main()
