"""CLI: checkpoint conversion (convert_model.py:39-45 flags)."""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(
        description="normalize a checkpoint into a flat state dict")
    p.add_argument("--input", type=str, required=True)
    p.add_argument("--output", type=str, required=True)
    args = p.parse_args(argv)

    from ..weights import convert_model

    ok = convert_model(args.input, args.output)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
