"""CLI: print checkpoint tensor shapes (pth_info.py parity)."""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="inspect a .pth checkpoint")
    p.add_argument("path", type=str)
    args = p.parse_args(argv)

    from ..weights import pth_info

    pth_info(args.path)


if __name__ == "__main__":
    main()
