"""CLI: collect prefixed outputs into a clean comparison folder
(prepare_comparison_folders.py:6-38 surface)."""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(
        description="move prefixed outputs into a comparison subfolder")
    p.add_argument("--src_dir", type=str, required=True)
    p.add_argument("--prefix", type=str, default="cyclegan_photo2monet_")
    p.add_argument("--dest_name", type=str, default="for_comparison")
    args = p.parse_args(argv)

    from ..metrics.evaluation import prepare_comparison_folders

    moved = prepare_comparison_folders(args.src_dir, args.prefix,
                                       args.dest_name)
    print(f"prepared {len(moved)} files")
    for m in moved:
        print(f"  {m}")


if __name__ == "__main__":
    main()
