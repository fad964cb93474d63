"""CLI: 3-folder comparison study (complete_comparison.py surface, with
proper flags instead of the reference's hardcoded Windows paths)."""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="3-folder quality study")
    p.add_argument("--original_dir", type=str, required=True)
    p.add_argument("--folder_a", type=str, required=True)
    p.add_argument("--folder_b", type=str, required=True)
    p.add_argument("--name_a", type=str, default="cyclegan")
    p.add_argument("--name_b", type=str, default="localstyle")
    p.add_argument("--output_dir", type=str, default=".")
    args = p.parse_args(argv)

    from ..metrics.evaluation import complete_comparison

    out = complete_comparison(args.original_dir, args.folder_a, args.folder_b,
                              args.name_a, args.name_b, args.output_dir)
    print(f"images compared: {out['n_images']}")
    for name in (args.name_a, args.name_b):
        avg = out[name]
        if avg:
            print(f"{name}: MSE={avg['mse']:.6f} PSNR={avg['psnr']:.2f}dB "
                  f"SSIM={avg['ssim']:.4f}")
    print("win counts:", out["wins"])
    print("verdict:", out["verdict"])
    print(f"report: {out['xlsx']}")


if __name__ == "__main__":
    main()
