"""CLI: two-folder comparison with Excel + chart
(image_quality_comparison.py:36-188 surface)."""

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description="two-folder quality comparison")
    p.add_argument("--dir_a", type=str, required=True)
    p.add_argument("--dir_b", type=str, required=True)
    p.add_argument("--output_dir", type=str, default=".")
    args = p.parse_args(argv)

    from ..metrics.evaluation import compare_folder_pair
    from ..metrics.report import write_xlsx, comparison_bar_chart

    res = compare_folder_pair(args.dir_a, args.dir_b)
    detailed = [["image", "mse", "psnr", "ssim"]]
    for name, m in res["per_image"].items():
        detailed.append([name, m["mse"], m["psnr"], m["ssim"]])
    summary = [["metric", "average"]]
    for k, v in res["average"].items():
        summary.append([k, v])
        print(f"{k}: {v:.6f}")
    os.makedirs(args.output_dir, exist_ok=True)
    xlsx = os.path.join(args.output_dir, "image_comparison_results.xlsx")
    write_xlsx(xlsx, {"Detailed": detailed, "Summary": summary})
    if res["average"]:
        comparison_bar_chart(
            os.path.join(args.output_dir, "image_comparison_results_charts.png"),
            list(res["average"].keys()),
            {"average": list(res["average"].values())},
            "folder comparison", "value")
    print(f"report: {xlsx}")


if __name__ == "__main__":
    main()
