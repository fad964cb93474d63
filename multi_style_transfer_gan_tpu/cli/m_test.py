"""CLI: FID evaluation over the test split (m_test.py surface)."""

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description="FID evaluation")
    p.add_argument("--data_root", type=str, required=True)
    p.add_argument("--g_ab", type=str, default="models/G_AB_epoch_200.pth")
    p.add_argument("--g_ba", type=str, default="models/G_BA_epoch_200.pth")
    p.add_argument("--output_dir", type=str, default="output/m_test")
    p.add_argument("--max_images", type=int, default=100)
    p.add_argument(
        "--inception_weights", type=str, default=None,
        help="torchvision inception_v3 state_dict .pth; when given, FID uses "
             "real InceptionV3 pool features (m_test.py:16-34 parity) "
             "instead of the fallback pooled image statistics")
    args = p.parse_args(argv)

    from ..utils import enable_compilation_cache
    enable_compilation_cache()
    from ..pipelines import load_generator
    from ..metrics.fid_harness import run_fid_eval

    feature_fn = None
    if args.inception_weights:
        from ..metrics.inception import make_inception_feature_fn
        feature_fn = make_inception_feature_fn(args.inception_weights)

    g_ab = load_generator(args.g_ab)
    g_ba = load_generator(args.g_ba)
    results = run_fid_eval(g_ab, g_ba, args.data_root, args.output_dir,
                           max_images=args.max_images, feature_fn=feature_fn)
    print(results)


if __name__ == "__main__":
    main()
