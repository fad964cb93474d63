"""Generate the synthetic unpaired photo/monet dataset.

Usage:
    python scripts/make_synthetic_domains.py --root /tmp/synth_monet2photo \
        [--n_train 400] [--n_test 54] [--size 256] [--seed 0]

See multi_style_transfer_gan_tpu/data/synthetic.py for the domain design
(disjoint seed ranges = truly unpaired; test split ships ground truth).
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from multi_style_transfer_gan_tpu.data.synthetic import write_domains


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--n_train", type=int, default=400)
    p.add_argument("--n_test", type=int, default=54)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    t0 = time.time()
    manifest = write_domains(args.root, n_train=args.n_train,
                             n_test=args.n_test, size=args.size,
                             seed=args.seed)
    print(json.dumps({"root": args.root, "seconds": round(time.time() - t0, 1),
                      **manifest}))


if __name__ == "__main__":
    main()
