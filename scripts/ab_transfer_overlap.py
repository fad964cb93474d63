"""Measure whether tunnel H2D and D2H transfers can overlap (VERDICT r2 #6).

Round 2 measured ~20-42 MB/s H2D and ~18-20 MB/s D2H on ONE connection with
no overlap between them, capping the folder pipeline at ~50-65 img/s. This
script measures, same-run:
  1. serial H2D throughput (device_put of distinct uint8 batches + sync),
  2. serial D2H throughput (np.asarray of distinct device outputs),
  3. the two CONCURRENTLY from two threads — if the aggregate beats the
     serial sum, the runtime multiplexes and the batch pipeline should move
     H2D off the main thread (prefetch depth >= 1).

Run on the REAL CHIP:  PYTHONPATH=/root/repo:$PYTHONPATH \
    python scripts/ab_transfer_overlap.py [--mb 12] [--rounds 3]
"""

import argparse
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=12.0,
                    help="payload per transfer (MB); 12 ~ one 64x256^2 batch")
    ap.add_argument("--n", type=int, default=4, help="transfers per direction")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    nbytes = int(args.mb * 1e6)
    shape = (nbytes // (256 * 256 * 3), 256, 256, 3)
    rng = np.random.default_rng(0)
    host_batches = [rng.integers(0, 256, shape, dtype=np.uint8)
                    for _ in range(args.n)]
    # pre-staged device buffers for the D2H side (distinct, defeats caching)
    dev_batches = [jax.device_put(b) for b in host_batches]
    for d in dev_batches:
        _ = np.asarray(d[0, :1, :1])  # ensure staged
    print("staged", flush=True)

    def h2d_loop():
        t0 = time.perf_counter()
        outs = [jax.device_put(b) for b in host_batches]
        for o in outs:
            _ = np.asarray(o[0, :1, :1])  # sync each transfer
        dt = time.perf_counter() - t0
        for o in outs:
            o.delete()
        return dt

    def d2h_loop():
        t0 = time.perf_counter()
        for d in dev_batches:
            _ = np.asarray(d)
        return time.perf_counter() - t0

    mb_total = args.mb * args.n
    pool = ThreadPoolExecutor(max_workers=2)
    for r in range(args.rounds):
        t_h2d = h2d_loop()
        print(f"round {r}: h2d done {t_h2d:.2f}s", flush=True)
        t_d2h = d2h_loop()
        print(f"round {r}: d2h done {t_d2h:.2f}s", flush=True)
        t0 = time.perf_counter()
        f1 = pool.submit(h2d_loop)
        f2 = pool.submit(d2h_loop)
        f1.result(), f2.result()
        t_both = time.perf_counter() - t0
        serial_sum = t_h2d + t_d2h
        print(f"round {r}: H2D {mb_total / t_h2d:.1f} MB/s  "
              f"D2H {mb_total / t_d2h:.1f} MB/s  "
              f"concurrent {2 * mb_total / t_both:.1f} MB/s agg "
              f"(serial-sum {serial_sum:.2f}s vs concurrent {t_both:.2f}s "
              f"-> overlap {'YES' if t_both < 0.75 * serial_sum else 'no'})",
              flush=True)


if __name__ == "__main__":
    main()
