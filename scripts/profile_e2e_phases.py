"""Phase profile of the end-to-end folder pipeline on THIS deployment.

Measures, per 64x256^2 batch, each serial phase of the bytes->bytes path:
decode (native), H2D put, dispatch+compute, D2H fetch, save — then runs the
real pipelined batch_process for comparison. The gap between sum-of-phases
and the pipelined rate says what is (not) overlapping; the phase table says
what the critical path would be under perfect overlap.

Run on a quiet chip: PYTHONPATH=. python scripts/profile_e2e_phases.py
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from scripts.ab_host_io import make_folder
from multi_style_transfer_gan_tpu.utils import enable_compilation_cache
from multi_style_transfer_gan_tpu.models import (
    enhanced_generator_init, enhanced_generator_apply,
)
from multi_style_transfer_gan_tpu.pipelines.model_loader import LoadedModel
from multi_style_transfer_gan_tpu.pipelines.batch import (
    batch_process, make_batch_fn,
)
from multi_style_transfer_gan_tpu.native import (
    decode_canvas_batch, save_canvas_batch, available,
)

N = 256
BS = 64
CANVAS = 256
SRC = 512


def main():
    enable_compilation_cache()
    assert available(), "native host I/O unavailable"
    params = enhanced_generator_init(jax.random.PRNGKey(0), channels=16,
                                     num_transformer_blocks=1)
    model = LoadedModel(kind="enhanced", channels=16, direction="AB",
                        params=params,
                        apply=lambda x: enhanced_generator_apply(params, x))
    run_fn = make_batch_fn(model, "cyclegan", "enhanced", 0.8, 0.7, True,
                           True, compute_dtype=jnp.bfloat16,
                           fast_attention=True)

    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "in")
        os.makedirs(src)
        make_folder(src, N, SRC)
        files = sorted(os.path.join(src, f) for f in os.listdir(src))
        out_dir = os.path.join(td, "serial_out")
        os.makedirs(out_dir)

        # warm the jit
        probe = np.zeros((BS, CANVAS, CANVAS, 3), np.uint8)
        _ = np.asarray(run_fn(jax.device_put(probe))[0, :1, :1])

        nb = N // BS
        t = dict(decode=0.0, h2d=0.0, compute=0.0, d2h=0.0, save=0.0)
        for i in range(nb):
            chunk = files[i * BS:(i + 1) * BS]
            t0 = time.perf_counter()
            arr, sizes, ok = decode_canvas_batch(chunk, CANVAS, 255,
                                                 num_threads=8)
            t1 = time.perf_counter()
            dev = jax.device_put(arr)
            # device_put is async too: force the transfer to complete by
            # fetching one element of the DEVICE buffer
            _ = np.asarray(dev[0, :1, :1])
            t2 = time.perf_counter()
            out = run_fn(dev)
            _ = np.asarray(out[0, :1, :1])  # sync compute (tiny fetch)
            t3 = time.perf_counter()
            host = np.asarray(out)
            t4 = time.perf_counter()
            paths = [os.path.join(out_dir, os.path.basename(f))
                     for f in chunk]
            save_canvas_batch(host, sizes, paths, num_threads=8)
            t5 = time.perf_counter()
            t["decode"] += t1 - t0
            t["h2d"] += t2 - t1
            t["compute"] += t3 - t2
            t["d2h"] += t4 - t3
            t["save"] += t5 - t4

        total = sum(t.values())
        print(f"serial phase profile over {nb} batches of {BS} "
              f"({N} imgs, {SRC}px src, canvas {CANVAS}):")
        for k, v in t.items():
            print(f"  {k:8s} {v:6.2f}s  {v / nb * 1000:7.1f} ms/batch  "
                  f"{N / v:7.1f} img/s if alone")
        print(f"  total    {total:6.2f}s  -> serial rate "
              f"{N / total:.1f} img/s")

        # the real pipelined path, same folder (warm + measured run)
        kwargs = dict(mode="cyclegan", batch_size=BS,
                      compute_dtype=jnp.bfloat16, fast_attention=True,
                      canvas=CANVAS)
        batch_process(model, src, os.path.join(td, "warm"), **kwargs)
        stats = batch_process(model, src, os.path.join(td, "piped"), **kwargs)
        print(f"pipelined batch_process: {stats['imgs_per_sec']:.1f} img/s "
              f"({stats['elapsed'] / nb * 1000:.0f} ms/batch)")
        print(f"perfect-overlap bound (max phase): "
              f"{N / max(t.values()):.1f} img/s; "
              f"transfers-serialized bound (h2d+d2h): "
              f"{N / (t['h2d'] + t['d2h']):.1f} img/s")


if __name__ == "__main__":
    main()
