"""A/B the serving micro-batcher on the real chip.

Compares the shipped two-stage dispatch/resolve pipeline against a serial
reference loop, closed-loop (N clients waiting on their own responses) and
open-loop-ish (more clients than two batches' worth), printing img/s and
batch occupancy. Measured results are recorded in docs/PERFORMANCE.md
("Serving"); same-script A/B per the repo's measurement rules (the chip is
time-shared — only within-run ratios are meaningful).

Usage: PYTHONPATH=. python scripts/ab_serving.py [--model CKPT]
(no --model: a random-init c16 enhanced generator)
"""

import argparse
import sys
import threading
import time

import numpy as np


def serial_batcher_cls():
    from multi_style_transfer_gan_tpu.serving.server import MicroBatcher

    class SerialBatcher(MicroBatcher):
        def _dispatch_loop(self):
            while not self._stop.is_set():
                slots = self._gather()
                slots = [s for s in slots if not s.abandoned]
                if not slots:
                    continue
                batch = np.zeros(
                    (self.max_batch, self.canvas, self.canvas, 3), np.uint8)
                for i, s in enumerate(slots):
                    batch[i] = s.canvas
                self._resolve(slots, self.run_fn(batch))

    return SerialBatcher


def bench(svc, batcher_cls, conc: int, n: int, rng):
    svc.batcher.close()
    svc.batcher = batcher_cls(svc.batcher.run_fn, svc.canvas, 32, 2.0)
    svc.warmup()
    canvases = [rng.integers(0, 255, (svc.canvas, svc.canvas, 3),
                             dtype=np.uint8) for _ in range(conc)]

    def worker(k):
        for _ in range(n // conc):
            svc.batcher.submit(canvases[k], timeout=300)

    t0 = time.time()
    ts = [threading.Thread(target=worker, args=(k,)) for k in range(conc)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    dt = time.time() - t0
    b = svc.batcher
    return n / dt, b.images / max(b.batches, 1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", type=str, default=None)
    p.add_argument("--rounds", type=int, default=3)
    args = p.parse_args()

    from multi_style_transfer_gan_tpu.serving import StyleTransferService
    from multi_style_transfer_gan_tpu.serving.server import MicroBatcher
    from multi_style_transfer_gan_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    if args.model:
        from multi_style_transfer_gan_tpu.pipelines import load_generator

        model = load_generator(args.model)
    else:
        from multi_style_transfer_gan_tpu.models import (
            enhanced_generator_apply, enhanced_generator_init,
        )
        from multi_style_transfer_gan_tpu.pipelines.model_loader import (
            LoadedModel,
        )

        params = enhanced_generator_init(jax.random.PRNGKey(0), 16, 1)
        model = LoadedModel(kind="enhanced", channels=16, direction=None,
                            params=params,
                            apply=lambda x: enhanced_generator_apply(
                                params, x),
                            precision="default")

    rng = np.random.default_rng(0)
    svc = StyleTransferService(model, canvas=256, max_batch=32,
                               max_wait_ms=2.0, mode="cyclegan",
                               compute_dtype=jnp.bfloat16,
                               fast_attention=True)
    svc.warmup()
    serial = serial_batcher_cls()
    for rnd in range(args.rounds):
        for conc, tag in ((32, "closed"), (128, "open  ")):
            rp, op = bench(svc, MicroBatcher, conc, 512, rng)
            rs, os_ = bench(svc, serial, conc, 512, rng)
            print(f"round {rnd} {tag} conc={conc}: pipelined {rp:6.1f} img/s"
                  f" (occ {op:4.1f}) | serial {rs:6.1f} (occ {os_:4.1f})",
                  flush=True)
    svc.close()


if __name__ == "__main__":
    sys.exit(main())
